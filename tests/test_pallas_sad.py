"""Pallas SAD-grid kernel: bit-exact parity with the XLA ME path."""
import numpy as np
import jax.numpy as jnp

from x265_mod_by_patman_tpu.ops.me import (
    full_search_batch, full_search_batch_pallas)
from x265_mod_by_patman_tpu.ops.pallas.sad import sad_grid


def test_sad_grid_matches_numpy():
    rng = np.random.default_rng(0)
    n, r, B = 8, 4, 5
    win = rng.integers(0, 256, (B, n + 2 * r, n + 2 * r)).astype(np.int32)
    org = rng.integers(0, 256, (B, n, n)).astype(np.int32)
    got = np.asarray(sad_grid(jnp.asarray(win), jnp.asarray(org), n, r,
                              interpret=True))
    c = 2 * r + 1
    for b in range(B):
        for dy in range(c):
            for dx in range(c):
                ref = np.abs(win[b, dy:dy + n, dx:dx + n]
                             - org[b]).sum()
                assert got[b, dy * c + dx] == ref, (b, dy, dx)


def test_full_search_pallas_parity():
    rng = np.random.default_rng(1)
    h, w, n, r = 64, 96, 16, 8
    ref = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.int32))
    org = jnp.asarray(np.roll(np.asarray(ref), (2, -3), (0, 1)))
    x0 = jnp.asarray(np.arange(0, w - n, n, dtype=np.int32))
    y0 = jnp.asarray(np.full(x0.shape, 16, np.int32))
    z = jnp.zeros_like(x0)
    a = full_search_batch(ref, org, x0, y0, z, z, 400, n, r)
    b = full_search_batch_pallas(ref, org, x0, y0, z, z, 400, n, r,
                                 interpret=True)
    for u, v in zip(a, b):
        assert np.array_equal(np.asarray(u), np.asarray(v))
