"""Interpolation (MC) kernels: golden vs batched parity."""
import numpy as np
import pytest
import jax.numpy as jnp

from x265_mod_by_patman_tpu.ops.interp import mc_block_ref, mc_batch


@pytest.mark.parametrize("c_idx,n", [(0, 16), (0, 8), (1, 8)])
def test_mc_parity_all_fracs(c_idx, n):
    rng = np.random.default_rng(n + c_idx)
    ref = rng.integers(0, 256, (64, 80)).astype(np.int32)
    fb = 2 if c_idx == 0 else 3
    cases = []
    for fy in range(1 << fb):
        for fx in range(1 << fb):
            cases.append((rng.integers(0, 48), rng.integers(0, 32),
                          (rng.integers(-6, 6) << fb) + fx,
                          (rng.integers(-6, 6) << fb) + fy))
    xs = np.array([c[0] for c in cases], np.int32)
    ys = np.array([c[1] for c in cases], np.int32)
    mvx = np.array([c[2] for c in cases], np.int32)
    mvy = np.array([c[3] for c in cases], np.int32)
    out = np.asarray(mc_batch(jnp.asarray(ref), jnp.asarray(xs),
                              jnp.asarray(ys), jnp.asarray(mvx),
                              jnp.asarray(mvy), n, c_idx))
    for i, (x, y, mx, my) in enumerate(cases):
        gold = mc_block_ref(ref, int(x), int(y), int(mx), int(my),
                            n, n, c_idx)
        assert np.array_equal(out[i], gold), (
            f"frac ({mx & ((1 << fb) - 1)},{my & ((1 << fb) - 1)})")


def test_mc_edge_clamp():
    """MVs pointing outside the plane must use edge-replicated samples."""
    rng = np.random.default_rng(9)
    ref = rng.integers(0, 256, (32, 32)).astype(np.int32)
    cases = [(-40, -40), (120, 120), (-33, 50), (2, -130)]
    xs = np.zeros(len(cases), np.int32)
    ys = np.zeros(len(cases), np.int32)
    mvx = np.array([c[0] for c in cases], np.int32)
    mvy = np.array([c[1] for c in cases], np.int32)
    out = np.asarray(mc_batch(jnp.asarray(ref), jnp.asarray(xs),
                              jnp.asarray(ys), jnp.asarray(mvx),
                              jnp.asarray(mvy), 8, 0))
    for i, (mx, my) in enumerate(cases):
        gold = mc_block_ref(ref, 0, 0, mx, my, 8, 8, 0)
        assert np.array_equal(out[i], gold)
