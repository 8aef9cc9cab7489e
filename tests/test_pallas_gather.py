"""Pallas window-gather kernel: parity with the clamped XLA gather."""
import numpy as np
import jax.numpy as jnp

from x265_mod_by_patman_tpu.ops.pallas.gather import (
    MARGIN, pad_plane, window_gather)


def test_window_gather_parity_incl_out_of_bounds():
    rng = np.random.default_rng(0)
    h, w, size = 48, 64, 23
    ref = rng.integers(0, 256, (h, w)).astype(np.int32)
    # starts incl. negative and beyond-edge (within the margin)
    ys = np.array([-3, 0, 10, h - 5, h + 4, -30], np.int32)
    xs = np.array([-7, 5, 40, w - 3, -1, w + 10], np.int32)
    got = np.asarray(window_gather(
        pad_plane(jnp.asarray(ref)),
        jnp.asarray(ys + MARGIN), jnp.asarray(xs + MARGIN), size,
        interpret=True))
    for k in range(len(ys)):
        yy = np.clip(ys[k] + np.arange(size)[:, None], 0, h - 1)
        xx = np.clip(xs[k] + np.arange(size)[None, :], 0, w - 1)
        assert np.array_equal(got[k], ref[yy, xx]), k
