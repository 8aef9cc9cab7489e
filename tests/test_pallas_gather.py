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


def test_pad_plane_width_lane_aligned():
    """The DMA start clamp in _gather_kernel (min(x128, w - XFETCH)) is
    annotated multiple_of(128), which is only TRUE when the padded
    width is a multiple of 128.  An unaligned width passes interpret
    mode but returns garbage right-edge windows on real hardware — at
    1080p this corrupted MC for the last ~160 columns of every inter
    frame (round-5 1080p BD measurement: 3x P/B bit flood)."""
    for w in (416, 640, 960, 1280, 1920, 3840, 100, 418, 1922):
        padded = pad_plane(jnp.zeros((16, w), jnp.int32))
        assert padded.shape[1] % 128 == 0, (w, padded.shape)
        assert padded.shape[1] >= w + 2 * MARGIN or \
            padded.shape[1] >= 256  # XFETCH floor for narrow planes


def test_window_gather_parity_right_edge_1080p_width():
    """Right-edge blocks at a width whose naive padding is NOT
    lane-aligned (1920 + 96 = 2016): the clamped-DMA branch of the
    kernel.  Parity vs the scalar clamped window."""
    rng = np.random.default_rng(1)
    h, w, size = 32, 1920, 23
    ref = rng.integers(0, 256, (h, w)).astype(np.int32)
    xs = np.array([1760, 1800, 1856, 1900, w - 16, w + 10], np.int32)
    ys = np.full_like(xs, 4)
    got = np.asarray(window_gather(
        pad_plane(jnp.asarray(ref)),
        jnp.asarray(ys + MARGIN), jnp.asarray(xs + MARGIN), size,
        interpret=True))
    for k in range(len(ys)):
        yy = np.clip(ys[k] + np.arange(size)[:, None], 0, h - 1)
        xx = np.clip(xs[k] + np.arange(size)[None, :], 0, w - 1)
        assert np.array_equal(got[k], ref[yy, xx]), k
