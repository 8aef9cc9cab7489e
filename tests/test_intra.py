"""Intra prediction parity: batched all-modes JAX kernel vs scalar golden."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.ops import intra as I


def _rand_s(rng, n, bit_depth=8):
    return rng.randint(0, (1 << bit_depth), 4 * n + 1).astype(np.int32)


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_all_modes_match_golden_luma(log2):
    rng = np.random.RandomState(log2)
    n = 1 << log2
    B = 3
    s_u = np.stack([_rand_s(rng, n) for _ in range(B)])
    s_f = np.stack([I.filter_refs(s, log2) for s in s_u])
    out = np.asarray(I.intra_pred_all_batch(s_u, s_f, log2, c_idx=0))
    assert out.shape == (B, 35, n, n)
    for b in range(B):
        for mode in range(35):
            golden = I.predict_block_ref(mode, s_u[b], log2, c_idx=0)
            np.testing.assert_array_equal(
                out[b, mode], golden,
                err_msg=f"mode {mode} size {n} block {b}")


@pytest.mark.parametrize("log2", [2, 3, 4])
def test_all_modes_match_golden_chroma(log2):
    rng = np.random.RandomState(40 + log2)
    n = 1 << log2
    s_u = np.stack([_rand_s(rng, n) for _ in range(2)])
    out = np.asarray(I.intra_pred_all_batch(s_u, s_u, log2, c_idx=1))
    for b in range(2):
        for mode in range(35):
            golden = I.predict_block_ref(mode, s_u[b], log2, c_idx=1)
            np.testing.assert_array_equal(out[b, mode], golden,
                                          err_msg=f"chroma mode {mode}")


def test_dc_flat():
    n = 8
    s = np.full(4 * n + 1, 128, dtype=np.int32)
    pred = I.intra_pred_ref(1, s, 3)
    assert (pred == 128).all()


def test_vertical_copies_top():
    n = 8
    s = np.zeros(4 * n + 1, dtype=np.int32)
    top = np.arange(1, 2 * n + 1) * 3
    s[2 * n + 1:] = top
    s[2 * n] = 77
    s[:2 * n] = 50
    pred = I.intra_pred_ref(26, s, 3, c_idx=1)  # chroma: no edge filter
    for x in range(n):
        assert (pred[:, x] == top[x]).all()


def test_horizontal_copies_left():
    n = 4
    s = np.zeros(4 * n + 1, dtype=np.int32)
    left = np.arange(1, 2 * n + 1) * 7
    s[:2 * n] = left[::-1]
    pred = I.intra_pred_ref(10, s, 2, c_idx=1)
    for y in range(n):
        assert (pred[y, :] == left[y]).all()


def test_planar_corners():
    n = 4
    rng = np.random.RandomState(9)
    s = rng.randint(0, 256, 4 * n + 1).astype(np.int32)
    pred = I.intra_pred_ref(0, s, 2)
    left = s[2 * n - 1::-1]
    top = s[2 * n + 1:]
    # planar at (0,0): ((n-1)*left[0] + top[n] + (n-1)*top[0] + left[n] + n)>>3
    expect = ((n - 1) * left[0] + top[n] + (n - 1) * top[0] + left[n] + n) \
        >> (2 + 1)
    assert pred[0, 0] == expect


def test_substitution_fill_and_propagate():
    n = 4
    s = np.arange(17, dtype=np.int32)
    avail = np.ones(17, dtype=bool)
    avail[0] = False          # bottom-left missing -> takes first available
    avail[5:8] = False        # mid-run missing -> propagate previous
    out = I.substitute_refs(s, avail)
    assert out[0] == s[1]
    assert (out[5:8] == s[4]).all()
    none = I.substitute_refs(s, np.zeros(17, dtype=bool))
    assert (none == 128).all()


def test_filter_refs_121():
    n = 8
    s = np.zeros(4 * n + 1, dtype=np.int32)
    s[16] = 100  # an interior sample
    f = I.filter_refs(s, 3)
    assert f[15] == 25 and f[16] == 50 and f[17] == 25


def test_strong_smoothing_linearizes():
    n = 32
    s = np.zeros(4 * n + 1, dtype=np.int32)
    s[2 * n] = 0                                   # corner
    s[2 * n + 1: 4 * n + 1] = np.arange(1, 2 * n + 1)   # top: perfectly linear
    s[:2 * n] = np.arange(2 * n, 0, -1)            # left bottom-up: linear
    assert I.strong_smoothing_condition(s, 5)
    f = I.filter_refs(s, 5, strong=True)
    # exact linear interpolation along top
    assert f[2 * n + 32] == ((63 - 31) * 0 + 32 * 64 + 32) >> 6


def test_substitute_filter_batch_strong_32_matches_golden():
    import numpy as np
    import jax.numpy as jnp
    from x265_mod_by_patman_tpu.ops.intra import (
        substitute_filter_batch, substitute_refs, filter_refs,
        strong_smoothing_condition)
    rng = np.random.default_rng(11)
    n = 32
    B = 12
    s_raw = rng.integers(0, 256, (B, 4 * n + 1)).astype(np.int32)
    # half the lanes smooth (trigger the condition), half noisy
    for b in range(0, B, 2):
        v = np.linspace(40, 90, 4 * n + 1).astype(np.int32)
        s_raw[b] = v
    avail = np.ones((B, 4 * n + 1), bool)
    avail[3, :10] = False
    su, sf = substitute_filter_batch(jnp.asarray(s_raw),
                                     jnp.asarray(avail), 5, 8,
                                     strong=True)
    su, sf = np.asarray(su), np.asarray(sf)
    for b in range(B):
        g_sub = substitute_refs(s_raw[b], avail[b], 8)
        strong = strong_smoothing_condition(g_sub, 5, 8)
        g_filt = filter_refs(g_sub, 5, strong, 8)
        assert np.array_equal(su[b], g_sub), b
        assert np.array_equal(sf[b], g_filt), (b, strong)
