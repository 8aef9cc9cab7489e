"""Deblock: golden scalar vs batched JAX parity (checkasm analog)."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.ops.deblock import (
    deblock_luma_ref, deblock_chroma_ref, deblock_frame_batch,
    intra_bs_maps, chroma_on_maps, _luma_edges_pass, _chroma_edges_pass)
from x265_mod_by_patman_tpu.frame.recon_intra import chroma_qp

import jax.numpy as jnp


def smooth_noise(rng, h, w, amp=24):
    """Blocky content with soft gradients — exercises strong+weak paths."""
    base = rng.integers(40, 200, (h // 8, w // 8))
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)
    img = img + rng.integers(-amp, amp + 1, (h, w))
    return np.clip(img, 0, 255).astype(np.int32)


@pytest.mark.parametrize("qp", [22, 32, 45])
@pytest.mark.parametrize("size", [(64, 64), (96, 48)])
def test_luma_parity(qp, size):
    w, h = size
    rng = np.random.default_rng(qp * w)
    plane = smooth_noise(rng, h, w)
    bs_v = rng.integers(0, 3, (h // 4, w // 8 - 1)).astype(np.int32)
    bs_h = rng.integers(0, 3, (h // 8 - 1, w // 4)).astype(np.int32)
    golden = deblock_luma_ref(plane, bs_v, bs_h, qp)
    ev = jnp.arange(1, w // 8) * 8
    eh = jnp.arange(1, h // 8) * 8
    out = _luma_edges_pass(jnp.asarray(plane), jnp.asarray(bs_v), ev,
                           qp, 0, 0, 8)
    out = _luma_edges_pass(out.T, jnp.asarray(bs_h).T, eh, qp, 0, 0, 8).T
    assert np.array_equal(golden, np.asarray(out))


@pytest.mark.parametrize("qp", [27, 39])
def test_chroma_parity(qp):
    w, h = 64, 64          # luma dims
    hc, wc = h // 2, w // 2
    rng = np.random.default_rng(qp)
    plane = smooth_noise(rng, hc, wc)
    bs_v = rng.integers(0, 3, (h // 4, w // 8 - 1)).astype(np.int32)
    bs_h = rng.integers(0, 3, (h // 8 - 1, w // 4)).astype(np.int32)
    on_v, on_h = chroma_on_maps(bs_v, bs_h, hc, wc)
    qpc = chroma_qp(qp)
    golden = deblock_chroma_ref(plane, on_v, on_h, qpc)
    evc = jnp.arange(1, wc // 8) * 8
    ehc = jnp.arange(1, hc // 8) * 8
    out = _chroma_edges_pass(jnp.asarray(plane), jnp.asarray(on_v), evc,
                             qpc, 0, 8)
    out = _chroma_edges_pass(out.T, jnp.asarray(on_h).T, ehc, qpc, 0, 8).T
    assert np.array_equal(golden, np.asarray(out))


def test_full_frame_and_intra_bs():
    w, h = 96, 64
    qp = 32
    rng = np.random.default_rng(5)
    y = smooth_noise(rng, h, w)
    u = smooth_noise(rng, h // 2, w // 2)
    v = smooth_noise(rng, h // 2, w // 2)
    bs_v, bs_h = intra_bs_maps(w, h, 16)
    assert (bs_v[:, 1::2] == 2).all() and (bs_v[:, ::2] == 0).all()
    on_v, on_h = chroma_on_maps(bs_v, bs_h, h // 2, w // 2)
    qpc = chroma_qp(qp)
    yy, uu, vv = deblock_frame_batch(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
        jnp.asarray(bs_v), jnp.asarray(bs_h),
        jnp.asarray(on_v), jnp.asarray(on_h), qp, qpc, qpc)
    gy = deblock_luma_ref(y, bs_v, bs_h, qp)
    gu = deblock_chroma_ref(u, on_v, on_h, qpc)
    gv = deblock_chroma_ref(v, on_v, on_h, qpc)
    assert np.array_equal(gy, np.asarray(yy))
    assert np.array_equal(gu, np.asarray(uu))
    assert np.array_equal(gv, np.asarray(vv))
    assert not np.array_equal(gy, y), "filter should modify something"
