"""Inter TU32 pre-pass (frame/inter_tu32.py): uniform-motion 32-regions
code their residual as one luma TU32 + TU16 chroma, and the stream
stays bit-exact against the conformance decoder."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def _pan_clip(w=96, h=64, n=3, seed=5, noise=2.0):
    """Textured world panned by an integer-pel global motion + light
    per-frame noise: analysis converges on uniform motion per region
    while the residual stays nonzero (the TU32 regime)."""
    rng = np.random.default_rng(seed)
    world = rng.integers(40, 216, (h + 32, w + 64), np.int32)
    # smooth a little so MC predicts well but not exactly
    world = (world + np.roll(world, 1, 0) + np.roll(world, 1, 1)
             + np.roll(world, -1, 0)) // 4
    frames = []
    for i in range(n):
        ox = 4 * i
        y = world[8:8 + h, ox:ox + w].astype(np.float64)
        y = np.clip(y + rng.normal(0, noise, y.shape), 0, 255)
        u = np.clip(128 + rng.normal(0, noise, (h // 2, w // 2)) +
                    (y[::2, ::2] - 128) * 0.2, 0, 255)
        v = np.full((h // 2, w // 2), 128.0)
        frames.append((y.astype(np.uint8), u.astype(np.uint8),
                       v.astype(np.uint8)))
    return frames


def test_inter_tu32_bit_exact_and_engaged():
    frames = _pan_clip(noise=4.0)
    w, h = frames[0][0].shape[1], frames[0][0].shape[0]
    p = default_params(w, h, qp=26, keyframe_max=250, bframes=0)
    assert p.validate().var_cu_tree, \
        "test premise: tree mode on by default"
    stream, _ = encode_sequence(p, frames)
    dec = Decoder()
    pics = dec.decode(stream)
    assert len(pics) == len(frames)
    for p in pics:
        assert p.sei_md5 == p.md5, "decoder/encoder recon mismatch"
    tu32 = 0
    for pic in pics[1:]:
        for cu in pic.cus:
            if cu.is_inter and (0, cu.x0, cu.y0, 5) in cu.coeffs:
                tu32 += 1
    assert tu32 > 0, "no inter TU32 CU produced on the pan clip"


def test_region_uniform_mask_basic():
    from x265_mod_by_patman_tpu.frame.inter_tu32 import (
        region_uniform_mask)
    nby, nbx = 4, 6
    inter = np.ones((nby, nbx), bool)
    mvs = np.zeros((nby, nbx, 2), np.int32)
    mvs[..., 0] = 8
    m = region_uniform_mask(inter, mvs, None, None, None, None,
                            nbx * 16, nby * 16)
    assert m.shape == (2, 3) and m.all()
    # one deviating block kills its region only
    mvs[1, 1, 0] = 12
    m = region_uniform_mask(inter, mvs, None, None, None, None,
                            nbx * 16, nby * 16)
    assert not m[0, 0] and m[0, 1] and m[0, 2] and m[1].all()
    # an intra block kills its region
    inter[2, 4] = False
    m = region_uniform_mask(inter, mvs, None, None, None, None,
                            nbx * 16, nby * 16)
    assert not m[1, 2]
    # unused-list values are don't-cares (canonicalized like
    # _motion_key): L0-only blocks with differing stale L1 mvs merge
    dirs = np.ones((nby, nbx), np.int32)
    mvs1 = np.zeros((nby, nbx, 2), np.int32)
    mvs1[3, 0, 0] = 99                     # stale, dir says L0-only
    mvs[1, 1, 0] = 8
    inter[2, 4] = True
    m = region_uniform_mask(inter, mvs, mvs1, dirs, None, None,
                            nbx * 16, nby * 16)
    assert m.all()
