"""4:2:2 chroma format end-to-end (RExt): dual stacked chroma TBs,
Table 8-3 intra angle remap, mixed-axis MC/deblock geometry."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params, CHROMA_422
from x265_mod_by_patman_tpu.encoder.top import encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def synth422(w, h, seed=0, motion=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx + motion) * 255 // max(1, w) + yy * 80 // max(1, h)) % 256
    y = np.clip(y + rng.integers(-20, 21, (h, w)), 0, 255)
    cyy, cxx = np.mgrid[0:h, 0:w // 2]
    u = ((cxx * 3 + cyy + motion) % 200 + 20
         + rng.integers(-10, 11, (h, w // 2)))
    v = ((2 * cxx - cyy - motion) % 180 + 30
         + rng.integers(-10, 11, (h, w // 2)))
    return (y.astype(np.uint8), np.clip(u, 0, 255).astype(np.uint8),
            np.clip(v, 0, 255).astype(np.uint8))


def _check(stream, encoded, n, reorder=False):
    pics = Decoder().decode(stream)
    assert len(pics) == n
    if reorder:
        pics = sorted(pics, key=lambda pc: pc.poc)
        pairs = [({f.disp: f for f in encoded}[pc.poc], pc)
                 for pc in pics]
    else:
        pairs = list(zip(encoded, pics))
    for f, pc in pairs:
        assert pc.u.shape == (pc.y.shape[0], pc.y.shape[1] // 2)
        assert np.array_equal(pc.y, f.recon[0]), pc.poc
        assert np.array_equal(pc.u, f.recon[1]), pc.poc
        assert np.array_equal(pc.v, f.recon[2]), pc.poc
        assert pc.md5 == f.md5 == pc.sei_md5, pc.poc
    return pics


def test_422_intra():
    w, h = 96, 64
    p = default_params(w, h, qp=30, keyframe_max=1,
                       internal_csp=CHROMA_422, deblock=False)
    frames = [synth422(w, h, seed=i) for i in range(2)]
    stream, encoded = encode_sequence(p, frames)
    dec = Decoder()
    dec.decode(stream)
    assert dec.sps.chroma_format_idc == 2
    assert dec.sps.ptl.profile_idc == 4
    _check(stream, encoded, 2)


def test_422_intra_deblock():
    w, h = 64, 64
    p = default_params(w, h, qp=32, keyframe_max=1,
                       internal_csp=CHROMA_422, deblock=True)
    frames = [synth422(w, h, seed=3)]
    stream, encoded = encode_sequence(p, frames)
    _check(stream, encoded, 1)


def test_422_inter_gop():
    w, h = 64, 64
    p = default_params(w, h, qp=32, keyframe_max=250, bframes=1,
                       internal_csp=CHROMA_422, scenecut=False,
                       cu_tree=False, aq_mode=0)
    frames = [synth422(w, h, seed=5, motion=3 * i) for i in range(4)]
    stream, encoded = encode_sequence(p, frames)
    assert "P" in [f.slice_type for f in encoded]
    _check(stream, encoded, 4, reorder=True)


def test_422_angle_map_is_spec_table():
    from x265_mod_by_patman_tpu.constants.hevc_tables import (
        CHROMA_422_ANGLE_MAP)
    assert len(CHROMA_422_ANGLE_MAP) == 35
    assert CHROMA_422_ANGLE_MAP[0] == 0          # planar
    assert CHROMA_422_ANGLE_MAP[1] == 1          # DC
    assert CHROMA_422_ANGLE_MAP[26] == 26        # vertical fixed point
    assert CHROMA_422_ANGLE_MAP[10] == 10        # horizontal fixed pt
