"""Temporal sub-layers (x265 --temporal-layers; reference dpb.cpp:181
TSA typing + encoder.cpp:3668 sub-layer SPS/VPS signaling)."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from x265_mod_by_patman_tpu.bitstream.nal import (
    NAL_TSA_N, NAL_TSA_R, NAL_TRAIL_R, split_annexb)


def _clip(n, w=64, h=64):
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (h, w), np.uint8)
    out = []
    for i in range(n):
        y = np.roll(base, 2 * i, axis=1)
        u = np.full((h // 2, w // 2), 90 + i, np.uint8)
        v = np.full((h // 2, w // 2), 150, np.uint8)
        out.append((y, u, v))
    return out


def _encode(tl, bframes=3, pyramid=False, n=9):
    p = default_params(64, 64, qp=33, keyframe_max=32, bframes=bframes,
                       b_pyramid=pyramid, temporal_layers=tl,
                       b_adapt=0, scenecut=False, open_gop=False,
                       cu_tree=False, rc_lookahead=0)
    stream, frames = encode_sequence(p.validate(), _clip(n))
    return stream, frames


def _slice_nals(stream):
    out = []
    for nal in split_annexb(stream):
        t = (nal[0] >> 1) & 0x3F
        if t <= 31:
            out.append((t, (nal[1] & 7) - 1))
    return out


def test_two_layers_tsa_n():
    stream, _ = _encode(2)
    dec = Decoder()
    pics = dec.decode(stream)
    for pic in pics:
        assert pic.sei_md5 == pic.md5
    nals = _slice_nals(stream)
    tsa = [(t, tid) for (t, tid) in nals if t == NAL_TSA_N]
    assert tsa, "no TSA_N slices emitted"
    assert all(tid == 1 for (_t, tid) in tsa)
    # anchors stay at the base layer
    assert all(tid == 0 for (t, tid) in nals if t != NAL_TSA_N)
    assert dec.sps.max_sub_layers == 2
    # decoded temporal ids follow the NAL headers
    assert any(pic.temporal_id == 1 for pic in pics)


def test_three_layers_pyramid():
    stream, _ = _encode(3, bframes=3, pyramid=True)
    dec = Decoder()
    pics = dec.decode(stream)
    for pic in pics:
        assert pic.sei_md5 == pic.md5
    nals = _slice_nals(stream)
    assert any(t == NAL_TSA_R and tid == 1 for (t, tid) in nals), \
        "pyramid mid-B should be TSA_R at layer 1"
    assert any(t == NAL_TSA_N and tid == 2 for (t, tid) in nals)
    assert dec.sps.max_sub_layers == 3


def test_layers_clamped_without_bframes():
    p = default_params(64, 64, bframes=0, temporal_layers=2)
    p.validate()
    assert p.temporal_layers == 0
