"""Chroma weighted prediction: analysis fires on chroma fades, the
pred_weight_table signals chroma weights (spec 7.4.7.3 offset coding),
and encode/decode stay bit-exact."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from x265_mod_by_patman_tpu.analysis.weightp import (
    analyse_weightp_chroma)


def _fade_frames(n, w=64, h=48, luma_fade=0.85, chroma_fade=0.7):
    """Global fade (both luma and chroma dim over time): the classic
    weightP content."""
    rng = np.random.default_rng(8)
    ybase = rng.integers(60, 220, (h, w)).astype(np.float64)
    ubase = rng.integers(80, 200, (h // 2, w // 2)).astype(np.float64)
    vbase = rng.integers(60, 180, (h // 2, w // 2)).astype(np.float64)
    out = []
    for i in range(n):
        fy = luma_fade ** i
        fc = chroma_fade ** i
        out.append((np.clip(ybase * fy, 0, 255).astype(np.uint8),
                    np.clip(128 + (ubase - 128) * fc, 0, 255)
                    .astype(np.uint8),
                    np.clip(128 + (vbase - 128) * fc, 0, 255)
                    .astype(np.uint8)))
    return out


def test_chroma_weight_analysis_fires_on_fade():
    f = _fade_frames(2)
    got = analyse_weightp_chroma(f[1][1], f[0][1], f[1][2], f[0][2])
    assert got is not None
    (wcb, ocb), (wcr, ocr) = got
    assert wcb < 64 or ocb != 0          # dimming toward 128
    # identical planes -> None
    assert analyse_weightp_chroma(f[0][1], f[0][1],
                                  f[0][2], f[0][2]) is None


def test_chroma_wp_e2e_bit_exact():
    frames = _fade_frames(4)
    p = default_params(64, 48, qp=30, keyframe_max=250, bframes=0,
                       scenecut=False, cu_tree=False, aq_mode=0,
                       weightp=True)
    stream, encoded = encode_sequence(p, frames)
    pics = Decoder().decode(stream)
    assert len(pics) == 4
    for i, (f, pic) in enumerate(zip(encoded, pics)):
        assert np.array_equal(pic.y, f.recon[0]), i
        assert np.array_equal(pic.u, f.recon[1]), i
        assert np.array_equal(pic.v, f.recon[2]), i
        assert pic.md5 == f.md5 == pic.sei_md5, i


def test_chroma_wp_offset_coding_roundtrip():
    """pred_weight_table writer vs decoder parser on a crafted header."""
    from x265_mod_by_patman_tpu.bitstream.headers import (
        SliceHeader, _write_pred_weight_table)
    from x265_mod_by_patman_tpu.bitstream.bitwriter import BitWriter
    from x265_mod_by_patman_tpu.bitstream.bitreader import BitReader
    from x265_mod_by_patman_tpu.decoder.decoder import Decoder

    sh = SliceHeader()
    sh.num_ref_idx = (2, 0)
    sh.wp_l0 = ((70, -3), None)
    sh.wp_l0_chroma = (((45, 12), (80, -9)), None)
    bw = BitWriter()
    _write_pred_weight_table(bw, sh)
    bw.u(1, 1)
    bw.byte_align_zero()
    dec = Decoder.__new__(Decoder)
    denom, wps, cps, _l1 = Decoder._parse_pred_weight_table(
        dec, BitReader(bw.get_bytes()), 2)
    assert denom == 6
    assert wps == [(70, -3), None]
    assert cps == [((45, 12), (80, -9)), None]
