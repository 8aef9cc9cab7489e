"""Weighted B prediction (x265 --weightb): weighted uni/bi formulas,
slice-header signaling for both lists, bit-exact decode on fades."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from x265_mod_by_patman_tpu.ops.interp import (
    wp_bi_combine, wp_bi_combine_ref, bi_combine_ref)


def test_wp_bi_combine_parity_and_default_degeneration():
    rng = np.random.default_rng(3)
    p0 = rng.integers(0, 1 << 14, (2, 8, 8)).astype(np.int32)
    p1 = rng.integers(0, 1 << 14, (2, 8, 8)).astype(np.int32)
    got = np.asarray(wp_bi_combine(p0, p1, 50, 4, 70, -6, 6))
    want = wp_bi_combine_ref(p0, p1, 50, 4, 70, -6, 6)
    assert np.array_equal(got, want)
    # default weights == plain bi combine, bit-exactly
    dflt = wp_bi_combine_ref(p0, p1, 64, 0, 64, 0, 6)
    assert np.array_equal(dflt, bi_combine_ref(p0, p1))


def _fade_frames(n, w=64, h=48, fade=0.82):
    rng = np.random.default_rng(9)
    ybase = rng.integers(40, 230, (h, w)).astype(np.float64)
    # mild texture motion so B frames pick inter
    out = []
    for i in range(n):
        y = np.roll(ybase, i, axis=1) * (fade ** i)
        out.append((np.clip(y, 0, 255).astype(np.uint8),
                    np.full((h // 2, w // 2), 120, np.uint8),
                    np.full((h // 2, w // 2), 136, np.uint8)))
    return out


def test_weightb_e2e_bit_exact():
    frames = _fade_frames(7)
    p = default_params(64, 48, qp=30, keyframe_max=250, bframes=2,
                       scenecut=False, cu_tree=False, aq_mode=0,
                       weightp=True, weightb=True, b_adapt=0)
    stream, encoded = encode_sequence(p, frames)
    types = {f.disp: f.slice_type for f in encoded}
    assert "B" in types.values()
    pics = sorted(Decoder().decode(stream), key=lambda pc: pc.poc)
    by_disp = {f.disp: f for f in encoded}
    assert len(pics) == 7
    for pc in pics:
        f = by_disp[pc.poc]
        assert np.array_equal(pc.y, f.recon[0]), pc.poc
        assert np.array_equal(pc.u, f.recon[1]), pc.poc
        assert np.array_equal(pc.v, f.recon[2]), pc.poc
        assert pc.md5 == f.md5 == pc.sei_md5, pc.poc


def test_weightb_off_matches_legacy():
    """weightb=False must not change B streams at all (PPS flag off)."""
    frames = _fade_frames(5)
    p1 = default_params(64, 48, qp=31, keyframe_max=250, bframes=2,
                        scenecut=False, cu_tree=False, aq_mode=0,
                        b_adapt=0)
    s1, _ = encode_sequence(p1, frames)
    pics = Decoder().decode(s1)
    for pc in pics:
        assert pc.md5 == pc.sei_md5
