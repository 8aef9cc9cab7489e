"""Temporal MVP: col-motion derivation + e2e bit-exactness."""
import numpy as np

from x265_mod_by_patman_tpu.entropy.mv_pred import (
    ColMotion, temporal_candidate)
from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_inter import moving_scene


def _col(poc=4):
    d = np.zeros((4, 6), np.int8)
    mv = np.zeros((4, 6, 2, 2), np.int32)
    rp = np.zeros((4, 6, 2), np.int64)
    d[1, 1] = 1
    mv[1, 1, 0] = (8, -4)
    rp[1, 1, 0] = 0                      # col ref poc 0, col poc 4
    return ColMotion(poc, d, mv, rp)


def test_temporal_candidate_scaling():
    col = _col()
    # cur_poc 6 targeting ref poc 4: tb=2, td=4 -> mv halved
    mv = temporal_candidate(col, 16, 16, 16, 0, 4, 6, 96, 64, 5, True)
    assert mv == (4, -2)


def test_temporal_candidate_c0_ctu_row_rule():
    col = _col()
    # block at the bottom CTU row edge: C0 would cross -> C1 center used
    mv = temporal_candidate(col, 16, 16, 16, 0, 4, 6, 96, 64, 5, True)
    assert mv is not None


def test_tmvp_e2e_bit_exact():
    frames = moving_scene(96, 64, 8, seed=9)
    p = default_params(96, 64, qp=30, keyframe_max=250, bframes=3,
                       temporal_mvp=True)
    enc = Encoder(p)
    assert enc.sps.temporal_mvp
    out = []
    for f in frames:
        out.extend(enc.encode_frame(*f))
    out.extend(enc.flush())
    pics = Decoder().decode(b"".join(f.bitstream for f in out))
    by = {f.poc: f for f in out}
    for p_ in pics:
        f = by[p_.poc]
        assert np.array_equal(p_.y, f.recon[0])
        assert np.array_equal(p_.u, f.recon[1])
        assert np.array_equal(p_.v, f.recon[2])
        assert p_.md5 == f.md5 == p_.sei_md5


def test_scale_mv_negative_td_truncates_toward_zero():
    # spec 8.5.3.2.8: tx = (16384 + |td|/2) / td with C truncation; for
    # td = -2, tx must be -8192 (floor division would give -8193)
    from x265_mod_by_patman_tpu.entropy.mv_pred import _scale_mv
    # tb=1, td=-2: dsf = clip((1*-8192 + 32) >> 6) = -128 -> mv halved,
    # sign flipped
    assert _scale_mv((8, -4), 1, -2) == (-4, 2)
    # symmetry: scaling with td=2, tb=-1 must mirror exactly
    assert _scale_mv((8, -4), -1, 2) == (-4, 2)
    # the off-by-one case: larger mv magnifies the tx error if floored
    big = _scale_mv((1024, 0), 1, -2)
    assert big == (-512, 0)
