"""Fade detection (--fades) and VBV lookahead."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import encode_sequence
from x265_mod_by_patman_tpu.analysis.slicetype import SlicetypeLookahead
from x265_mod_by_patman_tpu.rc.ratecontrol import (
    RateControl, qp_to_qscale)


def test_fade_state_detects_ramps():
    st = SlicetypeLookahead(64, 64, 3)
    rng = np.random.default_rng(1)
    base = rng.integers(40, 120, (64, 64)).astype(np.int32)
    for i in range(6):
        st.push(i, np.clip(base + 18 * i, 0, 255).astype(np.uint8))
    assert st.fade_state(5) == 1
    st2 = SlicetypeLookahead(64, 64, 3)
    for i in range(6):
        st2.push(i, np.clip(base + 90 - 18 * i, 0, 255)
                 .astype(np.uint8))
    assert st2.fade_state(5) == -1
    st3 = SlicetypeLookahead(64, 64, 3)
    for i in range(6):
        st3.push(i, base.astype(np.uint8))
    assert st3.fade_state(5) == 0


def test_fades_suppress_mid_fade_scenecut():
    """A long fade must not fragment into IDRs with --fades on."""
    rng = np.random.default_rng(5)
    base = rng.integers(0, 110, (48, 64)).astype(np.int32)
    frames = []
    for i in range(12):
        y = np.clip(base + 12 * i, 0, 255).astype(np.uint8)
        frames.append((y, np.full((24, 32), 128, np.uint8),
                       np.full((24, 32), 128, np.uint8)))
    common = dict(qp=32, keyframe_max=250, keyframe_min=1, bframes=0,
                  cu_tree=False, aq_mode=0, weightp=True)
    p_f = default_params(64, 48, fades=True, **common)
    _, enc_f = encode_sequence(p_f, frames)
    n_idr_f = sum(1 for f in enc_f if f.slice_type == "I")
    assert n_idr_f <= 2, [f.slice_type for f in enc_f]


def test_vbv_lookahead_raises_qscale_before_spike():
    rc = RateControl("abr", 32, 23.0, 1000, 25.0, 416, 240)
    rc.set_vbv(500, 1000)
    # warm the bits model
    for i in range(6):
        q = rc.frame_qp("P", 1000.0)
        rc.update("P", q, 40000, 1000.0)
    qs_plain = qp_to_qscale(rc.frame_qp("P", 1000.0))
    # a burst of very complex frames right behind this one
    qs_la = qp_to_qscale(rc.frame_qp("P", 1000.0,
                                     upcoming=[30000.0] * 8))
    assert qs_la >= qs_plain
    rc2 = RateControl("abr", 32, 23.0, 1000, 25.0, 416, 240)
    rc2.set_vbv(500, 1000)
    for i in range(6):
        q = rc2.frame_qp("P", 1000.0)
        rc2.update("P", q, 40000, 1000.0)
    # quiet upcoming window: no extra clamp
    q_quiet = rc2.frame_qp("P", 1000.0, upcoming=[1000.0] * 8)
    assert q_quiet <= rc2.frame_qp("P", 1000.0, upcoming=[30000.0] * 8)
