"""VBV buffer constraint + 2-pass rate control."""
import os
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from x265_mod_by_patman_tpu.rc.ratecontrol import (
    RateControl, FrameStats, write_stats_file, read_stats_file)
from tests.test_e2e_inter import moving_scene


def test_vbv_clip_raises_qp():
    rc = RateControl("abr", 32, 23.0, 2000, 25.0, 416, 240)
    # warm the bits model: 50k bits at qp 30 for cplx 5000
    for _ in range(5):
        rc.update("P", 30, 50000, 5000.0)
    free = rc.frame_qp("P", 5000.0)
    rc2 = RateControl("abr", 32, 23.0, 2000, 25.0, 416, 240)
    for _ in range(5):
        rc2.update("P", 30, 50000, 5000.0)
    rc2.set_vbv(40, 1000)       # tiny buffer: 40 kbit
    tight = rc2.frame_qp("P", 5000.0)
    assert tight > free


def test_vbv_fullness_tracks():
    rc = RateControl("abr", 32, 23.0, 1000, 25.0, 416, 240)
    rc.set_vbv(500, 1000, init=0.5)
    f0 = rc.vbv_fullness
    rc.update("P", 30, 10000, 1000.0)
    assert rc.vbv_fullness == f0 + rc.vbv_rate - 10000
    rc.update("P", 30, 10**9, 1000.0)         # catastrophic frame
    assert rc.vbv_fullness == 0.0 and rc.vbv_underflows == 1


def test_stats_roundtrip(tmp_path):
    st = [FrameStats("I", 29.0, 120000, 8000.0),
          FrameStats("P", 32.0, 30000, 3000.0),
          FrameStats("B", 34.0, 8000, 1500.0)]
    path = str(tmp_path / "s.log")
    write_stats_file(path, st)
    back = read_stats_file(path)
    assert [(a.ftype, a.qp, a.bits) for a in back] == \
        [(a.ftype, a.qp, a.bits) for a in st]


def test_two_pass_hits_target_better(tmp_path):
    """Pass 2 lands nearer the bitrate target than single-pass ABR."""
    w, h, n = 96, 64, 12
    frames = moving_scene(w, h, n, seed=5)
    target = 400
    path = str(tmp_path / "stats.log")

    def encode(pass_num):
        p = default_params(w, h, keyframe_max=250, bframes=2,
                           rc_mode="abr", bitrate_kbps=target,
                           pass_num=pass_num, stats_file=path,
                           cu_tree=False)
        enc = Encoder(p)
        out = []
        for (y, u, v) in frames:
            out.extend(enc.encode_frame(y, u, v))
        out.extend(enc.flush())
        enc.write_stats()
        bits = sum(f.bits for f in out)
        # bit-exactness still holds under 2-pass RC
        pics = Decoder().decode(b"".join(f.bitstream for f in out))
        assert all(p_.md5 == p_.sei_md5 for p_ in pics)
        return bits / n * 25 / 1000.0

    kbps1 = encode(1)
    kbps2 = encode(2)
    assert abs(kbps2 - target) <= abs(kbps1 - target) + 1.0
    assert abs(kbps2 - target) / target < 0.35


def test_two_pass_cutree_reuse(tmp_path):
    """Pass 1 persists its cuTree propagation offsets; pass 2 plays
    them back instead of re-running the lookahead (cuTreeReadFor2Pass
    analog) — and the pass-2 stream still decodes bit-exact."""
    stats = str(tmp_path / "st.log")
    frames = moving_scene(96, 64, 10, seed=2)

    p1 = default_params(96, 64, rc_mode="abr", bitrate_kbps=400,
                        keyframe_max=250, bframes=2, b_adapt=0,
                        scenecut=False, stats_file=stats, pass_num=1,
                        rc_lookahead=6)
    e1 = Encoder(p1)
    for f in frames:
        e1.encode_frame(*f)
    e1.flush()
    e1.write_stats()
    assert os.path.exists(stats + ".cutree")

    p2 = default_params(96, 64, rc_mode="abr", bitrate_kbps=400,
                        keyframe_max=250, bframes=2, b_adapt=0,
                        scenecut=False, stats_file=stats, pass_num=2,
                        rc_lookahead=6)
    e2 = Encoder(p2)
    assert e2._ct2pass is not None and e2._cutree is None
    out = []
    for f in frames:
        out.extend(e2.encode_frame(*f))
    out.extend(e2.flush())
    assert len(out) == len(frames)
    pics = Decoder().decode(b"".join(f.bitstream for f in out))
    for pc, f in zip(pics, out):
        assert pc.md5 == pc.sei_md5 == f.md5
