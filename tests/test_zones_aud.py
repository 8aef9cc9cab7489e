"""Zones, qpfile, AUD, histogram scenecut, b-adapt."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_inter import moving_scene


def _roundtrip(p, frames):
    enc = Encoder(p)
    out = []
    for (y, u, v) in frames:
        out.extend(enc.encode_frame(y, u, v))
    out.extend(enc.flush())
    pics = Decoder().decode(b"".join(f.bitstream for f in out))
    by_poc = {f.disp: f for f in out}
    assert len(pics) == len(out)
    for pic, f in zip(pics, sorted(out, key=lambda x: x.disp)):
        pass
    for f in out:
        pass
    for pic in pics:
        pass
    assert all(p_.md5 == p_.sei_md5 for p_ in pics)
    return out


def test_zone_qp_override():
    w, h = 96, 64
    frames = moving_scene(w, h, 6, seed=3)
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=0)
    p.parse("zones", "2,3,q=40")
    out = _roundtrip(p, frames)
    by_disp = {f.disp: f for f in out}
    assert by_disp[2].qp == 40 and by_disp[3].qp == 40
    assert by_disp[1].qp != 40


def test_qpfile(tmp_path):
    w, h = 96, 64
    frames = moving_scene(w, h, 5, seed=3)
    qf = tmp_path / "qp.txt"
    qf.write_text("0 I 33\n2 I 35\n3 P 31\n")
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=0)
    p.parse("qpfile", str(qf))
    out = _roundtrip(p, frames)
    by_disp = {f.disp: f for f in out}
    assert by_disp[0].slice_type == "I" and by_disp[0].qp == 33
    assert by_disp[2].slice_type == "I" and by_disp[2].qp == 35
    assert by_disp[3].qp == 31


def test_aud_present():
    w, h = 96, 64
    frames = moving_scene(w, h, 3, seed=3)
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=0, aud=True)
    out = _roundtrip(p, frames)
    from x265_mod_by_patman_tpu.bitstream.nal import split_annexb
    types = [(n[0] >> 1) & 0x3F for n in split_annexb(out[0].bitstream)]
    assert 35 in types                       # NAL_AUD


def test_hist_scenecut():
    rng = np.random.default_rng(5)
    w, h = 96, 64
    dark = (rng.random((h, w)) * 40).astype(np.uint8)
    brite = (rng.random((h, w)) * 200 + 55).astype(np.uint8)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    frames = [(dark, u, u)] * 4 + [(brite, u, u)] * 3
    p = default_params(w, h, qp=30, keyframe_max=250, keyframe_min=1,
                       bframes=0, hist_scenecut=True)
    out = _roundtrip(p, frames)
    by_disp = {f.disp: f for f in out}
    assert by_disp[4].slice_type == "I"      # cut detected


def test_b_adapt_closes_minigop():
    """The b-adapt DP must not span an uncorrelated content change with
    Bs: the mini-GOP closes with a P anchor on the last cheap frame
    (slicetype.cpp slicetypePath cost-optimal placement)."""
    rng = np.random.default_rng(6)
    w, h = 96, 64
    u = np.full((h // 2, w // 2), 128, np.uint8)
    base = rng.integers(0, 256, (h, w)).astype(np.uint8)
    frames = [(np.roll(base, 2 * k, 1), u, u) for k in range(4)]
    hard = rng.integers(0, 256, (h, w)).astype(np.uint8)   # content change
    frames.append((hard, u, u))
    frames.append((np.roll(hard, 2, 1), u, u))
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=3, b_adapt=1,
                       keyframe_min=100)   # suppress scene-cut IDR
    out = _roundtrip(p, frames)
    by_disp = {f.disp: f.slice_type for f in out}
    assert by_disp[3] in ("P", "I"), by_disp   # GOP closed before the cut
    assert by_disp[1] == "B" and by_disp[2] == "B", by_disp
