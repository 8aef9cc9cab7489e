"""Scaler + ABR ladder."""
import numpy as np

from x265_mod_by_patman_tpu.utils.scaler import (
    _filter_matrix, scale_plane, scale_frame)
from x265_mod_by_patman_tpu.parallel.ladder import (
    AbrLadder, Rung, parse_rung)
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def test_filter_rows_normalized():
    m = _filter_matrix(96, 48)
    assert m.shape == (48, 96)
    assert (m.sum(axis=1) == (1 << 14)).all()


def test_scale_preserves_flat():
    p = np.full((96, 128), 137, np.uint8)
    s = scale_plane(p, 64, 48)
    assert s.shape == (48, 64)
    assert np.all(s == 137)


def test_scale_gradient_monotonic():
    p = np.tile(np.arange(128, dtype=np.uint8) * 2, (64, 1))
    s = scale_plane(p, 64, 32)
    assert np.all(np.diff(s[16].astype(int)) >= 0)
    assert abs(int(s[16, 32]) - int(p[32, 64])) <= 6


def test_parse_rung():
    r = parse_rung("640x360:qp30")
    assert (r.width, r.height, r.qp) == (640, 360, 30)
    r2 = parse_rung("1280x720:1500k")
    assert r2.rc_mode == "abr" and r2.bitrate_kbps == 1500


def test_ladder_two_rungs_decode():
    rng = np.random.default_rng(4)
    frames = [(rng.integers(0, 256, (96, 128)).astype(np.uint8),
               rng.integers(0, 256, (48, 64)).astype(np.uint8),
               rng.integers(0, 256, (48, 64)).astype(np.uint8))
              for _ in range(3)]
    lad = AbrLadder([parse_rung("128x96:qp32"), parse_rung("64x64:qp34")],
                    keyframe_max=1)
    per_rung = [[], []]
    for f in frames:
        for i, fl in enumerate(lad.encode_frame(*f)):
            per_rung[i].extend(fl)
    for i, fl in enumerate(lad.flush()):
        per_rung[i].extend(fl)
    for i, (w, h) in enumerate(((128, 96), (64, 64))):
        stream = b"".join(f.bitstream for f in per_rung[i])
        pics = Decoder().decode(stream)
        assert len(pics) == 3
        assert pics[0].y.shape == (h, w)
        assert all(p_.md5 == p_.sei_md5 for p_ in pics)
