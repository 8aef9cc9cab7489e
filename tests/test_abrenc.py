"""ABR-ladder app (cli --abr-ladder): shared reader, per-rung scale,
x265-format config file (one full command line per encode)."""
import os

import numpy as np
import pytest

from x265_mod_by_patman_tpu.io.y4m import Y4MWriter


class _Info:
    def __init__(self, w, h):
        self.width, self.height = w, h
        self.fps_num, self.fps_denom = 25, 1
        self.total_frames = 0
        self.csp = "420"
        self.bit_depth = 8


def _write_clip(path, w, h, n):
    rng = np.random.default_rng(7)
    wr = Y4MWriter(path, _Info(w, h))
    base = rng.integers(0, 255, (h, w), np.uint8)
    for i in range(n):
        y = np.roll(base, i, axis=1)
        u = np.full((h // 2, w // 2), 100 + i, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        wr.write(y, u, v)
    wr.close()


def test_abr_ladder_app(tmp_path):
    clip = str(tmp_path / "in.y4m")
    _write_clip(clip, 64, 64, 5)
    o1 = str(tmp_path / "full.hevc")
    o2 = str(tmp_path / "half.hevc")
    cfg = tmp_path / "ladder.conf"
    cfg.write_text(
        "# master rung\n"
        f"--input {clip} -o {o1} --qp 32 --no-progress\n"
        f"--input {clip} -o {o2} --input-res 32x32 --qp 34 "
        "--no-progress\n")
    from x265_mod_by_patman_tpu.cli import main
    rc = main(["--abr-ladder", str(cfg)])
    assert rc == 0
    from x265_mod_by_patman_tpu.decoder.decoder import Decoder
    for path, w in ((o1, 64), (o2, 32)):
        data = open(path, "rb").read()
        assert len(data) > 0
        dec = Decoder()
        pics = dec.decode(data)
        assert len(pics) == 5
        assert pics[0].y.shape[1] == w
        for pic in pics:
            assert pic.sei_md5 is None or pic.sei_md5 == pic.md5


def test_abr_ladder_rejects_mixed_inputs(tmp_path):
    clip = str(tmp_path / "in.y4m")
    _write_clip(clip, 32, 32, 2)
    cfg = tmp_path / "bad.conf"
    cfg.write_text(f"--input {clip} -o {tmp_path}/a.hevc --qp 32\n"
                   f"--input other.y4m -o {tmp_path}/b.hevc --qp 32\n")
    from x265_mod_by_patman_tpu.cli import main
    assert main(["--abr-ladder", str(cfg)]) == 1
