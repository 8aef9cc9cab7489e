"""App-side IO breadth: gop+ chunked output (round trip + decode),
reconplay pipe, VMAF gate, script-input gating."""
import os
import subprocess
import sys

import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def _frames(n, w=64, h=48):
    rng = np.random.default_rng(4)
    base = rng.integers(0, 255, (h + 16, w + 16)).astype(np.int32)
    return [(np.clip(base[i:i + h, i:i + w], 0, 255).astype(np.uint8),
             np.full((h // 2, w // 2), 120, np.uint8),
             np.full((h // 2, w // 2), 135, np.uint8))
            for i in range(n)]


def test_gop_output_roundtrip(tmp_path):
    from x265_mod_by_patman_tpu.io.gop_output import (
        GOPOutput, read_gop_stream)
    p = default_params(64, 48, qp=32, keyframe_max=4, bframes=0,
                       scenecut=False, cu_tree=False, aq_mode=0)
    enc = Encoder(p)
    gop = tmp_path / "seg.gop"
    g = GOPOutput(str(gop), p)
    g.write_headers(enc.headers())
    enc._headers_sent = True
    n = 0
    for f in _frames(8):
        for fr in enc.encode_frame(*f):
            g.write_frame(fr.bitstream, fr.slice_type == "I",
                          pts=fr.disp, dts=n)
            n += 1
    for fr in enc.flush():
        g.write_frame(fr.bitstream, fr.slice_type == "I",
                      pts=fr.disp, dts=n)
        n += 1
    g.close()
    # index + side files exist; 2 IDR segments at keyint 4
    idx = gop.read_text().splitlines()
    assert idx[0].startswith("#options")
    assert idx[1].startswith("#headers")
    segs = [l for l in idx if l.endswith(".hevc-gop-data")]
    assert len(segs) == 2
    assert (tmp_path / "seg.options").exists()
    opts = (tmp_path / "seg.options").read_text()
    assert "source-width 64" in opts
    # reassembled stream decodes bit-exact
    stream = read_gop_stream(str(gop))
    pics = Decoder().decode(stream)
    assert len(pics) == 8
    for pc in pics:
        assert pc.md5 == pc.sei_md5


def test_reconplay_pipes_y4m(tmp_path):
    from x265_mod_by_patman_tpu.io.reconplay import ReconPlay
    sink = tmp_path / "sink.y4m"
    rp = ReconPlay(f"{sys.executable} -c "
                   "\"import sys,shutil;"
                   "shutil.copyfileobj(sys.stdin.buffer,"
                   f"open(r'{sink}','wb'))\"", 64, 48, 25, 1)
    frames = _frames(3)
    # decode order 0,2,1 -> display order must come out 0,1,2
    rp.write_picture(0, frames[0])
    rp.write_picture(2, frames[2])
    rp.write_picture(1, frames[1])
    rp.close()
    data = sink.read_bytes()
    assert data.startswith(b"YUV4MPEG2 W64 H48")
    assert data.count(b"FRAME\n") == 3
    body = data.split(b"\n", 1)[1]
    first = body.split(b"FRAME\n")[1][:64 * 48]
    assert first == frames[0][0].tobytes()


def test_vmaf_gate():
    from x265_mod_by_patman_tpu.utils.vmaf import (
        vmaf_available, compute_vmaf)
    frames = _frames(2)
    if vmaf_available():
        score = compute_vmaf(frames, frames, 64, 48)
        assert score > 90          # identical planes
    else:
        with pytest.raises(RuntimeError, match="vmaf"):
            compute_vmaf(frames, frames, 64, 48)


def test_script_input_gating(tmp_path):
    from x265_mod_by_patman_tpu.io.y4m import open_input
    vpy = tmp_path / "in.vpy"
    vpy.write_text("clip = None\n")
    try:
        import vapoursynth  # noqa: F401
        has_vs = True
    except ImportError:
        has_vs = False
    if not has_vs:
        with pytest.raises(RuntimeError, match="VapourSynth"):
            open_input(str(vpy))
    avs = tmp_path / "in.avs"
    avs.write_text("Version()\n")
    with pytest.raises(RuntimeError, match="AviSynth|frame serving"):
        open_input(str(avs))


def test_cli_x265_style_flags(tmp_path):
    """x265-style '--key value' / '--no-key' flags route through the
    param parser (x265cli long-option table analog)."""
    import subprocess
    import sys
    clip = tmp_path / "in.y4m"
    rng = np.random.default_rng(1)
    with open(clip, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H48 F25:1 Ip A1:1 C420\n")
        for _ in range(2):
            f.write(b"FRAME\n")
            f.write(rng.integers(0, 255, 64 * 48, dtype=np.uint8)
                    .tobytes())
            f.write(np.full(2 * 24 * 32, 128, np.uint8).tobytes())
    out = tmp_path / "o.hevc"
    r = subprocess.run(
        [sys.executable, "-m", "x265_mod_by_patman_tpu.cli",
         "--input", str(clip), "-o", str(out), "--frames", "2",
         "--no-progress", "--bframes", "0", "--ref", "2",
         "--no-sao", "--qp", "33", "--keyint", "250"],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": os.getcwd(),
             "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-800:]
    assert out.stat().st_size > 0
    pics = Decoder().decode(out.read_bytes())
    assert len(pics) == 2
