"""CI encode-validation driver (the reference CI's validate_encode
analog, .github/workflows/ci.yml:1196): encode a clip through the CLI
with the given x265-style options, then decode the stream with the
in-repo conformance decoder and require recon + decoded-picture-hash
MD5 equality (the stronger in-repo form of the reference's
ffprobe/ffmpeg round-trip).

Usage:
  python tools/ci_validate.py --make-clip out.y4m [--csp 422] [--depth 10]
  python tools/ci_validate.py --clip in.y4m -- <cli options...>
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_clip(path: str, csp: str, depth: int, n: int = 8,
              w: int = 416, h: int = 240) -> None:
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:h, 0:w]
    cden = {"420": 2, "422": 2, "444": 1}[csp]
    ch = h // (2 if csp == "420" else 1)
    cw = w // cden if csp != "444" else w
    tag = csp if depth == 8 else f"{csp}p{depth}"
    mx = (1 << depth) - 1
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{tag} "
                f"XLENGTH={n}\n".encode())
        for i in range(n):
            y = ((xx + 3 * i) * mx // w + yy * (mx // 3) // h) % (mx + 1)
            y = np.clip(y + rng.integers(-8, 9, (h, w)), 0, mx)
            u = np.full((ch, cw), (mx + 1) // 2 - 8)
            v = np.full((ch, cw), (mx + 1) // 2 + 8)
            dt = "<u2" if depth > 8 else np.uint8
            f.write(b"FRAME\n")
            for pl in (y, u, v):
                f.write(np.ascontiguousarray(pl.astype(dt)).tobytes())


def validate(clip: str, opts: list) -> int:
    from x265_mod_by_patman_tpu.decoder.decoder import Decoder
    from x265_mod_by_patman_tpu.io.y4m import Y4MReader
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "o.hevc")
        rec = os.path.join(td, "r.y4m")
        cmd = [sys.executable, "-m", "x265_mod_by_patman_tpu.cli",
               "--input", clip, "-o", out, "--recon", rec,
               "--no-progress"] + opts
        env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
        r = subprocess.run(cmd, env=env, cwd=td)
        if r.returncode != 0:
            print(f"FAIL encode: {opts}")
            return 1
        pics = Decoder().decode(open(out, "rb").read())
        pics.sort(key=lambda p: p.poc)
        nerr = 0
        for pc, (y, u, v) in zip(pics, Y4MReader(rec)):
            if pc.sei_md5 is not None and pc.md5 != pc.sei_md5:
                nerr += 1
                continue
            a = np.asarray(pc.y)[:y.shape[0], :y.shape[1]]
            if not np.array_equal(a, y):
                nerr += 1
        if nerr:
            print(f"FAIL validate ({nerr} frames): {opts}")
            return 1
        print(f"PASS: {opts} ({len(pics)} frames)")
        return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--make-clip")
    ap.add_argument("--csp", default="420")
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--clip")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()
    if args.make_clip:
        make_clip(args.make_clip, args.csp, args.depth)
        print(f"wrote {args.make_clip}")
        return 0
    assert args.clip, "--clip or --make-clip required"
    return validate(args.clip, list(args.opts))


if __name__ == "__main__":
    sys.exit(main())
