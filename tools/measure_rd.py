"""BD-rate measurement harness (the reference procedure from SURVEY §6:
run both encoders on the same clips, compare (bitrate, PSNR) sweeps).

Usage:
  python tools/measure_rd.py --clip /tmp/bench_416x240.y4m --frames 24 \
      --ours "rd=3 bframes=3 rc_mode=crf" --qps 26,29,32,35 \
      [--x265 /tmp/x265_build/x265 --x265-args "--preset fast"] \
      [--base-json curve.json] [--save-json curve.json]

Outputs one JSON line per encoder with the (kbps, psnr) curve and, when
two curves are present, the BD-rate (piecewise-cubic log-rate
integration, Bjontegaard 2001) of ours vs the anchor.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_y4m(path, max_frames=None):
    raw = open(path, "rb").read()
    nl = raw.index(b"\n")
    hdr = raw[:nl].decode()
    w = h = None
    for tok in hdr.split():
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
    off = nl + 1
    frames = []
    fsz = w * h * 3 // 2
    while off < len(raw):
        assert raw[off:off + 5] == b"FRAME"
        off = raw.index(b"\n", off) + 1
        y = np.frombuffer(raw[off:off + w * h], np.uint8).reshape(h, w)
        u = np.frombuffer(raw[off + w * h:off + w * h + w * h // 4],
                          np.uint8).reshape(h // 2, w // 2)
        v = np.frombuffer(raw[off + w * h + w * h // 4:off + fsz],
                          np.uint8).reshape(h // 2, w // 2)
        frames.append((y, u, v))
        off += fsz
        if max_frames and len(frames) >= max_frames:
            break
    return w, h, frames


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 99.0
    return 10 * np.log10(255.0 ** 2 / mse)


def yuv_psnr(src_frames, rec_frames):
    """x265-convention global PSNR: per-plane PSNR averaged 4:1:1/6."""
    py = np.mean([psnr(s[0], r[0]) for s, r in zip(src_frames, rec_frames)])
    pu = np.mean([psnr(s[1], r[1]) for s, r in zip(src_frames, rec_frames)])
    pv = np.mean([psnr(s[2], r[2]) for s, r in zip(src_frames, rec_frames)])
    return py, pu, pv, (4 * py + pu + pv) / 6.0


def encode_ours(frames, w, h, fps, q, args_str):
    from x265_mod_by_patman_tpu.params import default_params
    from x265_mod_by_patman_tpu.encoder.top import Encoder
    p = default_params(w, h, fps_num=fps, fps_denom=1)
    kv = dict(tok.split("=", 1) for tok in args_str.split() if "=" in tok)
    rc = kv.pop("rc_mode", "cqp")
    for k, v in kv.items():
        p.parse(k, v)
    p.rc_mode = rc
    if rc == "crf":
        p.crf = float(q)
    else:
        p.qp = int(q)
    p.validate()
    enc = Encoder(p)
    t0 = time.time()
    nbits = 0
    recs = []
    for (y, u, v) in frames:
        for f in enc.encode_frame(y, u, v):
            nbits += vcl_bits(f.bitstream)
            recs.append((f.disp, f.recon))
    for f in enc.flush():
        nbits += vcl_bits(f.bitstream)
        recs.append((f.disp, f.recon))
    dt = time.time() - t0
    recs.sort(key=lambda t: t[0])
    kbps = nbits * fps / len(frames) / 1000.0
    # crop the padded coded geometry back to source dims (the
    # conformance window the decoder would apply)
    out = [(r[1][0][:h, :w], r[1][1][:h // 2, :w // 2],
            r[1][2][:h // 2, :w // 2]) for r in recs]
    return kbps, out, dt


def vcl_bits(stream: bytes) -> int:
    """Bits of VCL NALs (incl. their start codes) in an Annex-B chunk.

    BD comparisons must exclude the informational SEIs both encoders
    emit (x265 writes a ~2.3 KB encoder-settings user-data SEI, ours a
    ~1.7 KB analog) — at small test-clip sizes those dominated every
    prior measurement (~10% of a 416p I-frame)."""
    import re
    pos = [m.start() for m in re.finditer(b"\x00\x00\x01", stream)]
    bits = 0
    for i, s in enumerate(pos):
        e = pos[i + 1] if i + 1 < len(pos) else len(stream)
        if ((stream[s + 3] >> 1) & 0x3F) <= 31:
            bits += (e - s) * 8
    return bits


def encode_x265(clip, frames_n, w, h, fps, q, binary, extra):
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "o.hevc")
        rec = os.path.join(td, "r.y4m")
        toks = extra.split()
        use_crf = "--crf" in toks
        toks = [t for t in toks if t != "--crf"]
        cmd = [binary, "--input", clip, "--frames", str(frames_n),
               "-o", out, "--recon", rec] + toks + \
            (["--crf", str(q)] if use_crf else ["--qp", str(q)])
        subprocess.run(cmd, check=True, capture_output=True)
        _, _, recs = read_y4m(rec)
        kbps = vcl_bits(open(out, "rb").read()) * fps / frames_n / 1000.0
        return kbps, recs


def bd_rate(anchor, test):
    """BD-rate % (negative = test saves bits) via cubic-poly fit of
    log-rate over PSNR (Bjontegaard; matches the common implementations).

    anchor/test: lists of (kbps, psnr)."""
    ra = np.log([p[0] for p in anchor])
    pa = np.array([p[1] for p in anchor])
    rt = np.log([p[0] for p in test])
    pt = np.array([p[1] for p in test])
    fa = np.polyfit(pa, ra, min(3, len(ra) - 1))
    ft = np.polyfit(pt, rt, min(3, len(rt) - 1))
    lo = max(pa.min(), pt.min())
    hi = min(pa.max(), pt.max())
    if hi <= lo:
        return float("nan")
    xs = np.linspace(lo, hi, 100)
    ia = np.trapezoid(np.polyval(fa, xs), xs)
    it = np.trapezoid(np.polyval(ft, xs), xs)
    return float((np.exp((it - ia) / (hi - lo)) - 1) * 100)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", required=True)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--fps", type=int, default=25)
    ap.add_argument("--qps", default="26,29,32,35")
    ap.add_argument("--ours", default="")
    ap.add_argument("--x265", default="")
    ap.add_argument("--x265-args", default="--preset fast")
    ap.add_argument("--base-json", default="")
    ap.add_argument("--save-json", default="")
    ap.add_argument("--label", default="ours")
    a = ap.parse_args()

    w, h, frames = read_y4m(a.clip, a.frames)
    qs = [float(q) for q in a.qps.split(",")]
    curve = []
    for q in qs:
        kbps, recs, dt = encode_ours(frames, w, h, a.fps, q, a.ours)
        py, pu, pv, g = yuv_psnr(frames, recs)
        curve.append({"q": q, "kbps": round(kbps, 1),
                      "y_psnr": round(py, 3), "u": round(pu, 2),
                      "v": round(pv, 2), "g": round(g, 3),
                      "enc_s": round(dt, 1)})
        print(json.dumps({"enc": a.label, **curve[-1]}), flush=True)

    anchor = None
    if a.x265:
        anchor = []
        for q in qs:
            kbps, recs = encode_x265(a.clip, len(frames), w, h, a.fps,
                                     int(q), a.x265, a.x265_args)
            py, pu, pv, g = yuv_psnr(frames, recs[:len(frames)])
            anchor.append({"q": q, "kbps": round(kbps, 1),
                           "y_psnr": round(py, 3), "g": round(g, 3)})
            print(json.dumps({"enc": "x265", **anchor[-1]}), flush=True)
    elif a.base_json:
        anchor = json.load(open(a.base_json))

    if a.save_json:
        json.dump(curve, open(a.save_json, "w"))
    if anchor:
        bdy = bd_rate([(p["kbps"], p["y_psnr"]) for p in anchor],
                      [(p["kbps"], p["y_psnr"]) for p in curve])
        bdg = bd_rate([(p["kbps"], p["g"]) for p in anchor],
                      [(p["kbps"], p["g"]) for p in curve])
        print(json.dumps({"bd_rate_y_pct": round(bdy, 2),
                          "bd_rate_global_pct": round(bdg, 2),
                          "negative_means_we_save_bits": True}))


if __name__ == "__main__":
    main()
