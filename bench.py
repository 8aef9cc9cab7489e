"""Benchmark: intra-only CQP encode throughput (north-star config 1 shape).

Encodes synthetic 416x240 8-bit frames at QP32 intra-only (the
BasketballPass configuration from BASELINE.md) and reports frames/s.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/s", "vs_baseline": ratio}

vs_baseline compares against the reference x265 (CPU, --preset ultrafast
--qp 32 --keyint 1) measured on this host when BASELINE_X265_FPS is set or
a cached measurement exists in baseline_x265.json; 0.0 = baseline not yet
measured.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

# persistent compile cache: the wavefront program compiles once per
# (geometry, qp) per machine, not once per bench run
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_x265tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

W, H, QP, FRAMES = 416, 240, 32, 8


def synth_frames(n, w=W, h=H):
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        y = ((xx + 3 * i) * 255 // w + yy * 80 // h) % 256
        y[h // 4:h // 2, w // 4 + i:w // 2 + i] = 200
        y = np.clip(y + rng.integers(-8, 9, (h, w)), 0, 255).astype(np.uint8)
        u = ((xx[::2, ::2] + 2 * yy[::2, ::2] + i) % 200 + 20).astype(np.uint8)
        v = ((2 * xx[::2, ::2] - yy[::2, ::2] - i) % 180 + 30).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def main():
    from x265_mod_by_patman_tpu.params import default_params
    from x265_mod_by_patman_tpu.encoder.top import Encoder

    frames = synth_frames(FRAMES + 1)
    # ultrafast-equivalent intra config (matches the x265 baseline run:
    # deblock on, SAO off at ultrafast).  Streaming path: the multi-frame
    # batched path (encode_batch) is faster at steady state but its
    # compile does not fit the bench budget on the tunnel-attached chip
    # (compiles are not cross-process cacheable there; see BENCH_NOTES).
    p = default_params(W, H, qp=QP, keyframe_max=1, sao=False)
    enc = Encoder(p)
    enc.encode_intra_pipelined(frames[:1])   # warmup: jit compiles

    # pipelined path: frame k+1's device wavefront is dispatched before
    # frame k's host entropy runs (JAX async dispatch overlap)
    t0 = time.time()
    nbytes = 0
    for out in enc.encode_intra_pipelined(frames[1:]):
        nbytes += len(out.bitstream)
    dt = time.time() - t0
    fps = FRAMES / dt

    baseline = float(os.environ.get("BASELINE_X265_FPS", 0) or 0)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "baseline_x265.json")
    if not baseline and os.path.exists(cache):
        try:
            baseline = float(json.load(open(cache)).get(
                "intra_fps_416x240_qp32", 0))
        except Exception:
            baseline = 0.0
    print(json.dumps({
        "metric": "intra_fps_416x240_qp32",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 4) if baseline else 0.0,
    }))


if __name__ == "__main__":
    main()
