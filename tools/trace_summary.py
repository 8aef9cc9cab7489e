"""Summarize an X265TPU_TRACE chrome-trace JSON into a per-phase table.

Usage: python tools/trace_summary.py /tmp/trace.json [--per-frame N]
Prints total seconds and count per scope name, sorted by total.
"""
import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    nframes = 0
    if "--per-frame" in sys.argv:
        nframes = int(sys.argv[sys.argv.index("--per-frame") + 1])
    with open(path) as f:
        evs = json.load(f)
    if isinstance(evs, dict):
        evs = evs.get("traceEvents", [])
    tot = defaultdict(float)
    cnt = defaultdict(int)
    t0, t1 = float("inf"), 0.0
    for e in evs:
        if e.get("ph") != "X":
            continue
        name = e["name"]
        tot[name] += e["dur"] / 1e6
        cnt[name] += 1
        t0 = min(t0, e["ts"])
        t1 = max(t1, e["ts"] + e["dur"])
    wall = (t1 - t0) / 1e6 if t1 > t0 else 0.0
    print(f"{'scope':<20}{'total_s':>10}{'count':>8}"
          + (f"{'s/frame':>10}" if nframes else ""))
    for name in sorted(tot, key=lambda k: -tot[k]):
        row = f"{name:<20}{tot[name]:>10.2f}{cnt[name]:>8}"
        if nframes:
            row += f"{tot[name] / nframes:>10.2f}"
        print(row)
    print(f"{'WALL':<20}{wall:>10.2f}")
    scoped = sum(v for k, v in tot.items()
                 if k in ("analysis", "wavefront", "loopfilter", "entropy",
                          "recon_fetch", "aq_map", "md5", "weightp",
                          "cutree_push", "cutree_pop", "slicetype_push",
                          "la_ingest_cost", "la_rc_refine", "inter_tu32"))
    print(f"{'scoped(sum)':<20}{scoped:>10.2f}")


if __name__ == "__main__":
    main()
