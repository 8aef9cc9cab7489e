"""Per-context-family CABAC bit attribution of HEVC streams.

The round-3 diagnosis machinery (BENCH_NOTES.md §round-3-session-3),
checked in: decode any conformant stream (ours or the x265 anchor's)
with the in-repo conformance decoder, accumulating the fractional-bit
cost of every context-coded bin per context FAMILY (entropy/contexts.py
OFF ranges, eb = ENTROPY_BITS[state ^ bin] / 32768) plus bypass bins
(1.0 bit each), split by slice type.  Comparing the two encoders'
tables ranks WHERE the BD-rate gap lives (residual volume vs mvd
syntax vs mode bins ...) without guessing from totals.

Usage:
  python tools/bit_attrib.py ours.hevc [x265.hevc]

One JSON line per stream: {"slice_bits": {I/P/B: vcl_kbit},
"families": {fam: {I,P,B bits}}, ...}; with two streams a sorted
delta table (ours - anchor) is printed after.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x265_mod_by_patman_tpu.entropy import cabac as _cab
from x265_mod_by_patman_tpu.entropy.contexts import OFF, NUM_CONTEXTS
from x265_mod_by_patman_tpu.constants.hevc_tables import ENTROPY_BITS
from x265_mod_by_patman_tpu.decoder import decoder as _dec

# context index -> family name
_FAM = [None] * NUM_CONTEXTS
for _name, _off in sorted(OFF.items(), key=lambda kv: kv[1]):
    for _i in range(_off, NUM_CONTEXTS):
        _FAM[_i] = _name

# luma/chroma split points within the coefficient families (context
# layout per contexts.py: luma contexts first, chroma after)
_SPLIT = {"SIG": 27, "ONE": 16, "ABS": 4, "LAST_X": 15, "LAST_Y": 15,
          "SIG_CG": 2}
for _name, _n in _SPLIT.items():
    _off = OFF[_name]
    _end = min((o for o in OFF.values() if o > _off),
               default=NUM_CONTEXTS)
    for _i in range(_off, _end if _end > _off else NUM_CONTEXTS):
        if _FAM[_i] == _name:
            _FAM[_i] = _name + ("_L" if _i - _off < _n else "_C")


class _Rec:
    __slots__ = ("stype", "fam", "bypass", "nbins", "ones")

    def __init__(self, stype: int) -> None:
        self.stype = stype                 # 0=B 1=P 2=I
        self.fam = {}                      # family -> 1/32768-bit units
        self.bypass = 0
        self.nbins = {}
        self.ones = {}


def attribute(stream: bytes):
    """Decode `stream`, returning (records, pictures)."""
    recs: list = []

    class InstrCabac(_cab.CabacDecoder):
        def decode_bin(self, states, c):
            s = int(states[c])
            b = super().decode_bin(states, c)
            r = recs[-1]
            f = _FAM[c]
            r.fam[f] = r.fam.get(f, 0) + int(ENTROPY_BITS[s ^ b])
            r.nbins[f] = r.nbins.get(f, 0) + 1
            r.ones[f] = r.ones.get(f, 0) + b
            return b

        def decode_bin_ep(self):
            recs[-1].bypass += 1
            return super().decode_bin_ep()

    real_syn = _dec.SliceSyntaxDecoder
    real_cab = _dec.CabacDecoder

    def syn_hook(dec, states, sps, pps, qp, slice_type, *a, **kw):
        recs.append(_Rec(slice_type))
        return real_syn(dec, states, sps, pps, qp, slice_type, *a, **kw)

    _dec.CabacDecoder = InstrCabac
    _dec.SliceSyntaxDecoder = syn_hook
    try:
        pics = _dec.Decoder().decode(stream)
    finally:
        _dec.CabacDecoder = real_cab
        _dec.SliceSyntaxDecoder = real_syn
    return recs, pics


def summarize(recs) -> dict:
    tnames = {0: "B", 1: "P", 2: "I"}
    fams: dict = {}
    byp = {"I": 0.0, "P": 0.0, "B": 0.0}
    nsl = {"I": 0, "P": 0, "B": 0}
    cnt: dict = {}
    for r in recs:
        t = tnames[r.stype]
        nsl[t] += 1
        byp[t] += r.bypass
        for f, v in r.fam.items():
            fams.setdefault(f, {"I": 0.0, "P": 0.0, "B": 0.0})
            fams[f][t] += v / 32768.0
            cnt.setdefault(f, {})
            n1, n0 = cnt[f].get(t, (0, 0))
            cnt[f][t] = (n1 + r.ones.get(f, 0),
                         n0 + r.nbins.get(f, 0))
    for f in fams:
        for t in fams[f]:
            fams[f][t] = round(fams[f][t], 1)
    counts = {f: {t: f"{v[0]}/{v[1]}" for t, v in d.items()}
              for f, d in cnt.items()}
    return {"slices": nsl, "bypass": byp, "families": fams,
            "counts": counts}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("streams", nargs="+")
    ap.add_argument("--json-out", default="")
    a = ap.parse_args()
    outs = []
    for path in a.streams:
        recs, pics = attribute(open(path, "rb").read())
        s = summarize(recs)
        s["stream"] = os.path.basename(path)
        s["pictures"] = len(pics)
        outs.append(s)
        print(json.dumps(s), flush=True)
    if len(outs) == 2:
        o, x = outs
        rows = []
        for t in ("I", "P", "B"):
            rows.append((f"bypass/{t}",
                         o["bypass"][t] - x["bypass"][t]))
        for f in set(o["families"]) | set(x["families"]):
            for t in ("I", "P", "B"):
                d = o["families"].get(f, {}).get(t, 0.0) - \
                    x["families"].get(f, {}).get(t, 0.0)
                if abs(d) >= 1.0:
                    rows.append((f"{f}/{t}", d))
        rows.sort(key=lambda r: -abs(r[1]))
        print("\n# delta (ours - anchor), bits, largest first")
        for name, d in rows[:30]:
            print(f"{name:>16}  {d:+10.0f}")
    if a.json_out:
        json.dump(outs, open(a.json_out, "w"))


if __name__ == "__main__":
    main()
