"""Rate control: CQP / CRF / single-pass ABR.

Analog of the reference's RateControl (x265 source/encoder/ratecontrol.cpp
rateEstimateQscale:2101 + ABR feedback tuneAbrQScaleFromFeedback:2036),
reduced to the lookahead-free core: a complexity-power law maps frame
complexity to qscale, with an online bits-model estimate and an
ABR overflow feedback loop.  VBV and 2-pass land in later rounds.

qscale convention matches x265: qscale = 0.85 * 2^((qp-12)/6).
"""
from __future__ import annotations

import math
from dataclasses import dataclass


def qp_to_qscale(qp: float) -> float:
    return 0.85 * (2.0 ** ((qp - 12.0) / 6.0))


def qscale_to_qp(qs: float) -> float:
    return 12.0 + 6.0 * math.log2(max(qs, 1e-6) / 0.85)


QCOMPRESS = 0.6
QP_STEP = 4.0                    # max per-frame QP swing
TYPE_OFFSET = {"I": -3.0, "P": 0.0, "B": 2.0}


@dataclass
class FrameStats:
    ftype: str
    qp: float
    bits: int
    complexity: float


class RateControl:
    """One instance per encode (reference RateControl per Encoder)."""

    def __init__(self, mode: str, qp: int, crf: float, bitrate_kbps: int,
                 fps: float, width: int, height: int,
                 qp_min: int = 0, qp_max: int = 51) -> None:
        self.mode = mode
        self.base_qp = qp
        self.crf = crf
        self.fps = max(fps, 1e-3)
        self.target_bpf = bitrate_kbps * 1000.0 / self.fps
        self.qp_min, self.qp_max = qp_min, qp_max
        self.npix = width * height
        # online bits model: bits ~= coef * complexity^(1-qcompress) / qscale
        self.coef = 1.0
        self.coef_weight = 0.1
        self.total_bits = 0.0
        self.wanted_bits = 0.0
        self.frames = 0
        # ABR cold start: bpp-derived initial QP (reference ABR_INIT_QP,
        # ratecontrol.cpp) instead of the CQP base
        if mode == "abr" and self.target_bpf > 0:
            bpp = self.target_bpf / max(self.npix, 1)
            self.base_qp = int(min(max(
                round(24 - 6 * math.log2(max(bpp, 1e-4) / 0.1)),
                qp_min), qp_max))
        self.last_qscale = qp_to_qscale(self.base_qp)
        # CRF anchoring: complexity that maps to exactly `crf`
        self.crf_cplx0 = 0.04 * self.npix    # nominal per-pixel complexity

    # -- per-frame decision ----------------------------------------------------
    def frame_qp(self, ftype: str, complexity: float) -> int:
        if self.mode == "cqp":
            q = self.base_qp + TYPE_OFFSET[ftype]
            return int(min(max(round(q), self.qp_min), self.qp_max))
        cplx = max(complexity, 1.0) ** (1.0 - QCOMPRESS)
        if self.mode == "crf":
            base = qp_to_qscale(self.crf)
            ref = max(self.crf_cplx0, 1.0) ** (1.0 - QCOMPRESS)
            qs = base * cplx / ref
        else:                                   # abr
            if self.frames == 0:
                qs = qp_to_qscale(self.base_qp)
            else:
                coef = self.coef / self.coef_weight
                qs = coef * cplx / self.target_bpf
                # overflow compensation vs the ideal bit trajectory
                buffer_bits = max(self.target_bpf * self.fps, 1.0)  # ~1s
                overflow = 1.0 + (self.total_bits - self.wanted_bits) \
                    / buffer_bits
                qs *= min(max(overflow, 0.5), 2.0)
        # frame-type modulation + swing clamp (free swing while the bits
        # model is still cold)
        qp = qscale_to_qp(qs) + TYPE_OFFSET[ftype]
        last_qp = qscale_to_qp(self.last_qscale)
        if self.frames >= 3:
            qp = min(max(qp, last_qp - QP_STEP), last_qp + QP_STEP)
        qp = min(max(qp, self.qp_min), self.qp_max)
        return int(round(qp))

    # -- feedback ----------------------------------------------------------------
    def update(self, ftype: str, qp: int, bits: int,
               complexity: float) -> None:
        qs = qp_to_qscale(qp - TYPE_OFFSET[ftype])   # normalize to P scale
        cplx = max(complexity, 1.0) ** (1.0 - QCOMPRESS)
        # EMA of the bits model coefficient (x265 cplxrSum analog)
        self.coef *= 0.9
        self.coef_weight *= 0.9
        self.coef += bits * qs / cplx
        self.coef_weight += 1.0
        self.total_bits += bits
        self.wanted_bits += self.target_bpf
        self.frames += 1
        if ftype != "B":                              # anchors steer qscale
            self.last_qscale = qs


def _lowres8(y: "np.ndarray") -> "np.ndarray":
    import numpy as np
    h, w = y.shape
    h8, w8 = h // 8, w // 8
    return y[:h8 * 8, :w8 * 8].astype(np.int32) \
        .reshape(h8, 8, w8, 8).mean(axis=(1, 3))


def frame_complexity(y: "np.ndarray", prev_y=None) -> float:
    """Cheap pre-analysis complexity (lookahead stand-in): 1/8-res
    motion-searched SAD vs the previous source (global ±2 lowres search —
    the coarse tier of the reference's lowres costEst, slicetype.cpp), or
    spatial gradient energy for the first/intra case."""
    import numpy as np
    if prev_y is not None:
        a = _lowres8(y)
        b = _lowres8(prev_y)
        h8, w8 = a.shape
        best = None
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                aa = a[max(dy, 0):h8 + min(dy, 0),
                       max(dx, 0):w8 + min(dx, 0)]
                bb = b[max(-dy, 0):h8 + min(-dy, 0),
                       max(-dx, 0):w8 + min(-dx, 0)]
                sad = float(np.abs(aa - bb).mean())
                if best is None or sad < best:
                    best = sad
        return best * y.size / 16.0
    yv = y.astype(np.int32)
    gx = np.abs(np.diff(yv, axis=1)).mean()
    gy = np.abs(np.diff(yv, axis=0)).mean()
    return float(gx + gy) * y.size / 32.0
