"""Merge and AMVP candidate derivation (spec 8.5.3.2.3-8.5.3.2.7).

Analog of the reference's CUData::getInterMergeCandidates / getPMV
(x265 source/common/cudata.cpp), shared verbatim by the encoder's entropy
stage and the validation decoder so both sides derive identical lists.

v1 scope: P slices, single reference (no temporal MVP, no scaling — with
one ref picture all candidates are same-ref by construction).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..frame.zscan import zscan_scalar


class InterMaps:
    """4x4-minblock motion state built progressively in coding order
    (the inter half of the reference's CUData SoA arrays)."""

    def __init__(self, width: int, height: int, log2_ctu: int) -> None:
        self.w = width
        self.h = height
        self.log2_ctu = log2_ctu
        self.w_ctus = -(-width // (1 << log2_ctu))
        w4 = -(-width // 4)
        h4 = -(-height // 4)
        self.inter = np.zeros((h4, w4), dtype=bool)
        self.coded = np.zeros((h4, w4), dtype=bool)
        self.skip = np.zeros((h4, w4), dtype=bool)
        self.mv = np.zeros((h4, w4, 2), dtype=np.int32)
        self.ref = np.full((h4, w4), -1, dtype=np.int8)

    def set_cu(self, x0: int, y0: int, log2_size: int, is_inter: bool,
               mv=(0, 0), ref: int = -1, skip: bool = False) -> None:
        n4 = 1 << (log2_size - 2)
        ys = slice(y0 >> 2, (y0 >> 2) + n4)
        xs = slice(x0 >> 2, (x0 >> 2) + n4)
        self.coded[ys, xs] = True
        self.inter[ys, xs] = is_inter
        self.skip[ys, xs] = skip
        if is_inter:
            self.mv[ys, xs] = mv
            self.ref[ys, xs] = ref

    def _avail(self, x: int, y: int, z0: int) -> bool:
        if x < 0 or y < 0 or x >= self.w or y >= self.h:
            return False
        if not self.coded[y >> 2, x >> 2]:
            return False
        return zscan_scalar(x, y, self.log2_ctu, self.w_ctus) < z0

    def motion_at(self, x: int, y: int, z0: int):
        """(mvx, mvy, ref) of the inter PU covering luma sample (x, y), or
        None if unavailable/intra."""
        if not self._avail(x, y, z0):
            return None
        if not self.inter[y >> 2, x >> 2]:
            return None
        return (int(self.mv[y >> 2, x >> 2, 0]),
                int(self.mv[y >> 2, x >> 2, 1]),
                int(self.ref[y >> 2, x >> 2]))

    def skip_at(self, x: int, y: int) -> bool:
        if x < 0 or y < 0 or x >= self.w or y >= self.h:
            return False
        return bool(self.coded[y >> 2, x >> 2] and self.skip[y >> 2, x >> 2])


def merge_candidates(maps: InterMaps, x0: int, y0: int, nbs: int,
                     z0: int, max_cands: int = 3,
                     num_refs: int = 1) -> List[Tuple[int, int, int]]:
    """Spatial merge candidate list for a 2Nx2N PU (spec 8.5.3.2.3);
    temporal candidate omitted (slice_temporal_mvp off).  Zero-filled to
    max_cands."""
    a1 = maps.motion_at(x0 - 1, y0 + nbs - 1, z0)
    b1 = maps.motion_at(x0 + nbs - 1, y0 - 1, z0)
    b0 = maps.motion_at(x0 + nbs, y0 - 1, z0)
    a0 = maps.motion_at(x0 - 1, y0 + nbs, z0)
    cands: List[Tuple[int, int, int]] = []
    if a1 is not None:
        cands.append(a1)
    if b1 is not None and b1 != a1:
        cands.append(b1)
    if b0 is not None and b0 != b1:
        cands.append(b0)
    if a0 is not None and a0 != a1:
        cands.append(a0)
    if len(cands) < 4:
        b2 = maps.motion_at(x0 - 1, y0 - 1, z0)
        if b2 is not None and b2 != a1 and b2 != b1:
            cands.append(b2)
    # zero candidates with increasing ref idx (spec 8.5.3.2.4)
    zero_ref = 0
    while len(cands) < max_cands:
        cands.append((0, 0, min(zero_ref, num_refs - 1)))
        zero_ref += 1
    return cands[:max_cands]


def amvp_candidates(maps: InterMaps, x0: int, y0: int, nbs: int,
                    z0: int, ref_idx: int = 0) -> List[Tuple[int, int]]:
    """AMVP list (2 entries) for single-ref P slices (spec 8.5.3.2.6
    simplified: one ref picture -> every neighbor is same-ref, no
    scaling)."""
    a = None
    for (nx, ny) in ((x0 - 1, y0 + nbs), (x0 - 1, y0 + nbs - 1)):
        m = maps.motion_at(nx, ny, z0)
        if m is not None:
            a = (m[0], m[1])
            break
    b = None
    for (nx, ny) in ((x0 + nbs, y0 - 1), (x0 + nbs - 1, y0 - 1),
                     (x0 - 1, y0 - 1)):
        m = maps.motion_at(nx, ny, z0)
        if m is not None:
            b = (m[0], m[1])
            break
    cands: List[Tuple[int, int]] = []
    if a is not None:
        cands.append(a)
    if b is not None and b != a:
        cands.append(b)
    while len(cands) < 2:
        cands.append((0, 0))
    return cands[:2]


def mvd_bits(mvd_x: int, mvd_y: int) -> int:
    """Exact mvd_coding bin count (for encoder mvp_idx selection)."""
    bits = 0
    for v in (abs(mvd_x), abs(mvd_y)):
        bits += 1                      # greater0
        if v > 0:
            bits += 1                  # greater1
            if v > 1:
                # EG1 of v-2
                k = (v - 2) >> 1
                bits += 2 * ((k + 1).bit_length() - 1) + 1 + 1
            bits += 1                  # sign
    return bits
