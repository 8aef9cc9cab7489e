"""HEVC default scaling lists (spec 7.4.5 tables; reference
common/scalinglist.cpp ScalingList defaults).

Default-matrix mode only ("--scaling-list default"): the SPS signals
scaling_list_enabled with no explicit data, and both quant and dequant
apply the spec default matrices.  m[i] == 16 is the flat (disabled)
behavior; the default lists shape quantization toward low frequencies.
"""
from __future__ import annotations

import functools

import numpy as np

# spec Table 7-5: default 4x4 (flat 16) — sizeId 0
FLAT4 = np.full((4, 4), 16, np.int32)

# spec Table 7-6: default 8x8 intra / inter lists (raster from the
# up-right diagonal coefficient order of the spec text)
_D8_INTRA = np.array([
    [16, 16, 16, 16, 17, 18, 21, 24],
    [16, 16, 16, 16, 17, 19, 22, 25],
    [16, 16, 17, 18, 20, 22, 25, 29],
    [16, 16, 18, 21, 24, 27, 31, 36],
    [17, 17, 20, 24, 30, 35, 41, 47],
    [18, 19, 22, 27, 35, 44, 54, 65],
    [21, 22, 25, 31, 41, 54, 70, 88],
    [24, 25, 29, 36, 47, 65, 88, 115]], np.int32)

_D8_INTER = np.array([
    [16, 16, 16, 16, 17, 18, 20, 24],
    [16, 16, 16, 17, 18, 20, 24, 25],
    [16, 16, 17, 18, 20, 24, 25, 28],
    [16, 17, 18, 20, 24, 25, 28, 33],
    [17, 18, 20, 24, 25, 28, 33, 41],
    [18, 20, 24, 25, 28, 33, 41, 54],
    [20, 24, 25, 28, 33, 41, 54, 71],
    [24, 25, 28, 33, 41, 54, 71, 91]], np.int32)


@functools.lru_cache(maxsize=None)
def default_matrix(log2_size: int, intra: bool) -> np.ndarray:
    """Default scaling matrix for an (n x n) TU (spec 8.6.3: sizes above
    8 upsample the 8x8 list by pixel repetition; DC replaced by the
    signaled/ default DC value 16)."""
    if log2_size == 2:
        return FLAT4.copy()
    base = _D8_INTRA if intra else _D8_INTER
    if log2_size == 3:
        return base.copy()
    rep = 1 << (log2_size - 3)
    m = np.repeat(np.repeat(base, rep, axis=0), rep, axis=1)
    m[0, 0] = 16                     # default dc == 16
    return m
