"""Rate-distortion optimized quantization, batched for the TPU.

Analog of the reference RDOQ (common/quant.cpp rdoQuant:610 and the
nonPsyRdoQuant primitives, dct.cpp:988): instead of the reference's
serial per-coefficient walk with live CABAC-state bit estimates, every
coefficient of every TU in the batch decides among {ceil, floor, zero}
candidate levels simultaneously under a static fractional-bit model,
followed by a vectorized per-CG zero-out pass (the reference's
"cost of coding this 4x4 group at all" test).

Working domain: "level units".  quant_dyn computes
    level = round(|c| * quantScale / 2^qbits)
so c_scaled = |c| * quantScale / 2^qbits is the ideal real-valued level.
Distortion of choosing integer L is (c_scaled - L)^2 * step^2 in pixel
units with step = 2^((qp-4)/6); with lambda2 = 0.85 * 2^((qp-12)/3)
(the SSE lambda, reference x265_lambda2_tab) the bit weight in level
units is qp-INDEPENDENT:

    K = lambda2 / step^2 = 0.85 * 2^(-8/3) ~= 0.134

(the HEVC lambda schedule tracks the quantizer step energy exactly).
Consistency check: with the bit model below this places the level-0/1
decision at c_scaled ~ 0.67, the reference's intra deadzone (171/512);
the inter K uses the inter deadzone's implied weight the same way.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .transform import (
    MAX_TR_DYNAMIC_RANGE, QUANT_SCALES, QUANT_SHIFT)

# static fractional-bit estimates (post-adaptation CABAC averages):
# sig=0 / sig=1, gt1=0 / gt1=1, gt2=0 / gt2=1, sign (bypass)
_SIG0, _SIG1 = 0.55, 1.45
_GT1_0, _GT1_1 = 0.6, 1.5
_GT2_0, _GT2_1 = 0.7, 1.4
_SIGN = 1.0
_CG_FLAG = 1.0                      # coded_sub_block_flag saving


def _level_bits(lv: jnp.ndarray) -> jnp.ndarray:
    """Approximate bits to code absolute level lv >= 0 (float)."""
    lv = lv.astype(jnp.float32)
    rem = jnp.maximum(lv - 3.0, 0.0)
    # EG0-ish remaining-level length: 2*floor(log2(rem+1)) + 1
    rem_bits = 2.0 * jnp.floor(jnp.log2(rem + 1.0)) + 1.0
    b = jnp.where(
        lv == 0, _SIG0,
        _SIG1 + _SIGN + jnp.where(
            lv == 1, _GT1_0,
            _GT1_1 + jnp.where(lv == 2, _GT2_0, _GT2_1 + rem_bits)))
    return b


def rdoq_levels(coef: jnp.ndarray, intra_mask: jnp.ndarray, qp,
                log2_size: int, bit_depth: int = 8) -> jnp.ndarray:
    """RD-quantize a batch of TUs.  coef: (B, n, n) int32 transform
    output; qp scalar or (B,); returns signed levels (B, n, n) int32,
    drop-in for quant_dyn (transform.py) when rdoq_level > 0."""
    qp = jnp.asarray(qp, jnp.int32)
    if qp.ndim == 0:
        qp = jnp.broadcast_to(qp, coef.shape[:1])
    per, rem6 = qp // 6, qp % 6
    transform_shift = MAX_TR_DYNAMIC_RANGE - bit_depth - log2_size
    qbits = (QUANT_SHIFT + per + transform_shift)[:, None, None]
    scale = jnp.asarray(QUANT_SCALES)[rem6][:, None, None]
    c = coef.astype(jnp.int32)
    # ideal real-valued level, in level units
    cs = jnp.abs(c).astype(jnp.float32) * scale.astype(jnp.float32) \
        / jnp.exp2(qbits.astype(jnp.float32))
    if intra_mask is None:
        k = jnp.full(coef.shape[:1], 0.134, jnp.float32)
    else:
        k = jnp.where(jnp.asarray(intra_mask), 0.134, 0.26) \
            .astype(jnp.float32)
    k = k[:, None, None]

    hi = jnp.ceil(cs)
    lo = jnp.floor(cs)

    def cost(lv):
        return (cs - lv) ** 2 + k * _level_bits(lv)

    zero = jnp.zeros_like(cs)
    c_hi, c_lo, c_z = cost(hi), cost(lo), cost(zero)
    lv = jnp.where(c_hi < c_lo, hi, lo)
    cbest = jnp.minimum(c_hi, c_lo)
    lv = jnp.where(c_z <= cbest, zero, lv)
    cbest = jnp.minimum(c_z, cbest)

    # per-CG zero-out: zeroing a whole 4x4 group drops all its sig bits
    # and the coded_sub_block_flag (reference rdoQuant group loop)
    n = 1 << log2_size
    if n > 4:
        g = n // 4
        cb = cbest.reshape(-1, g, 4, g, 4)
        czb = (cs ** 2).reshape(-1, g, 4, g, 4)
        keep = cb.sum(axis=(2, 4))
        kill = czb.sum(axis=(2, 4)) - k[:, 0, 0][:, None, None] * _CG_FLAG
        zero_cg = (kill < keep)[:, :, None, :, None]
        lv = jnp.where(zero_cg, 0.0, lv.reshape(-1, g, 4, g, 4)) \
            .reshape(-1, n, n)

    lv = jnp.clip(lv, 0, 32767).astype(jnp.int32)
    return jnp.sign(c) * lv
