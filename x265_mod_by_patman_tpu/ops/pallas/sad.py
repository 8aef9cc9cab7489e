"""Pallas TPU kernel: dense SAD search grid (integer full-search ME).

The analog of the reference's largest asm family — SAD/sad_x3/sad_x4
over every candidate MV (primitives.h pu[].sad, common/pixel.cpp;
14.9K lines of ipfilter/SAD x86 asm).  One pallas program per block:
the (n+2r)^2 search window and the n^2 original live in VMEM and the
(2r+1)^2 SADs are produced without ever re-touching HBM — the
VMEM-residency argument that motivates a hand kernel over XLA's
gather-per-candidate lowering.

Enabled in the ME path with X265TPU_PALLAS=1 (bit-exact with the XLA
path: same costs, same first-minimum tie-breaking).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


BPP = 8                       # blocks per program (sublane-aligned)
LANES = 128


def _sad_kernel(win_ref, org_ref, out_ref, *, n: int, c: int):
    """TPU constraint-driven shape: dynamic indices only on sublane
    dims; all lane-dim slices static.  For each vertical offset dy the
    whole (2r+1)-wide SAD row is built as a sum of n statically-shifted
    per-column L1 profiles:
        sad(dx) = sum_j colsum_j[dx + j],
        colsum_j = sum_i |rows[i, :] - org[i, j]|   (a lane vector)."""
    def blk_body(b, _):
        org = org_ref[b]

        def dy_body(dy, _):
            rows = win_ref[b, pl.ds(dy, n), :]     # (n, n+2r)
            row = jnp.zeros((c,), jnp.int32)
            for j in range(n):
                col = jnp.sum(jnp.abs(rows - org[:, j][:, None]),
                              axis=0)              # (n+2r,) lanes
                row = row + col[j:j + c]           # static lane shift
            padded = jnp.concatenate(
                [row, jnp.zeros((LANES - c,), jnp.int32)])[None, :]
            out_ref[b, pl.ds(dy, 1), :] = padded
            return 0

        return jax.lax.fori_loop(0, c, dy_body, 0)

    jax.lax.fori_loop(0, BPP, blk_body, 0)


@functools.partial(jax.jit, static_argnames=("n", "r", "interpret"))
def sad_grid(win: jnp.ndarray, org: jnp.ndarray, n: int, r: int,
             interpret: bool = False) -> jnp.ndarray:
    """win: (B, n+2r, n+2r) int32 search windows; org: (B, n, n) int32.
    Returns (B, (2r+1)^2) int32 SADs, row-major over (dy, dx)."""
    b = win.shape[0]
    c = 2 * r + 1
    bp = ((b + BPP - 1) // BPP) * BPP        # sublane-aligned batch
    if bp != b:
        pad = ((0, bp - b), (0, 0), (0, 0))
        win = jnp.pad(win, pad)
        org = jnp.pad(org, pad)
    out = pl.pallas_call(
        functools.partial(_sad_kernel, n=n, c=c),
        grid=(bp // BPP,),
        in_specs=[
            pl.BlockSpec((BPP, n + 2 * r, n + 2 * r),
                         lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BPP, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BPP, c, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, c, LANES), jnp.int32),
        interpret=interpret,
    )(win, org)
    return out[:b, :, :c].reshape(b, c * c)
