"""Pallas TPU kernel: per-block window gather (HBM -> VMEM DMA).

XLA lowers the per-block arbitrary-position window reads of the MC /
ME paths (interp._gather_windows) to general gathers, which dominate
P/B analysis time on TPU.  This kernel replaces them with one sliced
DMA per block: the (start_y, start_x) arrays ride scalar prefetch so
each program issues ref[ys:ys+S, xs:xs+S] -> VMEM directly — the DMA
engine does arbitrary-offset 2D copies natively.

Edge handling: the caller passes an edge-replicated, margin-padded
plane (jnp.pad mode='edge'), which makes per-coordinate clamping and
offset arithmetic identical for every |MV| within the margin — the
gather is bit-exact with the clamped XLA path for all MVs the encoder
can produce.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MARGIN = 48          # covers search range + subpel + candidate spread


XFETCH = 256


def _gather_kernel(ys_ref, xs_ref, ref_hbm, out_ref, scratch, sem, *,
                   size: int, sy: int):
    """Mosaic DMA slices must be (8, 128)-tile aligned in both start
    and shape: fetch the aligned superset into scratch, then apply the
    sub-tile residues with a dynamic SUBLANE slice (legal) and a
    dynamic lane ROTATE (tpu.DynamicRotate) + static crop."""
    i = pl.program_id(0)
    y = ys_ref[i]
    x = xs_ref[i]
    y8 = pl.multiple_of((y // 8) * 8, 8)
    x128 = jnp.minimum((x // 128) * 128, ref_hbm.shape[1] - XFETCH)
    x128 = pl.multiple_of(x128, 128)
    dma = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(y8, sy + 8), pl.ds(x128, XFETCH)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    # both residues applied as dynamic rotates (tpu.DynamicRotate) +
    # static crops: unaligned dynamic slices are illegal in VMEM too
    rows = pltpu.roll(scratch[:], -(y - y8), axis=0)[:sy]
    rolled = pltpu.roll(rows, -(x - x128), axis=1)
    out_ref[0] = rolled[:, :size]


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def window_gather(ref_padded: jnp.ndarray, ys: jnp.ndarray,
                  xs: jnp.ndarray, size: int,
                  interpret: bool = False) -> jnp.ndarray:
    """ref_padded: (H, W) int32 (already margin-padded); ys/xs: (B,)
    int32 window starts IN PADDED coordinates.  Returns (B, size, size)."""
    b = ys.shape[0]
    h, w = ref_padded.shape
    # DMA slice sizes must respect the sublane tiling (8); fetch the
    # rounded-up window and crop after
    sy = ((size + 7) // 8) * 8
    ys = jnp.clip(ys, 0, h - sy - 8).astype(jnp.int32)
    xs = jnp.clip(xs, 0, w - size).astype(jnp.int32)
    assert w >= XFETCH, "pad_plane guarantees >= XFETCH lanes"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, sy, size),
                               lambda i, ys_, xs_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((sy + 8, XFETCH), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, size=size, sy=sy),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, sy, size), jnp.int32),
        interpret=interpret,
    )(ys, xs, ref_padded)
    return out[:, :size]


@functools.partial(jax.jit, static_argnames=())
def pad_plane(ref: jnp.ndarray) -> jnp.ndarray:
    """Edge-replicated margin padding (PicYuv border extension analog);
    guarantees at least XFETCH lanes for the aligned DMA fetches.

    The padded width MUST be a multiple of 128: _gather_kernel clamps
    the DMA start to ``w - XFETCH`` and annotates it multiple_of(128).
    With an unaligned width that annotation is false on real hardware
    (interpret mode doesn't check it) and every right-edge window comes
    back garbage — at 1080p (2016-wide padded luma) this corrupted MC
    for the last ~160 columns of every inter frame and tripled P/B
    bits; 416p escaped only because its padded width (512) is aligned.
    """
    h, w = ref.shape
    right = max(MARGIN, XFETCH - (w + MARGIN))
    right += -(w + MARGIN + right) % 128
    return jnp.pad(ref.astype(jnp.int32),
                   ((MARGIN, MARGIN), (MARGIN, right)), mode="edge")
