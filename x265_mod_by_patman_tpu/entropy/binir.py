"""Bin-stream intermediate representation (IR).

The framework's entropy phase 1 output: a flat stream of (bin, ctx) pairs
where ctx is a context index into the slice context array, CTX_BYPASS for
equiprobable bins, CTX_TERM for terminate bins.  Phase 2 (CabacEncoder /
the native engine) turns the IR into bytes.

This split is the TPU-first restructuring of the reference's interleaved
syntax+arithmetic Entropy class (x265 source/encoder/entropy.cpp): IR
generation is batchable/vectorizable; only the tiny low/range recursion is
sequential.
"""
from __future__ import annotations

import numpy as np

from .cabac import CTX_BYPASS, CTX_TERM


class BinIR:
    """Growable bin-stream builder."""

    __slots__ = ("bins", "ctx")

    def __init__(self) -> None:
        self.bins: list = []
        self.ctx: list = []

    def cbin(self, b: int, ctx: int) -> None:
        self.bins.append(1 if b else 0)
        self.ctx.append(ctx)

    def bypass(self, b: int) -> None:
        self.bins.append(1 if b else 0)
        self.ctx.append(CTX_BYPASS)

    def bypass_bits(self, value: int, n: int) -> None:
        """n bits of value, MSB first, all bypass."""
        for k in range(n - 1, -1, -1):
            self.bypass((value >> k) & 1)

    def term(self, b: int) -> None:
        self.bins.append(1 if b else 0)
        self.ctx.append(CTX_TERM)

    def extend(self, other: "BinIR") -> None:
        self.bins.extend(other.bins)
        self.ctx.extend(other.ctx)

    def extend_arrays(self, bins: np.ndarray, ctx: np.ndarray) -> None:
        self.bins.extend(bins.tolist())
        self.ctx.extend(ctx.tolist())

    def __len__(self) -> int:
        return len(self.bins)

    def arrays(self):
        return (np.asarray(self.bins, dtype=np.uint8),
                np.asarray(self.ctx, dtype=np.int32))
