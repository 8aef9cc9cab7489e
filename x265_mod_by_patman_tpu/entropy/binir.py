"""Bin-stream intermediate representation (IR).

The framework's entropy phase 1 output: a flat stream of (bin, ctx) pairs
where ctx is a context index into the slice context array, CTX_BYPASS for
equiprobable bins, CTX_TERM for terminate bins.  Phase 2 (the native C
engine / CabacEncoder) turns the IR into bytes.

Backed by preallocated numpy buffers so the native residual kernel can
append in place with zero copies (the Python syntax walker writes its
comparatively few CU-level bins via cbin()).
"""
from __future__ import annotations

import numpy as np

from .cabac import CTX_BYPASS, CTX_TERM


class BinIR:
    """Growable bin-stream builder over numpy storage."""

    __slots__ = ("_bins", "_ctx", "n")

    def __init__(self, capacity: int = 1 << 16) -> None:
        self._bins = np.empty(capacity, dtype=np.uint8)
        self._ctx = np.empty(capacity, dtype=np.int32)
        self.n = 0

    def ensure(self, extra: int) -> None:
        need = self.n + extra
        cap = len(self._bins)
        if need <= cap:
            return
        while cap < need:
            cap *= 2
        nb = np.empty(cap, dtype=np.uint8)
        nc = np.empty(cap, dtype=np.int32)
        nb[:self.n] = self._bins[:self.n]
        nc[:self.n] = self._ctx[:self.n]
        self._bins, self._ctx = nb, nc

    def cbin(self, b: int, ctx: int) -> None:
        self.ensure(1)
        self._bins[self.n] = 1 if b else 0
        self._ctx[self.n] = ctx
        self.n += 1

    def bypass(self, b: int) -> None:
        self.cbin(b, CTX_BYPASS)

    def bypass_bits(self, value: int, n: int) -> None:
        """n bits of value, MSB first, all bypass."""
        self.ensure(n)
        for k in range(n - 1, -1, -1):
            self._bins[self.n] = (value >> k) & 1
            self._ctx[self.n] = CTX_BYPASS
            self.n += 1

    def term(self, b: int) -> None:
        self.cbin(b, CTX_TERM)

    def extend(self, other: "BinIR") -> None:
        self.ensure(other.n)
        self._bins[self.n:self.n + other.n] = other._bins[:other.n]
        self._ctx[self.n:self.n + other.n] = other._ctx[:other.n]
        self.n += other.n

    def extend_arrays(self, bins: np.ndarray, ctx: np.ndarray) -> None:
        k = len(bins)
        self.ensure(k)
        self._bins[self.n:self.n + k] = bins
        self._ctx[self.n:self.n + k] = ctx
        self.n += k

    # pointers for the native kernel to append in place (call ensure first)
    def tail_ptrs(self):
        return (self._bins[self.n:], self._ctx[self.n:])

    @property
    def bins(self):
        return self._bins[:self.n].tolist()

    @property
    def ctx(self):
        return self._ctx[:self.n].tolist()

    def __len__(self) -> int:
        return self.n

    def arrays(self):
        return (self._bins[:self.n], self._ctx[:self.n])
