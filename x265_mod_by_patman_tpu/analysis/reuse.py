"""Analysis save/load: record mode decisions in pass 1, replay them in
later encodes.

Analog of the reference's analysis-save/load files
(encoder/encoder.cpp:4788-6247 writeAnalysisFile/readAnalysisFile and
the ABR-ladder cross-encode reuse): per-frame intra modes, inter masks,
MVs, reference selections and prediction directions are streamed to a
file; a loading encoder skips mode decision and motion search entirely
and only rebuilds the MC predictions for the stored decisions (one
batched gather pass — the expensive searches are gone).
"""
from __future__ import annotations

import pickle
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..ops.interp import mc_batch, mc_batch_14, bi_combine, wp_apply_batch

MAGIC = "x265-tpu-analysis-v1"


class AnalysisStore:
    def __init__(self, path: str) -> None:
        self._fh = open(path, "wb")
        pickle.dump(MAGIC, self._fh)

    def save(self, disp: int, ftype: str, **arrays) -> None:
        rec = {"disp": disp, "ftype": ftype}
        rec.update({k: np.asarray(v) if v is not None else None
                    for k, v in arrays.items()})
        pickle.dump(rec, self._fh)

    def close(self) -> None:
        self._fh.close()


class AnalysisLoad:
    def __init__(self, path: str) -> None:
        self.records = {}
        with open(path, "rb") as fh:
            assert pickle.load(fh) == MAGIC, "bad analysis file"
            while True:
                try:
                    rec = pickle.load(fh)
                except EOFError:
                    break
                self.records[rec["disp"]] = rec

    def get(self, disp: int, ftype: str) -> Optional[dict]:
        rec = self.records.get(disp)
        if rec is not None and rec["ftype"] == ftype:
            return rec
        return None


def _grid(sps, block):
    nbx, nby = sps.width // block, sps.height // block
    bys, bxs = np.mgrid[0:nby, 0:nbx]
    return (nby, nbx,
            jnp.asarray((bxs.ravel() * block).astype(np.int32)),
            jnp.asarray((bys.ravel() * block).astype(np.int32)))


def mc_for_p(refs, mvs, ref_sel, sps, weights=None, block: int = 16):
    """Rebuild P MC predictions from stored (mvs, ref_sel) — the
    replay-side of analyse_p_frame's step 5."""
    bd = sps.bit_depth
    nby, nbx, bx, by = _grid(sps, block)
    mvx = jnp.asarray(mvs[..., 0].ravel())
    mvy = jnp.asarray(mvs[..., 1].ravel())
    rs = jnp.asarray(np.asarray(ref_sel).ravel())
    if weights is None:
        weights = [None] * len(refs)
    nc = block // 2
    mc = []
    for pi in range(3):
        c_idx = 0 if pi == 0 else pi
        sz = block if pi == 0 else nc
        bx_ = bx if pi == 0 else bx // 2
        by_ = by if pi == 0 else by // 2
        preds = []
        for r, wp in zip(refs, weights):
            rp = jnp.asarray(np.asarray(r[pi], np.int32))
            if pi == 0 and wp is not None:
                p14 = mc_batch_14(rp, bx_, by_, mvx, mvy, sz, c_idx, bd)
                preds.append(wp_apply_batch(p14, wp[0], wp[1], 6, bd))
            else:
                preds.append(mc_batch(rp, bx_, by_, mvx, mvy, sz,
                                      c_idx, bd))
        sel = preds[0]
        for ridx in range(1, len(refs)):
            sel = jnp.where((rs == ridx)[:, None, None], preds[ridx], sel)
        mc.append(np.asarray(sel).reshape(nby, nbx, sz, sz))
    return tuple(mc)


def mc_for_b(refs0, refs1, dirs, mv_l0, mv_l1, sps, block: int = 16,
             ref_sel0=None, ref_sel1=None):
    """Rebuild B MC predictions from stored (dirs, mv_l0, mv_l1,
    ref_sel0, ref_sel1).  refs0/refs1: lists of (y, u, v) tuples in
    list order; a bare (y, u, v) tuple is accepted too."""
    def _norm(rl):
        if len(rl) == 3 and getattr(rl[0], "ndim", 0) == 2:
            return [rl]
        return list(rl)
    refs0 = _norm(refs0)
    refs1 = _norm(refs1)
    bd = sps.bit_depth
    nby, nbx, bx, by = _grid(sps, block)
    mv0x = jnp.asarray(mv_l0[..., 0].ravel())
    mv0y = jnp.asarray(mv_l0[..., 1].ravel())
    mv1x = jnp.asarray(mv_l1[..., 0].ravel())
    mv1y = jnp.asarray(mv_l1[..., 1].ravel())
    d = jnp.asarray(np.asarray(dirs).ravel())
    rs0 = jnp.zeros_like(d) if ref_sel0 is None \
        else jnp.asarray(np.asarray(ref_sel0).ravel())
    rs1 = jnp.zeros_like(d) if ref_sel1 is None \
        else jnp.asarray(np.asarray(ref_sel1).ravel())
    is_bi = d == 3
    use_l0 = (d == 1) | is_bi
    nc = block // 2

    def sel_ref(preds, rs):
        sel = preds[0]
        for ridx in range(1, len(preds)):
            sel = jnp.where((rs == ridx)[:, None, None], preds[ridx],
                            sel)
        return sel

    mc = []
    for pi in range(3):
        c_idx = 0 if pi == 0 else pi
        sz = block if pi == 0 else nc
        bx_ = bx if pi == 0 else bx // 2
        by_ = by if pi == 0 else by // 2
        p0 = [jnp.asarray(np.asarray(r[pi], np.int32)) for r in refs0]
        p1 = [jnp.asarray(np.asarray(r[pi], np.int32)) for r in refs1]
        u0 = sel_ref([mc_batch(p, bx_, by_, mv0x, mv0y, sz, c_idx, bd)
                      for p in p0], rs0)
        u1 = sel_ref([mc_batch(p, bx_, by_, mv1x, mv1y, sz, c_idx, bd)
                      for p in p1], rs1)
        b0 = sel_ref([mc_batch_14(p, bx_, by_, mv0x, mv0y, sz, c_idx,
                                  bd) for p in p0], rs0)
        b1 = sel_ref([mc_batch_14(p, bx_, by_, mv1x, mv1y, sz, c_idx,
                                  bd) for p in p1], rs1)
        bi = bi_combine(b0, b1, bd)
        sel = jnp.where(is_bi[:, None, None], bi,
                        jnp.where(use_l0[:, None, None], u0, u1))
        mc.append(np.asarray(sel).reshape(nby, nbx, sz, sz))
    return tuple(mc)
