"""Sample-adaptive offset (spec 7.3.8.3 syntax, 8.7.3 filtering).

Analog of the reference's SAO (x265 source/encoder/sao.cpp: stats
calcSaoStatsCTU:729, RDO rdoSaoUnitCu:1214, apply applyPixelOffsets:268;
saoCuOrgE0..B0 primitives), restructured TPU-first: SAO reads the
deblocked picture and writes an independent output, so classification,
per-CTU statistics, and offset application are all whole-frame batched
tensor ops; only the tiny per-CTU type decision runs on host.

v1 scope: explicit per-CTU params (merge flags coded 0), luma + chroma
(shared chroma type/class per spec).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

SAO_OFF, SAO_BAND, SAO_EDGE = 0, 1, 2
MAX_OFFSET = 7                     # 8-bit: (1 << (min(bd,10)-5)) - 1

# EO class neighbor offsets: (ax, ay, bx, by)
EO_NEIGHBORS = ((-1, 0, 1, 0), (0, -1, 0, 1), (-1, -1, 1, 1),
                (1, -1, -1, 1))


@dataclass
class SaoParams:
    """Per-CTU, per-component SAO decision."""
    type_idx: int = SAO_OFF        # 0 off, 1 band, 2 edge
    eo_class: int = 0              # 0..3 (edge)
    band_pos: int = 0              # 0..31 (band)
    offsets: Tuple[int, ...] = (0, 0, 0, 0)


# ---------------------------------------------------------------------------
# Classification (shared by stats and apply) — batched
# ---------------------------------------------------------------------------

def _eo_categories(plane: jnp.ndarray, pic_h: int, pic_w: int
                   ) -> jnp.ndarray:
    """Per-pixel EO category for all 4 classes.

    Returns (4, H, W) int32 in 0..4 (0 = no offset).  Picture-boundary
    pixels (vs the TRUE picture dims pic_h/pic_w, not the CTU-padded
    plane) where a neighbor falls outside get category 0 (spec 8.7.3:
    such samples are not filtered).
    """
    h, w = plane.shape
    p = plane.astype(jnp.int32)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    cats = []
    for (ax, ay, bx, by) in EO_NEIGHBORS:
        a = p[jnp.clip(ys + ay, 0, h - 1), jnp.clip(xs + ax, 0, w - 1)]
        b = p[jnp.clip(ys + by, 0, h - 1), jnp.clip(xs + bx, 0, w - 1)]
        edge = 2 + jnp.sign(p - a) + jnp.sign(p - b)
        cat = jnp.where(edge == 0, 1,
                        jnp.where(edge == 1, 2,
                                  jnp.where(edge == 3, 3,
                                            jnp.where(edge == 4, 4, 0))))
        inside = ((ys + ay >= 0) & (ys + ay < pic_h) & (xs + ax >= 0) &
                  (xs + ax < pic_w) & (ys + by >= 0) & (ys + by < pic_h) &
                  (xs + bx >= 0) & (xs + bx < pic_w))
        cats.append(jnp.where(inside, cat, 0))
    return jnp.stack(cats)


def _ctu_reduce(arr: jnp.ndarray, ctu: int, h: int, w: int) -> jnp.ndarray:
    """(..., H, W) -> (..., nCtuY, nCtuX) sum over CTU tiles (H/W padded
    to CTU multiples by the caller)."""
    lead = arr.shape[:-2]
    a = arr.reshape(*lead, h // ctu, ctu, w // ctu, ctu)
    return a.sum(axis=(-3, -1))


@functools.partial(jax.jit,
                   static_argnames=("ctu", "pic_h", "pic_w", "bit_depth"))
def sao_stats_batch(orig: jnp.ndarray, rec: jnp.ndarray, ctu: int,
                    pic_h: int, pic_w: int, bit_depth: int = 8):
    """Per-CTU SAO statistics on (orig - rec).

    Returns (eo_sum, eo_cnt, bo_sum, bo_cnt):
      eo_*: (4, 5, nCtuY, nCtuX)  per class x category
      bo_*: (32, nCtuY, nCtuX)    per band
    Planes must be CTU-aligned (pad before calling; padded area zeros out
    via orig==rec there).
    """
    h, w = rec.shape
    inpic = (jnp.arange(h)[:, None] < pic_h) & \
        (jnp.arange(w)[None, :] < pic_w)
    diff = jnp.where(inpic,
                     orig.astype(jnp.int32) - rec.astype(jnp.int32), 0)
    cats = jnp.where(inpic[None], _eo_categories(rec, pic_h, pic_w), 0)
    cat_axis = jnp.arange(5)[None, :, None, None]
    onehot = (cats[:, None] == cat_axis)             # (4, 5, H, W)
    eo_sum = _ctu_reduce(jnp.where(onehot, diff[None, None], 0),
                         ctu, h, w)
    eo_cnt = _ctu_reduce(onehot.astype(jnp.int32), ctu, h, w)
    band = (rec.astype(jnp.int32) >> (bit_depth - 5))          # (H, W)
    bhot = (band[None] == jnp.arange(32)[:, None, None]) & inpic[None]
    bo_sum = _ctu_reduce(jnp.where(bhot, diff[None], 0), ctu, h, w)
    bo_cnt = _ctu_reduce(bhot.astype(jnp.int32), ctu, h, w)
    return eo_sum, eo_cnt, bo_sum, bo_cnt


@functools.partial(jax.jit,
                   static_argnames=("ctu", "pic_h", "pic_w", "bit_depth"))
def sao_apply_batch(rec: jnp.ndarray, type_map: jnp.ndarray,
                    class_map: jnp.ndarray, band_map: jnp.ndarray,
                    off_map: jnp.ndarray, ctu: int, pic_h: int,
                    pic_w: int, bit_depth: int = 8):
    """Apply per-CTU SAO params to a deblocked plane.

    type_map/class_map/band_map: (nCtuY, nCtuX) int32;
    off_map: (nCtuY, nCtuX, 4) int32.  Returns the filtered plane."""
    h, w = rec.shape
    maxv = (1 << bit_depth) - 1
    p = rec.astype(jnp.int32)
    cats = _eo_categories(rec, pic_h, pic_w)         # (4, H, W)
    cy = jnp.arange(h)[:, None] // ctu
    cx = jnp.arange(w)[None, :] // ctu
    t = type_map[cy, cx]                             # (H, W)
    cls = class_map[cy, cx]
    bpos = band_map[cy, cx]
    offs = off_map[cy, cx]                           # (H, W, 4)

    # edge: offset by (category of the CTU's class) - 1
    cat_sel = jnp.take_along_axis(
        cats, cls[None], axis=0)[0]                  # (H, W)
    eo_off = jnp.where(cat_sel > 0,
                       jnp.take_along_axis(
                           offs, jnp.maximum(cat_sel - 1, 0)[..., None],
                           axis=-1)[..., 0], 0)
    # band: offset index = band - band_pos in 0..3 (mod 32)
    band = p >> (bit_depth - 5)
    bidx = (band - bpos) % 32
    bo_off = jnp.where(bidx < 4,
                       jnp.take_along_axis(
                           offs, jnp.minimum(bidx, 3)[..., None],
                           axis=-1)[..., 0], 0)
    out = jnp.where(t == SAO_EDGE, p + eo_off,
                    jnp.where(t == SAO_BAND, p + bo_off, p))
    return jnp.clip(out, 0, maxv)


# ---------------------------------------------------------------------------
# Golden scalar apply (decoder)
# ---------------------------------------------------------------------------

def sao_apply_ref(rec: np.ndarray, params: List[List[SaoParams]],
                  ctu: int, bit_depth: int = 8) -> np.ndarray:
    """Scalar reference apply; params indexed [ctu_y][ctu_x]."""
    h, w = rec.shape
    maxv = (1 << bit_depth) - 1
    src = rec.astype(np.int64)
    out = src.copy()
    for cy in range(len(params)):
        for cx in range(len(params[0])):
            pr = params[cy][cx]
            if pr.type_idx == SAO_OFF:
                continue
            y1 = min((cy + 1) * ctu, h)
            x1 = min((cx + 1) * ctu, w)
            for y in range(cy * ctu, y1):
                for x in range(cx * ctu, x1):
                    v = src[y, x]
                    if pr.type_idx == SAO_BAND:
                        bidx = ((v >> (bit_depth - 5)) - pr.band_pos) % 32
                        if bidx < 4:
                            out[y, x] = min(max(v + pr.offsets[bidx], 0),
                                            maxv)
                        continue
                    ax, ay, bx, by = EO_NEIGHBORS[pr.eo_class]
                    if not (0 <= y + ay < h and 0 <= x + ax < w and
                            0 <= y + by < h and 0 <= x + bx < w):
                        continue
                    a = src[y + ay, x + ax]
                    b = src[y + by, x + bx]
                    edge = 2 + int(np.sign(v - a)) + int(np.sign(v - b))
                    cat = {0: 1, 1: 2, 3: 3, 4: 4}.get(edge, 0)
                    if cat:
                        out[y, x] = min(max(v + pr.offsets[cat - 1], 0),
                                        maxv)
    return out.astype(np.int32)


# ---------------------------------------------------------------------------
# Per-CTU RDO decision (host)
# ---------------------------------------------------------------------------

def _best_offset(s: int, c: int, lam: float, sign: int = 0) -> Tuple[int, float]:
    """Optimal clipped offset and its RD cost for one category.

    Distortion delta of offset o on (sum, count): c*o^2 - 2*o*s
    (x265 estSaoDist); iterate |o| downward charging ~1 bin per magnitude
    (estIterOffset analog)."""
    if c == 0:
        return 0, 0.0
    o = int(round(s / c))
    o = min(max(o, -MAX_OFFSET), MAX_OFFSET)
    if sign > 0:
        o = max(o, 0)
    elif sign < 0:
        o = min(o, 0)
    best = (0, 0.0)
    while o != 0:
        cost = c * o * o - 2 * o * s + lam * (abs(o) + 1)
        if cost < best[1]:
            best = (o, cost)
        o += 1 if o < 0 else -1
    return best


def sao_decide(eo_sum, eo_cnt, bo_sum, bo_cnt, lam: float
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Choose per-CTU type/class/offsets from stats (numpy host RDO).

    Returns (type_map, class_map, band_map, off_map) numpy arrays."""
    eo_sum = np.asarray(eo_sum)
    eo_cnt = np.asarray(eo_cnt)
    bo_sum = np.asarray(bo_sum)
    bo_cnt = np.asarray(bo_cnt)
    ncy, ncx = eo_sum.shape[-2:]
    type_map = np.zeros((ncy, ncx), np.int32)
    class_map = np.zeros((ncy, ncx), np.int32)
    band_map = np.zeros((ncy, ncx), np.int32)
    off_map = np.zeros((ncy, ncx, 4), np.int32)
    for cy in range(ncy):
        for cx in range(ncx):
            best_cost = 0.0            # SAO off baseline
            best = (SAO_OFF, 0, 0, (0, 0, 0, 0))
            for cls in range(4):
                offs, cost = [], lam * 2.0      # type+class signalling
                for cat in range(1, 5):
                    sgn = 1 if cat <= 2 else -1
                    o, c = _best_offset(int(eo_sum[cls, cat, cy, cx]),
                                        int(eo_cnt[cls, cat, cy, cx]),
                                        lam, sgn)
                    offs.append(o)
                    cost += c
                if cost < best_cost:
                    best_cost = cost
                    best = (SAO_EDGE, cls, 0, tuple(offs))
            # band: best 4 consecutive bands
            bo_o = np.zeros(32, np.int32)
            bo_c = np.zeros(32)
            for b in range(32):
                o, c = _best_offset(int(bo_sum[b, cy, cx]),
                                    int(bo_cnt[b, cy, cx]), lam)
                bo_o[b], bo_c[b] = o, c
            for start in range(29):
                cost = bo_c[start:start + 4].sum() + lam * 7.0
                if cost < best_cost:
                    best_cost = cost
                    best = (SAO_BAND, 0, start,
                            tuple(int(x) for x in bo_o[start:start + 4]))
            type_map[cy, cx], class_map[cy, cx], band_map[cy, cx] = best[:3]
            off_map[cy, cx] = best[3]
    return type_map, class_map, band_map, off_map


def _eval_eo(eo_sum, eo_cnt, cls, cy, cx, lam):
    offs, cost = [], 0.0
    for cat in range(1, 5):
        sgn = 1 if cat <= 2 else -1
        o, c = _best_offset(int(eo_sum[cls, cat, cy, cx]),
                            int(eo_cnt[cls, cat, cy, cx]), lam, sgn)
        offs.append(o)
        cost += c
    return tuple(offs), cost


def _eval_bo(bo_sum, bo_cnt, cy, cx, lam):
    bo_o = np.zeros(32, np.int32)
    bo_c = np.zeros(32)
    for b in range(32):
        o, c = _best_offset(int(bo_sum[b, cy, cx]),
                            int(bo_cnt[b, cy, cx]), lam)
        bo_o[b], bo_c[b] = o, c
    best = (0, (0, 0, 0, 0), 0.0)
    for start in range(29):
        cost = bo_c[start:start + 4].sum()
        if cost < best[2]:
            best = (start, tuple(int(x) for x in bo_o[start:start + 4]),
                    cost)
    return best


def sao_decide_chroma(stats_cb, stats_cr, lam: float):
    """Joint Cb/Cr decision: type and EO class are shared (spec syntax),
    offsets/band position are per component.

    Returns per-plane (type, class, band, off) map tuples (cb_maps,
    cr_maps)."""
    eo_sum_b, eo_cnt_b, bo_sum_b, bo_cnt_b = (np.asarray(a)
                                              for a in stats_cb)
    eo_sum_r, eo_cnt_r, bo_sum_r, bo_cnt_r = (np.asarray(a)
                                              for a in stats_cr)
    ncy, ncx = eo_sum_b.shape[-2:]
    maps = [[np.zeros((ncy, ncx), np.int32) for _ in range(3)] +
            [np.zeros((ncy, ncx, 4), np.int32)] for _ in range(2)]
    for cy in range(ncy):
        for cx in range(ncx):
            best_cost = 0.0
            best = None               # (type, cls, (bposB, offsB), (bposR, offsR))
            for cls in range(4):
                ob, cb_ = _eval_eo(eo_sum_b, eo_cnt_b, cls, cy, cx, lam)
                orr, cr_ = _eval_eo(eo_sum_r, eo_cnt_r, cls, cy, cx, lam)
                cost = cb_ + cr_ + lam * 2.0
                if cost < best_cost:
                    best_cost = cost
                    best = (SAO_EDGE, cls, (0, ob), (0, orr))
            sb, offb, cb_ = _eval_bo(bo_sum_b, bo_cnt_b, cy, cx, lam)
            sr, offr, cr_ = _eval_bo(bo_sum_r, bo_cnt_r, cy, cx, lam)
            cost = cb_ + cr_ + lam * 12.0
            if cost < best_cost:
                best_cost = cost
                best = (SAO_BAND, 0, (sb, offb), (sr, offr))
            if best is None:
                continue
            t, cls, (bpb, ofb), (bpr, ofr) = best
            for k, (bp, of) in enumerate(((bpb, ofb), (bpr, ofr))):
                maps[k][0][cy, cx] = t
                maps[k][1][cy, cx] = cls
                maps[k][2][cy, cx] = bp
                maps[k][3][cy, cx] = of
    return tuple(maps[0]), tuple(maps[1])
