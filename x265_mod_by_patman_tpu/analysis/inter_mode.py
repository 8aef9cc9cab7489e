"""P-frame analysis: batched ME + inter/intra decision + MC prediction.

TPU-first replacement of the reference's per-CU compressInterCU_rd0_4
(x265 source/encoder/analysis.cpp:1663): every block of the frame runs
full-search ME, subpel refinement, a neighbor-MV coherence pass (the
batched stand-in for merge estimation, reference analysis.cpp:3485
checkMerge2Nx2N), and an inter-vs-intra SATD decision — all as dense
tensor ops.  The recon wavefront then consumes the per-block decisions.
"""
from __future__ import annotations

import math
from typing import Tuple

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.me import full_search_batch, subpel_refine_batch, mv_bits
from ..ops.interp import bi_combine, mc_batch, mc_batch_14
from ..ops.cost import satd_batch
from .intra_mode import _mode_costs
from ..frame.zscan import frame_avail_masks


def lambda_qp(qp: int) -> Tuple[float, float]:
    """(lambda, lambda2) — SAD/SATD and SSE lambdas (reference
    constants.cpp:34 x265_lambda_tab / x265_lambda2_tab derivation)."""
    lam2 = 0.85 * (2.0 ** ((qp - 12) / 3.0))
    return math.sqrt(lam2), lam2


def analyse_p_frame(y, u, v, refs, sps, qp: int,
                    search_range: int = 16, block: int = 16,
                    weights=None, subme: int = 2):
    """Multi-reference P analysis (reference predInterSearch's per-ref
    loop, search.cpp:2554, batched).

    refs: list of (ref_y, ref_u, ref_v) tuples, L0 order (closest first).
    weights: optional per-ref luma (w, o) explicit-weight pairs (denom 6)
    or None entries — ME searches a pre-weighted plane, final luma MC
    applies the exact 14-bit weighting (spec 8.5.4.3.2).
    Returns (intra_modes (nby,nbx), inter_mask (nby,nbx) bool,
    mvs (nby,nbx,2) qpel, ref_sel (nby,nbx) int32,
    (mc_y, mc_u, mc_v) per-block predictions).

    The whole analysis is ONE jitted program (single device dispatch —
    the tunnel-attached TPU pays real RPC latency per dispatch, and the
    unfused form cost ~30 round trips per frame)."""
    from ..ops.me import _on_tpu
    bd = sps.bit_depth
    if weights is None:
        weights = [None] * len(refs)
    wpat = tuple(wp is not None for wp in weights)
    wq = jnp.asarray([wp[0] if wp else 64 for wp in weights], jnp.int32)
    wo = jnp.asarray([wp[1] if wp else 0 for wp in weights], jnp.int32)
    oy = jnp.asarray(np.asarray(y, np.int32))
    rys = jnp.stack([jnp.asarray(np.asarray(r[0], np.int32))
                     for r in refs])
    rus = jnp.stack([jnp.asarray(np.asarray(r[1], np.int32))
                     for r in refs])
    rvs = jnp.stack([jnp.asarray(np.asarray(r[2], np.int32))
                     for r in refs])
    avail = frame_avail_masks(sps.width, sps.height, block,
                              sps.log2_ctu_size, 0)
    lam, _ = lambda_qp(qp)
    lam256 = int(round(lam * 256)) << (bd - 8)
    out = _p_core(oy, rys, rus, rvs, wq, wo,
                  jnp.asarray(avail.reshape(-1, avail.shape[-1])),
                  jnp.int32(lam256), wpat, search_range, block, bd,
                  sps.log2_ctu_size, _on_tpu(oy), subme)
    modes, inter, mvs, rsel, mcy, mcu, mcv = out
    return (np.asarray(modes), np.asarray(inter), np.asarray(mvs),
            np.asarray(rsel),
            (np.asarray(mcy), np.asarray(mcu), np.asarray(mcv)))


@functools.partial(
    jax.jit, static_argnames=("wpat", "search_range", "block", "bd",
                              "log2_ctu", "use_pallas", "subme"))
def _p_core(oy, rys, rus, rvs, wq, wo, avail, lam256, wpat,
            search_range: int, block: int, bd: int, log2_ctu: int,
            use_pallas: bool, subme: int = 2):
    h, w = oy.shape
    n = block
    nbx, nby = w // n, h // n
    nb = nbx * nby
    nref = rys.shape[0]

    bys, bxs = np.mgrid[0:nby, 0:nbx]
    bx = jnp.asarray((bxs.ravel() * n).astype(np.int32))
    by = jnp.asarray((bys.ravel() * n).astype(np.int32))
    from .weightp import weighted_plane_jnp
    weights = [(wq[i], wo[i]) if wpat[i] else None for i in range(nref)]
    ry_all = []
    for i in range(nref):
        ry = rys[i]
        if wpat[i]:
            ry = weighted_plane_jnp(ry, wq[i], wo[i], bit_depth=bd)
        ry_all.append(ry)
    refs = [(rys[i], rus[i], rvs[i]) for i in range(nref)]

    gy = by[:, None, None] + jnp.arange(n)[None, :, None]
    gx = bx[:, None, None] + jnp.arange(n)[None, None, :]
    org = oy[jnp.clip(gy, 0, h - 1), jnp.clip(gx, 0, w - 1)].astype(jnp.int32)

    # 1. per-ref full search + subpel; ref_idx bit charge for non-zero refs
    cands = []
    pz = jnp.zeros(nb, jnp.int32)
    for ridx, ry in enumerate(ry_all):
        imx, imy, _ = full_search_batch(ry, oy, bx, by, pz, pz, lam256, n,
                                        search_range,
                                        use_pallas=use_pallas)
        mvx, mvy, cost = subpel_refine_batch(ry, oy, bx, by, imx, imy,
                                             pz, pz, lam256, n, bd,
                                             subme)
        cost = cost + ((lam256 * (2 if ridx else 1)) >> 8)
        # 2. neighbor-coherence pass per ref
        mvx2d = mvx.reshape(nby, nbx)
        mvy2d = mvy.reshape(nby, nbx)
        for (sy, sx) in ((0, 1), (1, 0)):
            cx_ = jnp.roll(mvx2d, (sy, sx), (0, 1)).ravel()
            cy_ = jnp.roll(mvy2d, (sy, sx), (0, 1)).ravel()
            pred = mc_batch(ry, bx, by, cx_, cy_, n, 0, bd,
                            use_pallas=use_pallas)
            c = satd_batch(org, pred) + ((lam256 * 2) >> 8)
            upd = c < cost
            mvx = jnp.where(upd, cx_, mvx)
            mvy = jnp.where(upd, cy_, mvy)
            cost = jnp.where(upd, c, cost)
        cands.append((mvx, mvy, cost))

    costs_r = jnp.stack([c[2] for c in cands])        # (R, nb)
    ref_sel = jnp.argmin(costs_r, axis=0).astype(jnp.int32)
    cost = jnp.min(costs_r, axis=0)
    mvx = jnp.choose(ref_sel, [c[0] for c in cands], mode="clip")
    mvy = jnp.choose(ref_sel, [c[1] for c in cands], mode="clip")

    # 3. intra costs (orig-neighbor batched sweep)
    icosts = _mode_costs(oy, avail,
                         jnp.asarray(bxs.ravel().astype(np.int32)),
                         jnp.asarray(bys.ravel().astype(np.int32)),
                         n.bit_length() - 1, bd)
    intra_best = jnp.min(icosts, axis=1)
    intra_modes = jnp.argmin(icosts, axis=1).astype(jnp.int32)

    # 4. decision: inter unless intra clearly wins (intra pays ~5 bits of
    # mode signalling in P slices)
    use_inter = cost <= (intra_best + ((lam256 * 5) >> 8))

    # 5. MC predictions of the chosen (ref, mv) per block; weighted refs
    # take the exact 14-bit path for luma (chroma stays unweighted)
    from ..ops.interp import mc_batch_14, wp_apply_batch
    nc = n // 2
    mc = []
    for pi in range(3):
        c_idx = 0 if pi == 0 else pi
        sz = n if pi == 0 else nc
        bx_ = bx if pi == 0 else bx // 2
        by_ = by if pi == 0 else by // 2
        preds = []
        for ridx in range(nref):
            rp = refs[ridx][pi]
            wp = weights[ridx]
            if pi == 0 and wp is not None:
                p14 = mc_batch_14(rp, bx_, by_, mvx, mvy, sz, c_idx, bd,
                                  use_pallas=use_pallas)
                preds.append(wp_apply_batch(p14, wp[0], wp[1], 6, bd))
            else:
                preds.append(mc_batch(rp, bx_, by_, mvx, mvy, sz,
                                      c_idx, bd, use_pallas=use_pallas))
        sel = preds[0]
        for ridx in range(1, nref):
            sel = jnp.where((ref_sel == ridx)[:, None, None],
                            preds[ridx], sel)
        mc.append(sel.reshape(nby, nbx, sz, sz))

    mvs = jnp.stack([mvx, mvy], axis=-1).reshape(nby, nbx, 2) \
        .astype(jnp.int32)
    return (intra_modes.reshape(nby, nbx),
            use_inter.reshape(nby, nbx),
            mvs,
            ref_sel.reshape(nby, nbx),
            mc[0], mc[1], mc[2])


def _me_one_ref(oy, ry, bx, by, n, lam256, search_range, bit_depth=8,
                use_pallas=None, subme=2):
    """Full search + subpel + neighbor coherence against one reference.
    Returns (mvx, mvy, cost) device arrays."""
    nb = bx.shape[0]
    pz = jnp.zeros(nb, jnp.int32)
    imx, imy, _ = full_search_batch(ry, oy, bx, by, pz, pz, lam256,
                                    n, search_range,
                                    use_pallas=use_pallas)
    mvx, mvy, cost = subpel_refine_batch(ry, oy, bx, by, imx, imy,
                                         pz, pz, lam256, n, bit_depth,
                                         subme)
    h, w = oy.shape
    gy = by[:, None, None] + jnp.arange(n)[None, :, None]
    gx = bx[:, None, None] + jnp.arange(n)[None, None, :]
    org = oy[jnp.clip(gy, 0, h - 1), jnp.clip(gx, 0, w - 1)] \
        .astype(jnp.int32)
    return mvx, mvy, cost, org


def analyse_b_frame(y, u, v, ref0, ref1, sps, qp: int,
                    search_range: int = 16, block: int = 16,
                    subme: int = 2):
    """B-frame analysis: ME against both anchors + bi-prediction test +
    intra fallback (the batched analog of x265 checkBidir2Nx2N,
    analysis.cpp:4007); ONE jitted program like analyse_p_frame.

    ref0/ref1: (y, u, v) plane tuples of the L0 (past) and L1 (future)
    anchors.  Returns (intra_modes, inter_mask, dirs, mv_l0, mv_l1,
    (mc_y, mc_u, mc_v))."""
    from ..ops.me import _on_tpu
    bd = sps.bit_depth
    lam, _ = lambda_qp(qp)
    lam256 = int(round(lam * 256)) << (bd - 8)
    avail = frame_avail_masks(sps.width, sps.height, block,
                              sps.log2_ctu_size, 0)
    oy = jnp.asarray(np.asarray(y, np.int32))
    out = _b_core(oy,
                  jnp.asarray(np.asarray(ref0[0], np.int32)),
                  jnp.asarray(np.asarray(ref0[1], np.int32)),
                  jnp.asarray(np.asarray(ref0[2], np.int32)),
                  jnp.asarray(np.asarray(ref1[0], np.int32)),
                  jnp.asarray(np.asarray(ref1[1], np.int32)),
                  jnp.asarray(np.asarray(ref1[2], np.int32)),
                  jnp.asarray(avail.reshape(-1, avail.shape[-1])),
                  jnp.int32(lam256), search_range, block, bd,
                  _on_tpu(oy), subme)
    modes, inter, dirs, mv0, mv1, mcy, mcu, mcv = out
    return (np.asarray(modes), np.asarray(inter), np.asarray(dirs),
            np.asarray(mv0), np.asarray(mv1),
            (np.asarray(mcy), np.asarray(mcu), np.asarray(mcv)))


@functools.partial(
    jax.jit, static_argnames=("search_range", "block", "bd",
                              "use_pallas", "subme"))
def _b_core(oy, r0y, ru0, rv0, r1y, ru1, rv1, avail, lam256,
            search_range: int, block: int, bd: int, use_pallas: bool,
            subme: int = 2):
    h, w = oy.shape
    n = block
    nbx, nby = w // n, h // n
    nb = nbx * nby

    bys, bxs = np.mgrid[0:nby, 0:nbx]
    bx = jnp.asarray((bxs.ravel() * n).astype(np.int32))
    by = jnp.asarray((bys.ravel() * n).astype(np.int32))

    mv0x, mv0y, cost0, org = _me_one_ref(oy, r0y, bx, by, n, lam256,
                                         search_range, bd, use_pallas,
                                         subme)
    mv1x, mv1y, cost1, _ = _me_one_ref(oy, r1y, bx, by, n, lam256,
                                       search_range, bd, use_pallas,
                                       subme)

    # bi-prediction of the two best uni MVs (x265 checkBidir2Nx2N)
    p0_14 = mc_batch_14(r0y, bx, by, mv0x, mv0y, n, 0, bd,
                        use_pallas=use_pallas)
    p1_14 = mc_batch_14(r1y, bx, by, mv1x, mv1y, n, 0, bd,
                        use_pallas=use_pallas)
    bi_pred = bi_combine(p0_14, p1_14, bd)
    bits_bi = mv_bits(mv0x, mv0y) + mv_bits(mv1x, mv1y)
    cost_bi = satd_batch(org, bi_pred) + ((lam256 * bits_bi) >> 8)

    # intra fallback
    icosts = _mode_costs(oy, avail,
                         jnp.asarray(bxs.ravel().astype(np.int32)),
                         jnp.asarray(bys.ravel().astype(np.int32)),
                         n.bit_length() - 1, bd)
    intra_best = jnp.min(icosts, axis=1) + ((lam256 * 5) >> 8)
    intra_modes = jnp.argmin(icosts, axis=1).astype(jnp.int32)

    costs = jnp.stack([cost0, cost1, cost_bi, intra_best], axis=0)
    choice = jnp.argmin(costs, axis=0)       # 0=L0, 1=L1, 2=BI, 3=intra
    use_inter = choice != 3
    dirs = jnp.where(choice == 0, 1,
                     jnp.where(choice == 1, 2,
                               jnp.where(choice == 2, 3, 0)))

    # MC predictions of the chosen mode per block
    nc = n // 2
    is_bi = (dirs == 3)
    use_l0 = (dirs == 1) | is_bi
    mc = []
    for (r0p, r1p, c_idx, sz, bx_, by_) in (
            (r0y, r1y, 0, n, bx, by),
            (ru0, ru1, 1, nc, bx // 2, by // 2),
            (rv0, rv1, 2, nc, bx // 2, by // 2)):
        u0 = mc_batch(r0p, bx_, by_, mv0x, mv0y, sz, c_idx, bd,
                      use_pallas=use_pallas)
        u1 = mc_batch(r1p, bx_, by_, mv1x, mv1y, sz, c_idx, bd,
                      use_pallas=use_pallas)
        b0 = mc_batch_14(r0p, bx_, by_, mv0x, mv0y, sz, c_idx, bd,
                         use_pallas=use_pallas)
        b1 = mc_batch_14(r1p, bx_, by_, mv1x, mv1y, sz, c_idx, bd,
                         use_pallas=use_pallas)
        bi = bi_combine(b0, b1, bd)
        sel = jnp.where(is_bi[:, None, None], bi,
                        jnp.where(use_l0[:, None, None], u0, u1))
        mc.append(sel.reshape(nby, nbx, sz, sz))

    mv_l0 = jnp.stack([mv0x, mv0y], -1).reshape(nby, nbx, 2) \
        .astype(jnp.int32)
    mv_l1 = jnp.stack([mv1x, mv1y], -1).reshape(nby, nbx, 2) \
        .astype(jnp.int32)
    return (intra_modes.reshape(nby, nbx),
            use_inter.reshape(nby, nbx),
            dirs.reshape(nby, nbx).astype(jnp.int32),
            mv_l0, mv_l1, mc[0], mc[1], mc[2])
