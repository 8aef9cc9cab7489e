"""Motion estimation: batched full search vs brute-force golden."""
import numpy as np
import jax.numpy as jnp

from x265_mod_by_patman_tpu.ops.me import (
    full_search_batch, full_search_ref, subpel_refine_batch)
from x265_mod_by_patman_tpu.ops.interp import mc_block_ref
from x265_mod_by_patman_tpu.ops.cost import satd_ref
from x265_mod_by_patman_tpu.ops.me import mv_bits_np


def shifted_scene(rng, h, w, dx, dy):
    base = rng.integers(0, 256, (h + 32, w + 32)).astype(np.int32)
    ref = base[16:16 + h, 16:16 + w]
    cur = base[16 + dy:16 + dy + h, 16 + dx:16 + dx + w]
    return ref, cur


def test_full_search_matches_golden():
    rng = np.random.default_rng(0)
    ref, cur = shifted_scene(rng, 64, 96, 3, -2)
    n, r, lam = 16, 8, 256 * 4
    blocks = [(16, 16), (0, 0), (64, 32), (80, 48)]
    x0 = np.array([b[0] for b in blocks], np.int32)
    y0 = np.array([b[1] for b in blocks], np.int32)
    pz = np.zeros(len(blocks), np.int32)
    mx, my, cost = full_search_batch(
        jnp.asarray(ref), jnp.asarray(cur), jnp.asarray(x0),
        jnp.asarray(y0), jnp.asarray(pz), jnp.asarray(pz), lam, n, r)
    for i, (bx, by) in enumerate(blocks):
        gx, gy, gc = full_search_ref(ref, cur, bx, by, (0, 0), lam, n, r)
        assert (int(mx[i]), int(my[i]), int(cost[i])) == (gx, gy, gc), i
        # the true displacement should be found for interior blocks
    assert (int(mx[0]), int(my[0])) == (3 * 4, -2 * 4)


def test_subpel_refine_improves_or_keeps():
    rng = np.random.default_rng(1)
    # build a reference, then derive "current" by qpel-shifting via MC
    ref = rng.integers(0, 256, (64, 96)).astype(np.int32)
    # smooth it so interpolation behaves
    ref = (ref + np.roll(ref, 1, 0) + np.roll(ref, 1, 1) +
           np.roll(ref, (1, 1), (0, 1))) // 4
    true_mv = (6, -3)    # 1.5 px right, 0.75 px up
    cur = np.zeros_like(ref)
    for by in range(0, 64, 16):
        for bx in range(0, 96, 16):
            cur[by:by + 16, bx:bx + 16] = mc_block_ref(
                ref, bx, by, true_mv[0], true_mv[1], 16, 16, 0)
    blocks = [(16, 16), (48, 32), (64, 16)]
    x0 = np.array([b[0] for b in blocks], np.int32)
    y0 = np.array([b[1] for b in blocks], np.int32)
    pz = np.zeros(len(blocks), np.int32)
    mx, my, cost = full_search_batch(
        jnp.asarray(ref), jnp.asarray(cur), jnp.asarray(x0),
        jnp.asarray(y0), jnp.asarray(pz), jnp.asarray(pz), 1024, 16, 8)
    rx, ry, rcost = subpel_refine_batch(
        jnp.asarray(ref), jnp.asarray(cur), jnp.asarray(x0),
        jnp.asarray(y0), mx, my, jnp.asarray(pz), jnp.asarray(pz),
        1024, 16)
    # subpel must find the exact fractional MV for interior blocks
    for i in range(len(blocks)):
        assert (int(rx[i]), int(ry[i])) == true_mv, \
            (i, int(rx[i]), int(ry[i]))


def test_hme_seeded_full_search_finds_large_motion():
    """Seeded full search (center_x/center_y) reaches motion beyond the
    unseeded window; pallas-interpret and XLA paths agree."""
    import numpy as np
    import jax.numpy as jnp
    from x265_mod_by_patman_tpu.ops.me import full_search_batch
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 255, (96, 160)).astype(np.int32)
    # orig[x] = ref[x + 40]: the match lies +40 px right in ref
    orig = np.roll(ref, -40, axis=1)
    x0 = jnp.asarray([64], jnp.int32)
    y0 = jnp.asarray([32], jnp.int32)
    z = jnp.zeros(1, jnp.int32)
    cx = jnp.asarray([40], jnp.int32)
    mvx, mvy, cost = full_search_batch(
        jnp.asarray(ref), jnp.asarray(orig), x0, y0, z, z, 0, 16, 8,
        use_pallas=False, center_x=cx, center_y=z)
    assert int(mvx[0]) == 160 and int(mvy[0]) == 0    # qpel
    assert int(cost[0]) == 0
