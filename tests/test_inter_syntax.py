"""P-slice CU syntax roundtrip: inter (skip/merge/AMVP) + intra mix."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.bitstream.bitwriter import BitWriter
from x265_mod_by_patman_tpu.bitstream.headers import (
    build_sps_info, build_pps_info)
from x265_mod_by_patman_tpu.entropy.binir import BinIR
from x265_mod_by_patman_tpu.entropy.cabac import CabacEncoder, CabacDecoder
from x265_mod_by_patman_tpu.entropy.contexts import init_states
from x265_mod_by_patman_tpu.entropy.cu_syntax import (
    CodedCU, SliceSyntaxEncoder, SliceSyntaxDecoder)


def rand_levels(rng, log2, density=0.3):
    n = 1 << log2
    mask = rng.random((n, n)) < density
    lv = (mask * rng.integers(1, 20, (n, n)) *
          rng.choice([-1, 1], (n, n))).astype(np.int32)
    if not lv.any():
        lv[0, 0] = 1           # coeffs invariant: TBs must be nonzero
    return lv


def make_p_cus(rng, width, height):
    """16x16 CU grid with random inter/intra mix; clustered MVs so that
    merge/skip paths get exercised."""
    per_ctu = []
    base_mv = (int(rng.integers(-32, 32)), int(rng.integers(-32, 32)))
    for cy in range(-(-height // 32)):
        for cx in range(-(-width // 32)):
            cus = []
            for k in range(4):
                x0 = cx * 32 + (k & 1) * 16
                y0 = cy * 32 + (k >> 1) * 16
                if x0 >= width or y0 >= height:
                    continue
                r = rng.random()
                if r < 0.15:   # intra in P
                    cu = CodedCU(x0, y0, 4,
                                 (int(rng.integers(0, 35)),), 4)
                    if rng.random() < 0.8:
                        cu.coeffs[(0, x0, y0, 4)] = rand_levels(rng, 4)
                elif y0 == 16:
                    # a full row of identical-MV zero-residual CUs:
                    # guarantees merge/skip coverage
                    cu = CodedCU(x0, y0, 4, (1,), 4, {}, is_inter=True,
                                 mv=base_mv, ref_idx=0)
                else:
                    # clustered MVs: mostly the base MV (merge-able)
                    if rng.random() < 0.6:
                        mv = base_mv
                    else:
                        mv = (int(rng.integers(-64, 64)),
                              int(rng.integers(-64, 64)))
                    cu = CodedCU(x0, y0, 4, (1,), 4, {}, is_inter=True,
                                 mv=mv, ref_idx=0)
                    if rng.random() < 0.5:
                        cu.coeffs[(0, x0, y0, 4)] = rand_levels(rng, 4)
                    if rng.random() < 0.25:
                        cu.coeffs[(1, x0 >> 1, y0 >> 1, 3)] = \
                            rand_levels(rng, 3)
                cus.append(cu)
            per_ctu.append(((cx, cy), cus))
    return per_ctu


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_p_slice_roundtrip(seed):
    w, h = 96, 64
    p = default_params(w, h, ctu_size=32, qp=30, sign_hide=False).validate()
    sps = build_sps_info(p)
    pps = build_pps_info(p)
    rng = np.random.default_rng(seed)
    per_ctu = make_p_cus(rng, sps.width, sps.height)

    enc = SliceSyntaxEncoder(sps, pps, 30, slice_type=1)
    ir = BinIR()
    for i, ((cx, cy), cus) in enumerate(per_ctu):
        enc.encode_ctu(ir, cus, cx, cy, last_ctu=(i == len(per_ctu) - 1))
    states = init_states(1, 30)
    bw = BitWriter()
    cab = CabacEncoder(bw)
    bins, ctx = ir.arrays()
    cab.encode_stream(bins, ctx, states)
    cab.finish()
    bw.rbsp_trailing_bits()
    data = bw.get_bytes()

    dec = SliceSyntaxDecoder(CabacDecoder(data), init_states(1, 30),
                             sps, pps, 30, slice_type=1)
    skips = merges = 0
    for i, ((cx, cy), cus) in enumerate(per_ctu):
        got, end, _ = dec.decode_ctu(cx, cy)
        assert len(got) == len(cus)
        for a, b in zip(cus, got):
            assert (a.x0, a.y0, a.is_inter) == (b.x0, b.y0, b.is_inter)
            if a.is_inter:
                assert a.mv == b.mv, (a.x0, a.y0, a.mv, b.mv)
                assert a.ref_idx == b.ref_idx
                skips += b.was_skip
            else:
                assert a.luma_modes == b.luma_modes
            a_nz = {k: v for k, v in a.coeffs.items() if np.any(v)}
            assert set(a_nz) == set(b.coeffs), (a.x0, a.y0)
            for k in a_nz:
                assert np.array_equal(a_nz[k], b.coeffs[k])
    assert np.array_equal(states, dec.states)
    assert skips > 0, "test should exercise the skip path"
