"""TU32 + voluntary TU split syntax roundtrip (max_tu_size=32)."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.bitstream.bitwriter import BitWriter
from x265_mod_by_patman_tpu.bitstream.headers import (
    build_sps_info, build_pps_info)
from x265_mod_by_patman_tpu.entropy.binir import BinIR
from x265_mod_by_patman_tpu.entropy.cabac import (
    CabacEncoder, CabacDecoder)
from x265_mod_by_patman_tpu.entropy.contexts import init_states
from x265_mod_by_patman_tpu.entropy.cu_syntax import (
    CodedCU, SliceSyntaxEncoder, SliceSyntaxDecoder)
from tests.test_cu_syntax import rand_levels


def _roundtrip(per_ctu, sps, pps, slice_type, qp=30):
    nref = (1, 0) if slice_type == 1 else (1, 1)
    enc = SliceSyntaxEncoder(sps, pps, qp, slice_type,
                             num_refs=nref if slice_type != 2 else (1, 0))
    ir = BinIR()
    for i, ((cx, cy), cus) in enumerate(per_ctu):
        enc.encode_ctu(ir, cus, cx, cy, last_ctu=(i == len(per_ctu) - 1))
    states = init_states(slice_type, qp)
    bw = BitWriter()
    cab = CabacEncoder(bw)
    bins, ctx = ir.arrays()
    cab.encode_stream(bins, ctx, states)
    cab.finish()
    bw.rbsp_trailing_bits()
    dec = SliceSyntaxDecoder(CabacDecoder(bw.get_bytes()),
                             init_states(slice_type, qp), sps, pps, qp,
                             slice_type,
                             num_refs=nref if slice_type != 2 else (1, 0))
    out = []
    for i, ((cx, cy), cus) in enumerate(per_ctu):
        got, end, _ = dec.decode_ctu(cx, cy)
        assert end == (1 if i == len(per_ctu) - 1 else 0)
        out.append(((cx, cy), got))
    return out


def test_intra_tu32_roundtrip():
    p = default_params(64, 64, ctu_size=32, max_tu_size=32,
                       qp=30).validate()
    sps, pps = build_sps_info(p), build_pps_info(p)
    assert sps.log2_max_tu_size == 5
    rng = np.random.default_rng(5)
    per_ctu = []
    for i, (cx, cy) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
        cu = CodedCU(cx * 32, cy * 32, 5, (int(rng.integers(0, 35)),), 4)
        if i != 3:                       # one CU with cbf=0 everywhere
            cu.coeffs[(0, cx * 32, cy * 32, 5)] = rand_levels(rng, 5, 0.1)
            cu.coeffs[(1, cx * 16, cy * 16, 4)] = rand_levels(rng, 4, 0.2)
            cu.coeffs[(2, cx * 16, cy * 16, 4)] = rand_levels(rng, 4, 0.2)
        per_ctu.append(((cx, cy), [cu]))
    got = _roundtrip(per_ctu, sps, pps, 2)
    for ((cx, cy), cus), ((_, _), gcus) in zip(per_ctu, got):
        a, b = cus[0], gcus[0]
        assert (a.x0, a.y0, a.log2_size) == (b.x0, b.y0, b.log2_size)
        assert a.luma_modes == b.luma_modes
        assert not b.tu_split
        assert b.tu_leaves == [(a.x0, a.y0, 5, 0)]
        a_nz = {k: v for k, v in a.coeffs.items() if np.any(v)}
        assert set(a_nz) == set(b.coeffs)
        for k in a_nz:
            assert np.array_equal(a_nz[k], b.coeffs[k])


def test_inter_tu_split_roundtrip():
    p = default_params(64, 64, ctu_size=32, max_tu_size=32,
                       tu_inter_depth=2, qp=30).validate()
    sps, pps = build_sps_info(p), build_pps_info(p)
    assert sps.max_transform_hierarchy_depth_inter == 1
    rng = np.random.default_rng(7)
    per_ctu = []
    for i, (cx, cy) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
        x0, y0 = cx * 32, cy * 32
        cu = CodedCU(x0, y0, 5, (1,), 4, is_inter=True,
                     mv=(int(rng.integers(-32, 32)),
                         int(rng.integers(-32, 32))),
                     inter_dir=1)
        if i == 0:
            # TU16-split residual quad (the 32x32 inter merge shape)
            cu.tu_split = True
            for (dx, dy) in ((0, 0), (16, 0), (0, 16), (16, 16)):
                cu.coeffs[(0, x0 + dx, y0 + dy, 4)] = rand_levels(rng, 4)
            cu.coeffs[(1, x0 >> 1, (y0 >> 1) + 8, 3)] = rand_levels(rng, 3)
        elif i == 1:
            # genuine TU32 inter residual
            cu.coeffs[(0, x0, y0, 5)] = rand_levels(rng, 5, 0.05)
        per_ctu.append(((cx, cy), [cu]))
    got = _roundtrip(per_ctu, sps, pps, 1)
    for ((cx, cy), cus), ((_, _), gcus) in zip(per_ctu, got):
        a, b = cus[0], gcus[0]
        assert (a.x0, a.y0, a.log2_size, a.mv) == \
            (b.x0, b.y0, b.log2_size, b.mv)
        has_resi = any(np.any(v) for v in a.coeffs.values())
        if has_resi:
            assert a.tu_split == b.tu_split
        a_nz = {k: v for k, v in a.coeffs.items() if np.any(v)}
        assert set(a_nz) == set(b.coeffs)
        for k in a_nz:
            assert np.array_equal(a_nz[k], b.coeffs[k])
