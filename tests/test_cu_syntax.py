"""CTU/CU syntax roundtrip: CodedCU list -> slice-data bins -> parse."""
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


def make_cus(rng, width, height, ctu_size, depth_choices=(16, 16, 8, 32)):
    """Random CU layout over the frame; per-CTU z-order lists."""
    per_ctu = []
    for cy in range(-(-height // ctu_size)):
        for cx in range(-(-width // ctu_size)):
            cus = []

            def emit(x0, y0, size):
                if x0 >= width or y0 >= height:
                    return
                if x0 + size > width or y0 + size > height:
                    for dx in (0, size // 2):
                        for dy in (0, size // 2):
                            emit(x0 + dx, y0 + dy, size // 2)
                    return
                choice = int(rng.choice(depth_choices))
                if size > choice and size > 8:
                    for (dx, dy) in ((0, 0), (size // 2, 0), (0, size // 2),
                                     (size // 2, size // 2)):
                        emit(x0 + dx, y0 + dy, size // 2)
                    return
                log2 = size.bit_length() - 1
                nxn = size == 8 and rng.random() < 0.3
                n_modes = 4 if nxn else 1
                modes = tuple(int(m) for m in rng.integers(0, 35, n_modes))
                chroma_idx = int(rng.choice([4, 4, 0, 1, 2, 3]))
                cu = CodedCU(x0, y0, log2, modes, chroma_idx)
                # luma TU(s)
                if nxn:
                    h = size // 2
                    for k, (dx, dy) in enumerate(((0, 0), (h, 0), (0, h),
                                                  (h, h))):
                        if rng.random() < 0.8:
                            cu.coeffs[(0, x0 + dx, y0 + dy, log2 - 1)] = \
                                rand_levels(rng, log2 - 1)
                    if rng.random() < 0.8:
                        cu.coeffs[(1, x0 >> 1, y0 >> 1, 2)] = rand_levels(rng, 2)
                    if rng.random() < 0.8:
                        cu.coeffs[(2, x0 >> 1, y0 >> 1, 2)] = rand_levels(rng, 2)
                else:
                    if rng.random() < 0.9:
                        cu.coeffs[(0, x0, y0, log2)] = rand_levels(rng, log2)
                    for c in (1, 2):
                        if rng.random() < 0.6:
                            cu.coeffs[(c, x0 >> 1, y0 >> 1, log2 - 1)] = \
                                rand_levels(rng, log2 - 1)
                cus.append(cu)

            emit(cx * ctu_size, cy * ctu_size, ctu_size)
            per_ctu.append(((cx, cy), cus))
    return per_ctu


@pytest.mark.parametrize("size", [(64, 64), (80, 48)])
def test_ctu_syntax_roundtrip(size):
    w, h = size
    p = default_params(w, h, ctu_size=32, qp=30, sign_hide=False).validate()
    sps = build_sps_info(p)
    pps = build_pps_info(p)
    rng = np.random.default_rng(w + h)
    per_ctu = make_cus(rng, sps.width, sps.height, p.ctu_size)

    enc = SliceSyntaxEncoder(sps, pps, 30)
    ir = BinIR()
    for i, ((cx, cy), cus) in enumerate(per_ctu):
        enc.encode_ctu(ir, cus, cx, cy, last_ctu=(i == len(per_ctu) - 1))
    states = init_states(2, 30)
    bw = BitWriter()
    cab = CabacEncoder(bw)
    bins, ctx = ir.arrays()
    cab.encode_stream(bins, ctx, states)
    cab.finish()
    bw.rbsp_trailing_bits()
    data = bw.get_bytes()

    dec = SliceSyntaxDecoder(CabacDecoder(data), init_states(2, 30),
                             sps, pps, 30)
    for i, ((cx, cy), cus) in enumerate(per_ctu):
        got, end, _ = dec.decode_ctu(cx, cy)
        assert end == (1 if i == len(per_ctu) - 1 else 0)
        assert len(got) == len(cus)
        for a, b in zip(cus, got):
            assert (a.x0, a.y0, a.log2_size) == (b.x0, b.y0, b.log2_size)
            assert a.luma_modes == b.luma_modes, (a.x0, a.y0)
            assert a.chroma_idx == b.chroma_idx
            a_nz = {k: v for k, v in a.coeffs.items() if np.any(v)}
            assert set(a_nz) == set(b.coeffs), (a.x0, a.y0)
            for k in a_nz:
                assert np.array_equal(a_nz[k], b.coeffs[k])
    assert np.array_equal(states, dec.states)
