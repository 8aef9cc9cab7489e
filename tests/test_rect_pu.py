"""Rect (2NxN / Nx2N) inter PU syntax roundtrip + e2e decode
(x265 analysis.cpp checkInter_rd0_4 per-PU shapes; spec 7.3.8.6)."""
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


def make_rect_cus(rng, width, height, bi=False):
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
                def rmv():
                    if rng.random() < 0.4:
                        return base_mv
                    return (int(rng.integers(-64, 64)),
                            int(rng.integers(-64, 64)))
                if r < 0.2:
                    cu = CodedCU(x0, y0, 4, (1,), 4, {}, is_inter=True,
                                 mv=rmv(), ref_idx=0)
                elif r < 0.6:
                    pm = 1 if rng.random() < 0.5 else 2
                    cu = CodedCU(x0, y0, 4, (1,), 4, {}, is_inter=True,
                                 part_mode=pm,
                                 mv=rmv(), ref_idx=0,
                                 mv_b=rmv(), ref_idx_b=0)
                    if bi and rng.random() < 0.5:
                        cu.inter_dir = 3
                        cu.mv1 = rmv()
                        cu.inter_dir_b = 2
                        cu.mv1_b = rmv()
                    if rng.random() < 0.6:
                        cu.coeffs[(0, x0, y0, 4)] = rand_levels(rng, 4)
                    if rng.random() < 0.3:
                        cu.coeffs[(1, x0 >> 1, y0 >> 1, 3)] = \
                            rand_levels(rng, 3)
                else:
                    cu = CodedCU(x0, y0, 4,
                                 (int(rng.integers(0, 35)),), 4)
                cus.append(cu)
            per_ctu.append(((cx, cy), cus))
    return per_ctu


@pytest.mark.parametrize("slice_type,seed", [(1, 0), (1, 1), (0, 2)])
def test_rect_syntax_roundtrip(slice_type, seed):
    w, h = 96, 64
    p = default_params(w, h, ctu_size=32, qp=30, sign_hide=False).validate()
    sps = build_sps_info(p)
    pps = build_pps_info(p)
    rng = np.random.default_rng(seed)
    num_refs = (1, 1) if slice_type == 0 else (1, 0)
    ref_pocs = ((0,), (4,)) if slice_type == 0 else ((0,), ())
    per_ctu = make_rect_cus(rng, sps.width, sps.height,
                            bi=(slice_type == 0))

    enc = SliceSyntaxEncoder(sps, pps, 30, slice_type=slice_type,
                             num_refs=num_refs, ref_pocs=ref_pocs,
                             cur_poc=2)
    ir = BinIR()
    for i, ((cx, cy), cus) in enumerate(per_ctu):
        enc.encode_ctu(ir, cus, cx, cy, last_ctu=(i == len(per_ctu) - 1))
    states = init_states(slice_type, 30)
    bw = BitWriter()
    cab = CabacEncoder(bw)
    bins, ctx = ir.arrays()
    cab.encode_stream(bins, ctx, states)
    cab.finish()
    bw.rbsp_trailing_bits()
    data = bw.get_bytes()

    dec = SliceSyntaxDecoder(CabacDecoder(data),
                             init_states(slice_type, 30),
                             sps, pps, 30, slice_type=slice_type,
                             num_refs=num_refs, ref_pocs=ref_pocs,
                             cur_poc=2)
    n_rect = 0
    for i, ((cx, cy), cus) in enumerate(per_ctu):
        got, end, _ = dec.decode_ctu(cx, cy)
        assert len(got) == len(cus)
        for a, b in zip(cus, got):
            assert (a.x0, a.y0, a.is_inter) == (b.x0, b.y0, b.is_inter)
            if a.is_inter:
                assert getattr(a, "part_mode", 0) == b.part_mode, \
                    (a.x0, a.y0)
                for pu in range(2 if a.part_mode else 1):
                    assert a.motion(pu) == b.motion(pu), \
                        (a.x0, a.y0, pu, a.motion(pu), b.motion(pu))
                n_rect += a.part_mode != 0
            a_nz = {k: v for k, v in a.coeffs.items() if np.any(v)}
            assert set(a_nz) == set(b.coeffs), (a.x0, a.y0)
            for k in a_nz:
                assert np.array_equal(a_nz[k], b.coeffs[k])
    assert np.array_equal(states, dec.states)
    assert n_rect > 4, "test should exercise rect partitions"


def _band_clip(rng, w, h, n, horizontal=True):
    """Two bands moving differently, boundary mid-block on the 8 grid
    (the content shape rect PUs exist for)."""
    big = rng.integers(0, 255, (h + 64, w + 64)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
           + np.roll(big, (1, 1), (0, 1))) // 4
    frames = []
    B = 40
    for i in range(n):
        y = np.empty((h, w), np.int32)
        if horizontal:
            y[:B] = big[4:4 + B, 3 * i:3 * i + w]
            y[B:] = big[8 + B + 2 * i:8 + h + 2 * i, 5:5 + w]
        else:
            y[:, :B] = big[3 * i:3 * i + h, 4:4 + B]
            y[:, B:] = big[5:5 + h, 8 + B + 2 * i:8 + w + 2 * i]
        u = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((np.clip(y, 0, 255).astype(np.uint8), u, u))
    return frames


@pytest.mark.parametrize("horizontal", [True, False])
def test_rect_e2e_bitexact_and_used(horizontal):
    from x265_mod_by_patman_tpu.encoder.top import Encoder
    from x265_mod_by_patman_tpu.decoder import decoder as decmod
    rng = np.random.default_rng(4)
    w, h = 96, 64
    frames = _band_clip(rng, w, h, 4, horizontal)
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=0,
                       rect=True, scenecut=False, weightp=False)
    enc = Encoder(p)
    out = []
    for f in frames:
        out.extend(enc.encode_frame(*f))
    out.extend(enc.flush())
    bs = enc.headers() + b"".join(f.bitstream for f in out)

    count = [0, 0, 0]
    orig = decmod.Decoder._recon_cu

    def patched(self, cu, *a, **k):
        if cu.is_inter:
            count[getattr(cu, "part_mode", 0)] += 1
        return orig(self, cu, *a, **k)

    decmod.Decoder._recon_cu = patched
    try:
        pics = decmod.Decoder().decode(bs)
    finally:
        decmod.Decoder._recon_cu = orig
    by = {f.disp: f for f in out}
    for pc in pics:
        f = by[pc.poc]
        assert pc.sei_md5 == pc.md5
        assert np.array_equal(pc.y, f.recon[0])
        assert np.array_equal(pc.u, f.recon[1])
        assert np.array_equal(pc.v, f.recon[2])
    want = 1 if horizontal else 2
    assert count[want] > 0, count    # the matching orientation is used
