"""4x4 DST luma TUs: voluntary TU4 split of NxN 8x8 TUs
(--nxn-intra + --tu-intra-depth 2), with the spec 7.3.8.8 depth-1
split_transform_flag, DST transform, per-TB re-prediction, and
bit-exact decode."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import encode_sequence


def detail_frame(w=64, h=64, seed=6):
    """Micro-detail content where 4x4 DST TBs genuinely win: sparse
    random impulses + short strokes with locally varying orientation.
    (The old regular 3/5/7-px diagonal lattice stopped splitting once
    the NxN decision moved to real transform RD — a periodic pattern
    is exactly what a big DCT codes well, so the RD gate rightly keeps
    TU16 there.)"""
    rng = np.random.default_rng(seed)
    y = np.full((h, w), 120, np.int32)
    for by in range(h // 8):
        for bx in range(w // 8):
            x0, y0 = bx * 8, by * 8
            for _ in range(int(rng.integers(1, 4))):
                ox, oy = rng.integers(0, 8, 2)
                ln = int(rng.integers(2, 5))
                dx, dy = [(1, 0), (0, 1), (1, 1),
                          (1, -1)][int(rng.integers(0, 4))]
                for t in range(ln):
                    px = int(np.clip(x0 + ox + t * dx, 0, w - 1))
                    py = int(np.clip(y0 + oy + t * dy, 0, h - 1))
                    y[py, px] = int(rng.choice([20, 235]))
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    return (np.clip(y, 0, 255).astype(np.uint8), u, v)


def _decode_counting_tu4(stream):
    from x265_mod_by_patman_tpu.decoder import decoder as decmod
    n_tu4 = [0]
    orig = decmod.Decoder._recon_tb

    def patched(self, plane, x0, y0, log2, mode, c_idx, qp, levels):
        if log2 == 2 and c_idx == 0:
            n_tu4[0] += 1
        return orig(self, plane, x0, y0, log2, mode, c_idx, qp, levels)

    decmod.Decoder._recon_tb = patched
    try:
        pics = decmod.Decoder().decode(stream)
    finally:
        decmod.Decoder._recon_tb = orig
    return pics, n_tu4[0]


def test_tu4_dst_e2e_bit_exact_and_used():
    frames = [detail_frame()]
    p = default_params(64, 64, qp=30, keyframe_max=1, nxn_intra=True,
                       tu_intra_depth=2, sao=False, deblock=False,
                       aq_mode=0, cu_tree=False)
    stream, encoded = encode_sequence(p, frames)
    pics, n_tu4 = _decode_counting_tu4(stream)
    assert len(pics) == 1
    f = encoded[0]
    assert np.array_equal(pics[0].y, f.recon[0])
    assert np.array_equal(pics[0].u, f.recon[1])
    assert np.array_equal(pics[0].v, f.recon[2])
    assert pics[0].md5 == f.md5 == pics[0].sei_md5
    assert n_tu4 > 0, "detail content should elicit TU4 DST leaves"


def test_tu4_depth1_keeps_tu8_streams_compatible():
    """tu_intra_depth=1 (default): streams identical to before (no
    depth-1 flags coded), still bit-exact."""
    frames = [detail_frame(seed=7)]
    p = default_params(64, 64, qp=30, keyframe_max=1, nxn_intra=True,
                       sao=False, deblock=False, aq_mode=0,
                       cu_tree=False)
    stream, encoded = encode_sequence(p, frames)
    pics, n_tu4 = _decode_counting_tu4(stream)
    assert n_tu4 == 0
    assert pics[0].md5 == encoded[0].md5 == pics[0].sei_md5


def test_tu4_rd_estimator_prefers_dst_on_diagonal_detail():
    from x265_mod_by_patman_tpu.analysis.intra_mode import (
        decide_tu4_split, decide_modes_split)
    from x265_mod_by_patman_tpu.bitstream.headers import build_sps_info
    y, _, _ = detail_frame()
    p = default_params(64, 64, qp=30, nxn_intra=True,
                       tu_intra_depth=2).validate()
    sps = build_sps_info(p)
    modes, split_map, modes8 = decide_modes_split(y, sps, 30)
    if split_map.any():
        tu4 = decide_tu4_split(y, sps, 30, modes8, split_map)
        assert tu4.shape == split_map.shape + (4,)
        assert not tu4[~split_map].any()
