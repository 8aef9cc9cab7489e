"""Variable CU-tree RDO (rd_level >= 3): true 32x32 intra CUs with TU32
luma / TU16 chroma, decode-bit-exact against the validation decoder."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def scene(w, h, seed=3):
    """Near-flat half (should pick 32 CUs) + noisy half (16s)."""
    rng = np.random.default_rng(seed)
    y = (80.0 + np.linspace(0, 6, w)[None, :]
         + np.zeros((h, 1))).astype(np.float64)
    y[:, w // 2:] += rng.integers(0, 90, (h, w // 2))
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.clip(np.linspace(100, 140, w // 2)[None, :]
                + np.zeros((h // 2, 1)), 0, 255).astype(np.uint8)
    v = np.full((h // 2, w // 2), 132, np.uint8)
    return y, u, v


@pytest.mark.parametrize("ctu", [32, 64])
def test_tree_intra_e2e_bit_exact(ctu):
    w, h = 96, 64
    y, u, v = scene(w, h)
    p = default_params(w, h, qp=30, keyframe_max=1, ctu_size=ctu,
                       rd_level=3)
    p.validate()
    assert p.var_cu_tree and p.max_tu_size == 32
    enc = Encoder(p)
    [f] = enc.encode_frame(y, u, v)
    pics = Decoder().decode(f.bitstream)
    assert len(pics) == 1
    assert pics[0].md5 == f.md5 == pics[0].sei_md5
    assert np.array_equal(pics[0].y, f.recon[0])
    assert np.array_equal(pics[0].u, f.recon[1])
    assert np.array_equal(pics[0].v, f.recon[2])


def test_tree_emits_32_cus_on_smooth_content():
    from x265_mod_by_patman_tpu.analysis.intra_mode import decide_modes_tree
    w, h = 96, 64
    y, u, v = scene(w, h)
    p = default_params(w, h, qp=32, keyframe_max=1, ctu_size=32,
                       rd_level=3).validate()
    enc = Encoder(p)
    modes, sm, m8, split32, mode32, _c, _cb = decide_modes_tree(
        y, enc.sps, 32)
    # smooth left half should produce at least one unsplit 32 CU
    assert (~split32[:, : (w // 2) // 32]).any()
    # and the stream still decodes bit-exact with that exact map
    [f] = enc.encode_frame(y, u, v)
    pics = Decoder().decode(f.bitstream)
    assert pics[0].md5 == f.md5


def test_tree_with_nxn_and_aq_e2e():
    w, h = 96, 64
    y, u, v = scene(w, h, seed=9)
    p = default_params(w, h, qp=30, keyframe_max=1, ctu_size=32,
                       rd_level=3, nxn_intra=True, aq_mode=2,
                       rc_mode="crf", crf=28)
    p.validate()
    enc = Encoder(p)
    [f] = enc.encode_frame(y, u, v)
    pics = Decoder().decode(f.bitstream)
    assert pics[0].md5 == f.md5 == pics[0].sei_md5


def test_tree_inter_gop_e2e():
    from tests.test_e2e_inter import moving_scene
    frames = moving_scene(96, 64, 6, seed=5)
    p = default_params(96, 64, qp=30, keyframe_max=250, bframes=2,
                       rd_level=3)
    p.validate()
    assert p.var_cu_tree
    enc = Encoder(p)
    stream = b""
    encoded = []
    for (y, u, v) in frames:
        for f in enc.encode_frame(y, u, v):
            stream += f.bitstream
            encoded.append(f)
    for f in enc.flush():
        stream += f.bitstream
        encoded.append(f)
    pics = Decoder().decode(stream)
    assert len(pics) == len(frames)
    for pic in pics:
        assert pic.md5 == pic.sei_md5


def test_tree_odd_16block_width_e2e():
    """Regression: widths that are an odd multiple of 16 (nbx odd) have
    n32x = nbx//2 regions per row; the native walker must use that
    stride for split32/mode32 (a ceil stride mis-read every region row
    past the first and shipped corrupt streams)."""
    w, h = 112, 80
    y, u, v = scene(w, h, seed=3)
    p = default_params(w, h, qp=30, keyframe_max=1, rd_level=3)
    enc = Encoder(p)
    [f] = enc.encode_frame(y, u, v)
    pics = Decoder().decode(f.bitstream)
    assert pics[0].md5 == pics[0].sei_md5 == f.md5
