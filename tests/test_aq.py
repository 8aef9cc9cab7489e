"""Adaptive quantization (aq-mode 1) + cu_qp_delta: bit-exact e2e."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder, encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_intra import synth_frame
from tests.test_e2e_inter import moving_scene


def mixed_content(w, h, seed=0):
    """Half flat gradient, half noisy texture: AQ should spread QPs."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (xx * 2 + yy) % 200 + 20
    y[:, w // 2:] = rng.integers(0, 256, (h, w - w // 2))
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    return np.clip(y, 0, 255).astype(np.uint8), u, v


@pytest.mark.parametrize("wpp", [True, False])
def test_aq_intra_bit_exact(wpp):
    w, h = 160, 96
    p = default_params(w, h, qp=32, keyframe_max=1, aq_mode=1,
                       aq_strength=1.5, wpp=wpp)
    y, u, v = mixed_content(w, h)
    enc = Encoder(p)
    [f] = enc.encode_frame(y, u, v)
    pics = Decoder().decode(f.bitstream)
    assert np.array_equal(pics[0].y, f.recon[0])
    assert np.array_equal(pics[0].u, f.recon[1])
    assert np.array_equal(pics[0].v, f.recon[2])
    assert pics[0].md5 == f.md5 == pics[0].sei_md5
    # the AQ map should actually vary across this content
    qmap = enc._aq_map(enc._pad(y, 0), 32)
    assert qmap.min() < 32 < qmap.max()


def test_aq_inter_gop_bit_exact():
    w, h = 96, 64
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=2,
                       aq_mode=1)
    frames = moving_scene(w, h, 5, seed=21)
    stream, encoded = encode_sequence(p, frames)
    pics = Decoder().decode(stream)
    for f, pic in zip(encoded, pics):
        assert np.array_equal(pic.y, f.recon[0]), f.poc
        assert pic.md5 == f.md5 == pic.sei_md5
