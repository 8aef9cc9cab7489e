"""End-to-end intra encode -> validation decode.

The north-star config-1 shape (intra-only CQP; SURVEY.md §6): the decoded
pictures must be BIT-EXACT to the encoder's own reconstruction, and the
decoded-picture-hash SEI must match (reference mechanism sei.h:729).
"""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder, encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def synth_frame(w, h, seed=0, motion=0):
    """Gradients + boxes + noise: enough structure to exercise many modes."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (xx * 255 // max(1, w) + yy * 80 // max(1, h) + motion * 3) % 256
    y[h // 4 + motion:h // 2 + motion, w // 4:w // 2] = 200
    y = np.clip(y + rng.integers(-8, 9, (h, w)), 0, 255).astype(np.uint8)
    u = ((xx[::2, ::2] + 2 * yy[::2, ::2]) % 200 + 20).astype(np.uint8)
    v = ((2 * xx[::2, ::2] - yy[::2, ::2]) % 180 + 30).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("size,qp", [((64, 64), 32), ((96, 48), 22),
                                     ((160, 96), 37)])
def test_e2e_intra_bit_exact(size, qp):
    w, h = size
    p = default_params(w, h, qp=qp, keyframe_max=1)
    frames = [synth_frame(w, h, seed=i, motion=i) for i in range(2)]
    stream, encoded = encode_sequence(p, frames)

    dec = Decoder()
    pics = dec.decode(stream)
    assert len(pics) == 2
    for f, pic in zip(encoded, pics):
        ry, ru, rv = f.recon
        assert np.array_equal(pic.y, ry), "luma recon mismatch"
        assert np.array_equal(pic.u, ru), "cb recon mismatch"
        assert np.array_equal(pic.v, rv), "cr recon mismatch"
        assert pic.sei_md5 is not None
        assert pic.md5 == f.md5 == pic.sei_md5


def test_recon_quality():
    """Sanity: recon PSNR must be reasonable for the QP."""
    w, h = 96, 64
    p = default_params(w, h, qp=27, keyframe_max=1)
    y, u, v = synth_frame(w, h, seed=3)
    enc = Encoder(p)
    [f] = enc.encode_frame(y, u, v)
    mse = np.mean((f.recon[0].astype(np.int64) - y.astype(np.int64)) ** 2)
    psnr = 10 * np.log10(255 * 255 / max(mse, 1e-9))
    assert psnr > 30, f"luma PSNR {psnr:.2f} too low"
    # and the bitstream is non-trivially compressed vs raw
    assert len(f.bitstream) < w * h * 1.5
