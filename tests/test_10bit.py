"""10-bit (Main10) end-to-end: encode -> decode bit-exact, hash SEI."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder, encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def synth10(w, h, seed=0, motion=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx + motion) * 1023 // max(1, w) + yy * 300 // max(1, h)) % 1024
    y = np.clip(y + rng.integers(-30, 31, (h, w)), 0, 1023).astype(np.uint16)
    u = ((xx[::2, ::2] * 2 + yy[::2, ::2]) % 800 + 100).astype(np.uint16)
    v = ((xx[::2, ::2] - 2 * yy[::2, ::2]) % 700 + 150).astype(np.uint16)
    return y, u, v


def test_10bit_intra():
    w, h = 96, 64
    p = default_params(w, h, qp=30, keyframe_max=1, internal_bit_depth=10)
    frames = [synth10(w, h, seed=i) for i in range(2)]
    stream, encoded = encode_sequence(p, frames)
    dec = Decoder()
    pics = dec.decode(stream)
    assert dec.sps.bit_depth == 10
    assert dec.sps.ptl.profile_idc == 2          # Main10
    for f, pic in zip(encoded, pics):
        assert pic.y.dtype == np.uint16
        assert np.array_equal(pic.y, f.recon[0])
        assert np.array_equal(pic.u, f.recon[1])
        assert np.array_equal(pic.v, f.recon[2])
        assert pic.md5 == f.md5 == pic.sei_md5
    # quality sanity at qp30 on 10-bit content
    mse = np.mean((encoded[0].recon[0].astype(np.int64)
                   - frames[0][0].astype(np.int64)) ** 2)
    psnr = 10 * np.log10(1023 * 1023 / max(mse, 1e-9))
    assert psnr > 38, psnr


def test_10bit_inter_gop():
    w, h = 64, 64
    p = default_params(w, h, qp=32, keyframe_max=250, bframes=1,
                       internal_bit_depth=10)
    frames = [synth10(w, h, seed=3, motion=3 * i) for i in range(4)]
    stream, encoded = encode_sequence(p, frames)
    types = sorted(f.slice_type for f in encoded)
    assert "B" in types and "P" in types
    pics = Decoder().decode(stream)
    for f, pic in zip(encoded, pics):
        assert np.array_equal(pic.y, f.recon[0])
        assert pic.md5 == f.md5 == pic.sei_md5
