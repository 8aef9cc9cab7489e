"""12-bit internal (Main 4:2:0 12 / RExt) end-to-end."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def synth12(w, h, seed=0, motion=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx + motion) * 4095 // max(1, w) + yy * 900 // max(1, h)) % 4096
    y = np.clip(y + rng.integers(-100, 101, (h, w)), 0,
                4095).astype(np.uint16)
    u = ((xx[::2, ::2] * 6 + yy[::2, ::2]) % 3000 + 500).astype(np.uint16)
    v = ((xx[::2, ::2] - 5 * yy[::2, ::2]) % 2800 + 600).astype(np.uint16)
    return y, u, v


def test_12bit_intra():
    w, h = 96, 64
    p = default_params(w, h, qp=30, keyframe_max=1,
                       internal_bit_depth=12)
    frames = [synth12(w, h, seed=i) for i in range(2)]
    stream, encoded = encode_sequence(p, frames)
    dec = Decoder()
    pics = dec.decode(stream)
    assert dec.sps.bit_depth == 12
    assert dec.sps.ptl.profile_idc == 4          # RExt (Main12)
    for f, pic in zip(encoded, pics):
        assert pic.y.dtype == np.uint16
        assert np.array_equal(pic.y, f.recon[0])
        assert np.array_equal(pic.u, f.recon[1])
        assert np.array_equal(pic.v, f.recon[2])
        assert pic.md5 == f.md5 == pic.sei_md5
    mse = np.mean((encoded[0].recon[0].astype(np.int64)
                   - frames[0][0].astype(np.int64)) ** 2)
    psnr = 10 * np.log10(4095 * 4095 / max(mse, 1e-9))
    assert psnr > 44, psnr


def test_12bit_inter_gop():
    w, h = 64, 64
    p = default_params(w, h, qp=32, keyframe_max=250, bframes=1,
                       internal_bit_depth=12)
    frames = [synth12(w, h, seed=3, motion=3 * i) for i in range(4)]
    stream, encoded = encode_sequence(p, frames)
    types = sorted(f.slice_type for f in encoded)
    assert "B" in types and "P" in types
    pics = sorted(Decoder().decode(stream), key=lambda pc: pc.poc)
    by = {f.disp: f for f in encoded}
    for pc in pics:
        f = by[pc.poc]
        assert np.array_equal(pc.y, f.recon[0]), pc.poc
        assert pc.md5 == f.md5 == pc.sei_md5
