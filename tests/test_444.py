"""4:4:4 chroma format end-to-end (Main 4:4:4 / RExt)."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params, CHROMA_444
from x265_mod_by_patman_tpu.encoder.top import encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def synth444(w, h, seed=0, motion=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx + motion) * 255 // max(1, w) + yy * 80 // max(1, h)) % 256
    y = np.clip(y + rng.integers(-20, 21, (h, w)), 0, 255)
    u = ((xx * 2 + yy + motion) % 200 + 20
         + rng.integers(-10, 11, (h, w)))
    v = ((2 * xx - yy - motion) % 180 + 30
         + rng.integers(-10, 11, (h, w)))
    return (y.astype(np.uint8), np.clip(u, 0, 255).astype(np.uint8),
            np.clip(v, 0, 255).astype(np.uint8))


def _check(stream, encoded, n, reorder=False):
    pics = Decoder().decode(stream)
    assert len(pics) == n
    if reorder:
        pics = sorted(pics, key=lambda pc: pc.poc)
        pairs = [( {f.disp: f for f in encoded}[pc.poc], pc)
                 for pc in pics]
    else:
        pairs = list(zip(encoded, pics))     # decode order
    for f, pc in pairs:
        assert pc.u.shape == pc.y.shape          # full-size chroma
        assert np.array_equal(pc.y, f.recon[0]), pc.poc
        assert np.array_equal(pc.u, f.recon[1]), pc.poc
        assert np.array_equal(pc.v, f.recon[2]), pc.poc
        assert pc.md5 == f.md5 == pc.sei_md5, pc.poc
    return pics


def test_444_intra():
    w, h = 96, 64
    p = default_params(w, h, qp=30, keyframe_max=1,
                       internal_csp=CHROMA_444, sao=False,
                       deblock=False)
    frames = [synth444(w, h, seed=i) for i in range(2)]
    stream, encoded = encode_sequence(p, frames)
    dec = Decoder()
    pics = dec.decode(stream)
    assert dec.sps.chroma_format_idc == 3
    assert dec.sps.ptl.profile_idc == 4
    _check(stream, encoded, 2)


def test_444_intra_loopfilters():
    w, h = 64, 64
    p = default_params(w, h, qp=32, keyframe_max=1,
                       internal_csp=CHROMA_444, sao=True, deblock=True)
    frames = [synth444(w, h, seed=3)]
    stream, encoded = encode_sequence(p, frames)
    _check(stream, encoded, 1)


def test_444_inter_gop():
    w, h = 64, 64
    p = default_params(w, h, qp=32, keyframe_max=250, bframes=1,
                       internal_csp=CHROMA_444, scenecut=False,
                       cu_tree=False, aq_mode=0)
    frames = [synth444(w, h, seed=5, motion=3 * i) for i in range(4)]
    stream, encoded = encode_sequence(p, frames)
    types = sorted(f.slice_type for f in encoded)
    assert "P" in types
    _check(stream, encoded, 4, reorder=True)


def test_444_rejects_420_coupled_tools():
    with pytest.raises(AssertionError):
        default_params(64, 64, internal_csp=CHROMA_444,
                       nxn_intra=True).validate()
    with pytest.raises(AssertionError):
        default_params(64, 64, internal_csp=CHROMA_444,
                       mcstf=True).validate()
