"""Lossless (transquant bypass): decoded output == source exactly."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_inter import moving_scene


@pytest.mark.parametrize("bframes,wpp", [(0, False), (2, True)])
def test_lossless_exact(bframes, wpp):
    frames = moving_scene(96, 64, 4, seed=7)
    p = default_params(96, 64, qp=30, keyframe_max=250,
                       bframes=bframes, lossless=True, wpp=wpp)
    enc = Encoder(p)
    assert p.deblock is False and p.sao is False   # validate() forced
    out = []
    for f in frames:
        out.extend(enc.encode_frame(*f))
    out.extend(enc.flush())
    pics = Decoder().decode(b"".join(f.bitstream for f in out))
    by_poc = {f.poc: f for f in out}
    assert len(pics) == 4
    for p_ in pics:
        src = frames[by_poc[p_.poc].disp]
        assert np.array_equal(p_.y, src[0])
        assert np.array_equal(p_.u, src[1])
        assert np.array_equal(p_.v, src[2])
        assert p_.md5 == p_.sei_md5


def test_lossless_intra_only():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    u = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    v = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    p = default_params(96, 64, keyframe_max=1, lossless=True)
    [f] = Encoder(p).encode_frame(y, u, v)
    pics = Decoder().decode(f.bitstream)
    assert np.array_equal(pics[0].y, y)
    assert np.array_equal(pics[0].u, u)
    assert np.array_equal(pics[0].v, v)
