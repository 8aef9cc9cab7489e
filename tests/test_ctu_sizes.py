"""CTU 16/32/64: wavefront z-order and syntax agree at every size."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_inter import moving_scene


@pytest.mark.parametrize("ctu", [16, 64])
def test_intra_ctu_size(ctu):
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (128, 128)).astype(np.uint8)
    u = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    p = default_params(128, 128, qp=32, keyframe_max=1, ctu_size=ctu,
                       wpp=(ctu == 64))
    enc = Encoder(p)
    [f] = enc.encode_frame(y, u, u)
    pics = Decoder().decode(f.bitstream)
    assert np.array_equal(pics[0].y, f.recon[0])
    assert np.array_equal(pics[0].u, f.recon[1])
    assert pics[0].md5 == f.md5 == pics[0].sei_md5


def test_inter_gop_ctu64():
    w, h = 128, 128
    frames = moving_scene(w, h, 4, seed=6)
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=2,
                       ctu_size=64)
    enc = Encoder(p)
    out = []
    for f in frames:
        out.extend(enc.encode_frame(*f))
    out.extend(enc.flush())
    pics = Decoder().decode(b"".join(f.bitstream for f in out))
    by = {f.poc: f for f in out}
    for p_ in pics:
        f = by[p_.poc]
        assert np.array_equal(p_.y, f.recon[0])
        assert p_.md5 == f.md5 == p_.sei_md5
