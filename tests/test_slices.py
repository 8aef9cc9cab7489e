"""--slices N: banded multi-slice pictures, bit-exact roundtrip."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from x265_mod_by_patman_tpu.bitstream.nal import split_annexb
from tests.test_e2e_inter import moving_scene


@pytest.mark.parametrize("ns", [2, 3])
def test_slices_intra(ns):
    rng = np.random.default_rng(7)
    w, h = 96, 96
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    # ctu 32 so 96 rows give >= 3 CTU rows (slices are CTU-row bands;
    # at the ctu-64 default this clip has only 2 rows)
    p = default_params(w, h, qp=30, keyframe_max=1, slices=ns, wpp=False,
                       ctu_size=32)
    enc = Encoder(p)
    [f] = enc.encode_frame(y, u, v)
    vcl = [n for n in split_annexb(f.bitstream)
           if ((n[0] >> 1) & 0x3F) < 32]
    assert len(vcl) == ns
    pics = Decoder().decode(f.bitstream)
    assert len(pics) == 1
    assert np.array_equal(pics[0].y, f.recon[0])
    assert np.array_equal(pics[0].u, f.recon[1])
    assert np.array_equal(pics[0].v, f.recon[2])
    assert pics[0].md5 == f.md5 == pics[0].sei_md5


def test_slices_inter_gop():
    w, h = 96, 96
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=2,
                       slices=2, wpp=False)
    enc = Encoder(p)
    out = []
    for (y, u, v) in moving_scene(w, h, 5, seed=10):
        out.extend(enc.encode_frame(y, u, v))
    out.extend(enc.flush())
    pics = Decoder().decode(b"".join(f.bitstream for f in out))
    assert len(pics) == 5
    by = {f.poc: f for f in out}
    for p_ in pics:
        f = by[p_.poc]
        assert np.array_equal(p_.y, f.recon[0]), p_.poc
        assert p_.md5 == f.md5 == p_.sei_md5
