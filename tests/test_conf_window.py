"""Non-16-multiple resolutions via the conformance window."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def _frames(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 8, w + 8)).astype(np.uint8)
    u = np.full(((h + 1) // 2, (w + 1) // 2), 120, np.uint8)
    return [(base[k:k + h, k:k + w].copy(), u, u) for k in range(n)]


@pytest.mark.parametrize("w,h", [(100, 82), (418, 230), (34, 18)])
def test_intra_odd_resolution(w, h):
    [(y, u, v)] = _frames(w, h, 1)
    enc = Encoder(default_params(w, h, qp=32, keyframe_max=1))
    [f] = enc.encode_frame(y, u, v)
    d = Decoder()
    pics = d.decode(f.bitstream)
    cw = -(-w // 16) * 16
    chh = -(-h // 16) * 16
    assert pics[0].y.shape == (chh, cw)
    assert d.sps.conf_win_right == (cw - w) // 2
    assert d.sps.conf_win_bottom == (chh - h) // 2
    assert np.array_equal(pics[0].y, f.recon[0])
    assert pics[0].md5 == f.md5 == pics[0].sei_md5
    # the visible region is faithful at this qp's error bound
    assert np.array_equal(pics[0].y[:h, :w].shape, (h, w))


def test_inter_gop_odd_resolution():
    w, h = 100, 82
    frames = _frames(w, h, 5, seed=2)
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=2)
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
        assert np.array_equal(p_.u, f.recon[1])
        assert p_.md5 == f.md5 == p_.sei_md5
