"""Sequential row-band analysis (the >1080p memory path): banded
P/B analysis must produce full-shape outputs and a stream that decodes
bit-exact (band-edge clamping is decision-only by construction)."""
import numpy as np

import x265_mod_by_patman_tpu.analysis.inter_mode as im
from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def _clip(n, w=128, h=96):
    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, (h, w), np.uint8)
    out = []
    for i in range(n):
        y = np.roll(base, 3 * i, axis=1)
        u = np.full((h // 2, w // 2), 100, np.uint8)
        v = np.full((h // 2, w // 2), 140 + i, np.uint8)
        out.append((y, u, v))
    return out


def test_banded_analysis_e2e_bit_exact(monkeypatch):
    # force banding at a tiny size: threshold becomes 8*135 blocks,
    # a 128x96 frame has 48 16-blocks -> patch the threshold directly
    orig = im._analysis_bands

    def small_bands(sps, block, search_range):
        nby = sps.height // block
        nbx = sps.width // block
        if nby * nbx <= 16:       # sub-band dispatches stay unbanded
            return None
        halo = 1
        per = 2
        bands = []
        r0 = 0
        while r0 < nby:
            r1 = min(nby, r0 + per)
            bands.append((r0, r1, min(halo, r0), min(halo, nby - r1)))
            r0 = r1
        return bands

    monkeypatch.setattr(im, "_analysis_bands", small_bands)
    p = default_params(128, 96, qp=33, keyframe_max=16, bframes=2,
                       b_adapt=0, scenecut=False, cu_tree=False,
                       rc_lookahead=0, open_gop=False)
    stream, frames = encode_sequence(p.validate(), _clip(7))
    pics = Decoder().decode(stream)
    assert len(pics) == 7
    for pic in pics:
        assert pic.sei_md5 == pic.md5
    pics.sort(key=lambda q: q.poc)
    frames.sort(key=lambda f: f.poc)
    for pic, f in zip(pics, frames):
        assert np.array_equal(pic.y, f.recon[0])
    monkeypatch.setattr(im, "_analysis_bands", orig)


def test_bands_cover_frame():
    from x265_mod_by_patman_tpu.bitstream.headers import build_sps_info
    p = default_params(3840, 2160).validate()
    sps = build_sps_info(p)
    bands = im._analysis_bands(sps, 16, 32)
    assert bands is not None
    nby = sps.height // 16
    assert bands[0][0] == 0 and bands[-1][1] == nby
    for (a, b, ht, hb), (c, d, _, _) in zip(bands, bands[1:]):
        assert b == c
    # every dispatch window stays under the block-row limit
    for (r0, r1, ht, hb) in bands:
        assert (r1 - r0) + ht + hb <= im.WINDOW_NBY_LIMIT
