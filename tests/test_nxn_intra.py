"""NxN intra (8x8 PUs/TUs at min CU 16): decision, recon, bit-exact."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def micro_pattern(w, h):
    """Distinct directional 8x8 tiles: NxN should fire widely."""
    y = np.zeros((h, w), np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            k = (by * 13 + bx * 7) % 4
            yy, xx = np.mgrid[0:8, 0:8]
            pat = [xx * 30, yy * 30, (xx + yy) * 15,
                   (xx - yy) * 15 + 120][k]
            y[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = \
                np.clip(pat, 0, 255)
    return y


@pytest.mark.parametrize("wpp,sao", [(False, False), (True, True)])
def test_nxn_intra_bit_exact(wpp, sao):
    w, h = 96, 64
    y = micro_pattern(w, h)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    p = default_params(w, h, qp=28, keyframe_max=1, nxn_intra=True,
                       wpp=wpp, sao=sao)
    enc = Encoder(p)
    [f] = enc.encode_frame(y, u, v)
    pics = Decoder().decode(f.bitstream)
    assert np.array_equal(pics[0].y, f.recon[0])
    assert np.array_equal(pics[0].u, f.recon[1])
    assert np.array_equal(pics[0].v, f.recon[2])
    assert pics[0].md5 == f.md5 == pics[0].sei_md5


def test_nxn_improves_rd_on_detail():
    w, h = 96, 64
    y = micro_pattern(w, h)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)

    def run(nxn):
        p = default_params(w, h, qp=28, keyframe_max=1, nxn_intra=nxn)
        [f] = Encoder(p).encode_frame(y, u, v)
        mse = np.mean((y.astype(float)
                       - f.recon[0][:h, :w].astype(float)) ** 2)
        return f.bits, mse

    b1, m1 = run(False)
    b2, m2 = run(True)
    assert b2 < b1 and m2 < m1          # strictly better both axes here


def test_nxn_decision_prefers_uniform_16():
    """A pure ramp has one dominant direction: NxN should mostly NOT
    fire (sum of 4 modes costs more syntax for no gain)."""
    from x265_mod_by_patman_tpu.analysis.intra_mode import (
        decide_modes_split)
    from x265_mod_by_patman_tpu.bitstream.headers import build_sps_info
    w, h = 96, 64
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(40 + xx * 2, 0, 255).astype(np.uint8)
    p = default_params(w, h, nxn_intra=True)
    sps = build_sps_info(p)
    _, split, _ = decide_modes_split(y, sps, 32)
    assert split.mean() < 0.35


def test_nxn_sbh_mode_dependent_scan_decodes():
    """SBH parity must be enforced along the TB's REAL scan: NxN TU8
    luma and TU4 chroma use mode-dependent scans (spec 7.4.9.11), so a
    diagonal-scan-only SBH adjustment corrupts the hidden sign
    (regression: decoded MD5 mismatched before the scan_sel fix)."""
    from x265_mod_by_patman_tpu.decoder.decoder import Decoder
    rng = np.random.default_rng(7)
    w, h = 160, 96
    frames = []
    for i in range(2):
        yy, xx = np.mgrid[0:h, 0:w]
        y = np.clip(((xx * 3 + yy * 7 + i * 5) % 255)
                    + rng.integers(-20, 20, (h, w)), 0,
                    255).astype(np.uint8)
        u = np.clip(128 + ((xx[::2, ::2] * 5) % 64)
                    + rng.integers(-15, 15, (h // 2, w // 2)), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + ((yy[::2, ::2] * 5) % 64)
                    + rng.integers(-15, 15, (h // 2, w // 2)), 0,
                    255).astype(np.uint8)
        frames.append((y, u, v))
    for tu_depth in (1, 2):
        p = default_params(w, h, qp=30, nxn_intra=True,
                           keyframe_max=1, tu_intra_depth=tu_depth)
        p.sign_hide = True
        p.validate()
        enc = Encoder(p)
        out = []
        for f in frames:
            out.extend(enc.encode_frame(*f))
        out.extend(enc.flush())
        bs = enc.headers() + b"".join(f.bitstream for f in out)
        pics = Decoder().decode(bs)
        assert len(pics) == len(frames)
        assert all(pc.sei_md5 == pc.md5 for pc in pics)
