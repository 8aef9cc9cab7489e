"""MCSTF temporal pre-filter: denoising effect + e2e."""
import numpy as np

from x265_mod_by_patman_tpu.analysis.mcstf import (
    filter_strength, mcstf_filter)
from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def test_strength_schedule():
    assert filter_strength(0) == 1.5
    assert filter_strength(8) == 0.95
    assert filter_strength(16) == 1.5
    assert filter_strength(3) == 0.0


def test_filter_denoises_static_scene():
    rng = np.random.default_rng(0)
    clean = rng.integers(60, 196, (64, 96)).astype(np.float64)
    u = np.full((32, 48), 128, np.uint8)
    frames = []
    for k in range(5):
        noisy = np.clip(clean + rng.normal(0, 8, clean.shape), 0,
                        255).astype(np.uint8)
        frames.append((noisy, u, u))
    fy, fu, fv = mcstf_filter(frames, 2, 1.5, qp=32)
    err_raw = np.mean((frames[2][0].astype(float) - clean) ** 2)
    err_flt = np.mean((fy.astype(float) - clean) ** 2)
    assert err_flt < err_raw * 0.6        # clear noise reduction


def test_filter_ignores_scene_change():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    b = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    u = np.full((32, 48), 128, np.uint8)
    fy, _, _ = mcstf_filter([(b, u, u), (a, u, u), (b, u, u)], 1, 1.5)
    assert np.array_equal(fy, a)          # unrelated neighbors gated off


def test_mcstf_e2e_bit_exact():
    rng = np.random.default_rng(2)
    w, h = 96, 64
    u = np.full((h // 2, w // 2), 128, np.uint8)
    clean = rng.integers(40, 216, (h, w)).astype(np.float64)
    frames = [(np.clip(clean + rng.normal(0, 6, clean.shape), 0,
                       255).astype(np.uint8), u, u) for _ in range(6)]
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=2,
                       mcstf=True)
    enc = Encoder(p)
    out = []
    for f in frames:
        out.extend(enc.encode_frame(*f))
    out.extend(enc.flush())
    assert len(out) == 6
    pics = Decoder().decode(b"".join(f.bitstream for f in out))
    by = {f.poc: f for f in out}
    for p_ in pics:
        f = by[p_.poc]
        assert np.array_equal(p_.y, f.recon[0])
        assert p_.md5 == f.md5 == p_.sei_md5
