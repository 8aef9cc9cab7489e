"""Weighted prediction: analysis fit, exact 14-bit apply, fade e2e."""
import numpy as np

from x265_mod_by_patman_tpu.analysis.weightp import (
    analyse_weightp, weighted_plane)
from x265_mod_by_patman_tpu.ops.interp import wp_apply_ref, wp_apply_batch
from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
import jax.numpy as jnp


def _fade_frames(w, h, n, step=0.07, seed=2):
    rng = np.random.default_rng(seed)
    base = rng.integers(30, 226, (h, w)).astype(np.float64)
    ub = np.full((h // 2, w // 2), 120, np.uint8)
    return [(np.clip(base * (1 - step * k), 0, 255).astype(np.uint8),
             ub, ub) for k in range(n)]


def test_weight_fit_on_fade():
    fr = _fade_frames(96, 64, 2)
    wp = analyse_weightp(fr[1][0], fr[0][0])
    assert wp is not None
    w, o = wp
    assert w < 64                       # dimming -> weight < 1.0


def test_no_weight_on_static():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    assert analyse_weightp(a, a) is None


def test_wp_apply_batch_matches_ref():
    rng = np.random.default_rng(3)
    p14 = rng.integers(0, 1 << 14, (4, 16, 16)).astype(np.int32)
    ref = wp_apply_ref(p14, 45, -7, 6, 8)
    bat = np.asarray(wp_apply_batch(jnp.asarray(p14), 45, -7, 6, 8))
    assert np.array_equal(ref, bat)


def test_weightp_fade_e2e():
    w, h = 96, 64
    frames = _fade_frames(w, h, 6)

    def run(wp):
        enc = Encoder(default_params(w, h, qp=30, keyframe_max=250,
                                     bframes=0, weightp=wp))
        out = []
        for (y, u, v) in frames:
            out.extend(enc.encode_frame(y, u, v))
        out.extend(enc.flush())
        pics = Decoder().decode(b"".join(f.bitstream for f in out))
        for p_, f in zip(pics, sorted(out, key=lambda x: x.poc)):
            assert np.array_equal(p_.y, f.recon[0])
            assert np.array_equal(p_.u, f.recon[1])
            assert p_.md5 == f.md5 == p_.sei_md5
        return sum(f.bits for f in out)

    b_off = run(False)
    b_on = run(True)
    assert b_on < b_off * 0.95          # clear saving on a fade
