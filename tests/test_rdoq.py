"""RDOQ: level decisions, CG zeroing, e2e bit-exactness."""
import numpy as np
import jax.numpy as jnp

from x265_mod_by_patman_tpu.ops.rdoq import rdoq_levels, _level_bits
from x265_mod_by_patman_tpu.ops.transform import (
    dct_batch, quant_dyn)
from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_inter import moving_scene


def test_level_bits_monotonic():
    lv = jnp.arange(0, 100, dtype=jnp.float32)
    b = np.asarray(_level_bits(lv))
    assert np.all(np.diff(b) >= 0)
    assert b[0] < 1.0 < b[1]


def test_rdoq_zero_threshold_matches_deadzone():
    """The RDOQ 0/1 decision must sit near the plain quantizer's intra
    deadzone (analytic consistency of K with the 171/512 rounding)."""
    qp = 30
    B = 64
    rng = np.random.default_rng(0)
    resi = rng.integers(-40, 41, (B, 16, 16)).astype(np.int32)
    coef = dct_batch(jnp.asarray(resi), 4, 8)
    intra = jnp.ones(B, bool)
    q = np.asarray(quant_dyn(coef, intra, qp, 4, 8))
    r = np.asarray(rdoq_levels(coef, intra, qp, 4, 8))
    # signs always agree where both nonzero; levels differ by at most 1
    both = (q != 0) & (r != 0)
    assert np.all(np.sign(q[both]) == np.sign(r[both]))
    assert np.abs(q - r).max() <= 2


def test_rdoq_kills_sparse_noise_cg():
    """A CG holding one borderline coefficient costs more than its
    distortion: RDOQ zeroes it, plain quant keeps it."""
    coef = np.zeros((1, 16, 16), np.int32)
    # one barely-above-deadzone coeff in a far CG (expensive position)
    qp = 30
    from x265_mod_by_patman_tpu.ops.transform import (
        QUANT_SCALES, QUANT_SHIFT, MAX_TR_DYNAMIC_RANGE)
    qbits = QUANT_SHIFT + qp // 6 + MAX_TR_DYNAMIC_RANGE - 8 - 4
    step = (1 << qbits) / QUANT_SCALES[qp % 6]
    coef[0, 13, 14] = int(0.75 * step)
    q = np.asarray(quant_dyn(jnp.asarray(coef), jnp.ones(1, bool), qp, 4, 8))
    r = np.asarray(rdoq_levels(jnp.asarray(coef), jnp.ones(1, bool), qp, 4, 8))
    assert q[0, 13, 14] == 1
    assert r.sum() == 0


def test_rdoq_e2e_bit_exact():
    w, h = 96, 64
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=2,
                       rdoq_level=2, sign_hide=True)
    enc = Encoder(p)
    out = []
    for (y, u, v) in moving_scene(w, h, 5, seed=11):
        out.extend(enc.encode_frame(y, u, v))
    out.extend(enc.flush())
    pics = Decoder().decode(b"".join(f.bitstream for f in out))
    by_poc = {f.poc: f for f in out}
    for pic in pics:
        f = by_poc[pic.poc]
        assert np.array_equal(pic.y, f.recon[0])
        assert np.array_equal(pic.u, f.recon[1])
        assert np.array_equal(pic.v, f.recon[2])
        assert pic.md5 == f.md5 == pic.sei_md5
