"""Default scaling lists: matrices, quant/dequant math, e2e."""
import numpy as np
import jax.numpy as jnp

from x265_mod_by_patman_tpu.constants.scaling import default_matrix
from x265_mod_by_patman_tpu.ops.transform import (
    dequant_ref, dequant_dyn, quant_dyn, quant_mats)
from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_inter import moving_scene


def test_default_matrix_shapes():
    assert default_matrix(2, True).min() == 16 == default_matrix(2, True).max()
    m8 = default_matrix(3, True)
    assert m8[0, 0] == 16 and m8[7, 7] == 115
    m16 = default_matrix(4, False)
    assert m16.shape == (16, 16)
    assert m16[0, 0] == 16                      # DC override
    assert m16[1, 1] == 16                      # upsample of base[0,0]
    assert m16[15, 15] == 91


def test_flat_matrix_equals_plain_dequant():
    rng = np.random.default_rng(0)
    lv = rng.integers(-100, 101, (16, 16)).astype(np.int16)
    flat = np.full((16, 16), 16, np.int32)
    assert np.array_equal(dequant_ref(lv, 30, 4, 8),
                          dequant_ref(lv, 30, 4, 8, flat))


def test_batched_dequant_matches_golden():
    rng = np.random.default_rng(1)
    lv = rng.integers(-50, 51, (6, 16, 16)).astype(np.int32)
    intra = jnp.asarray(np.array([1, 0, 1, 0, 1, 0], bool))
    dm = np.stack([default_matrix(4, True), default_matrix(4, False)])
    got = np.asarray(dequant_dyn(jnp.asarray(lv), 31, 4, 8,
                                 jnp.asarray(dm), intra))
    for i in range(6):
        ref = dequant_ref(lv[i].astype(np.int16), 31, 4, 8,
                          dm[0 if i % 2 == 0 else 1])
        assert np.array_equal(got[i], ref), i


def test_scaling_list_e2e_bit_exact():
    p = default_params(96, 64, qp=30, keyframe_max=250, bframes=2,
                       scaling_list="default", wpp=True)
    enc = Encoder(p)
    out = []
    for (y, u, v) in moving_scene(96, 64, 5, seed=4):
        out.extend(enc.encode_frame(y, u, v))
    out.extend(enc.flush())
    pics = Decoder().decode(b"".join(f.bitstream for f in out))
    by = {f.poc: f for f in out}
    for p_ in pics:
        f = by[p_.poc]
        assert np.array_equal(p_.y, f.recon[0])
        assert np.array_equal(p_.u, f.recon[1])
        assert np.array_equal(p_.v, f.recon[2])
        assert p_.md5 == f.md5 == p_.sei_md5
