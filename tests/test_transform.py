"""Transform/quant kernel parity tests (checkasm analog: JAX batched vs
numpy golden, plus spec-level invariants)."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.ops import transform as T


@pytest.mark.parametrize("log2n", [2, 3, 4, 5])
def test_dct_idct_roundtrip_near_identity(log2n):
    rng = np.random.RandomState(log2n)
    n = 1 << log2n
    resi = rng.randint(-255, 256, (n, n)).astype(np.int16)
    coef = T.dct_ref(resi)
    back = T.idct_ref(coef)
    # integer transform pair is near-lossless at full precision; the
    # worst-case rounding drift of the HEVC 8-bit shifts is a few LSBs
    err = np.abs(back.astype(int) - resi.astype(int))
    assert err.max() <= 5
    assert err.mean() < 1.0


@pytest.mark.parametrize("log2n", [2, 3, 4, 5])
def test_dct_batch_matches_ref(log2n):
    rng = np.random.RandomState(10 + log2n)
    n = 1 << log2n
    blocks = rng.randint(-255, 256, (7, n, n)).astype(np.int16)
    out = np.asarray(T.dct_batch(blocks, log2n))
    for i in range(7):
        np.testing.assert_array_equal(out[i], T.dct_ref(blocks[i]).astype(np.int32))


@pytest.mark.parametrize("log2n", [2, 3, 4, 5])
def test_idct_batch_matches_ref(log2n):
    rng = np.random.RandomState(20 + log2n)
    n = 1 << log2n
    coefs = rng.randint(-3000, 3000, (5, n, n)).astype(np.int16)
    out = np.asarray(T.idct_batch(coefs, log2n))
    for i in range(5):
        np.testing.assert_array_equal(out[i], T.idct_ref(coefs[i]).astype(np.int32))


def test_dst4_matches_ref():
    rng = np.random.RandomState(3)
    blocks = rng.randint(-255, 256, (4, 4, 4)).astype(np.int16)
    out = np.asarray(T.dct_batch(blocks, 2, dst=True))
    for i in range(4):
        np.testing.assert_array_equal(out[i], T.dct_ref(blocks[i], dst=True).astype(np.int32))
    iout = np.asarray(T.idct_batch(out, 2, dst=True))
    for i in range(4):
        np.testing.assert_array_equal(
            iout[i], T.idct_ref(out[i].astype(np.int16), dst=True).astype(np.int32))


def test_dc_coefficient():
    # flat block of value v: DC coeff = v * 64 * 2^(-s1) * N * ... spec scaling
    for log2n in (2, 3, 4, 5):
        n = 1 << log2n
        resi = np.full((n, n), 100, dtype=np.int16)
        coef = T.dct_ref(resi)
        assert coef[0, 0] != 0
        assert np.abs(coef[1:, :]).max() == 0
        assert np.abs(coef[0, 1:]).max() == 0


@pytest.mark.parametrize("qp", [0, 10, 22, 32, 37, 51])
@pytest.mark.parametrize("log2n", [2, 3, 4, 5])
def test_quant_dequant_parity(qp, log2n):
    rng = np.random.RandomState(qp + log2n)
    n = 1 << log2n
    coef = rng.randint(-8000, 8000, (3, n, n)).astype(np.int16)
    lv_ref = np.stack([T.quant_ref(c, qp, log2n) for c in coef])
    lv_jax = np.asarray(T.quant_batch(coef, qp, log2n))
    np.testing.assert_array_equal(lv_ref.astype(np.int32), lv_jax)
    dq_ref = np.stack([T.dequant_ref(l, qp, log2n) for l in lv_ref])
    dq_jax = np.asarray(T.dequant_batch(lv_jax, qp, log2n))
    np.testing.assert_array_equal(dq_ref.astype(np.int32), dq_jax)


def test_quant_monotone_in_qp():
    rng = np.random.RandomState(0)
    coef = rng.randint(-4000, 4000, (8, 8)).astype(np.int16)
    nz = [int(np.count_nonzero(T.quant_ref(coef, qp, 3))) for qp in range(0, 52, 5)]
    assert nz == sorted(nz, reverse=True)
    assert nz[-1] <= nz[0]


def test_full_pipeline_recon_error_bounded():
    # residual -> dct -> quant -> dequant -> idct: error bounded by qstep
    rng = np.random.RandomState(42)
    for qp in (20, 32, 45):
        resi = rng.randint(-100, 101, (16, 16)).astype(np.int16)
        c = T.dct_ref(resi)
        l = T.quant_ref(c, qp, 4)
        dq = T.dequant_ref(l, qp, 4)
        r2 = T.idct_ref(dq)
        qstep = 2 ** ((qp - 4) / 6)
        rmse = np.sqrt(np.mean((r2.astype(int) - resi.astype(int)) ** 2))
        assert rmse < max(2.0, qstep)
