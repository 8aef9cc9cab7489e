"""Cost metric parity tests."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.ops import cost as C


@pytest.mark.parametrize("shape", [(4, 4), (8, 8), (16, 16), (32, 32), (8, 16)])
def test_batched_match_golden(shape):
    rng = np.random.RandomState(sum(shape))
    a = rng.randint(0, 256, (5,) + shape).astype(np.int32)
    b = rng.randint(0, 256, (5,) + shape).astype(np.int32)
    sad = np.asarray(C.sad_batch(a, b))
    satd = np.asarray(C.satd_batch(a, b))
    sse = np.asarray(C.sse_batch(a, b))
    for i in range(5):
        assert sad[i] == C.sad_ref(a[i], b[i])
        assert satd[i] == C.satd_ref(a[i], b[i])
        assert sse[i] == C.sse_ref(a[i], b[i])


@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (32, 32)])
def test_sa8d_match(shape):
    rng = np.random.RandomState(1)
    a = rng.randint(0, 256, (3,) + shape).astype(np.int32)
    b = rng.randint(0, 256, (3,) + shape).astype(np.int32)
    out = np.asarray(C.sa8d_batch(a, b))
    for i in range(3):
        assert out[i] == C.sa8d_ref(a[i], b[i])


def test_identical_blocks_zero():
    a = np.arange(64).reshape(1, 8, 8)
    assert C.sad_ref(a[0], a[0]) == 0
    assert C.satd_ref(a[0], a[0]) == 0
    assert int(np.asarray(C.sa8d_batch(a, a))[0]) == 0


def test_satd_dc_vs_sad():
    # DC-only difference: satd compresses it to one coefficient
    a = np.zeros((4, 4), dtype=np.int32)
    b = np.full((4, 4), 10, dtype=np.int32)
    assert C.sad_ref(a, b) == 160
    assert C.satd_ref(a, b) == 80  # |16*10|/2


def test_variance():
    flat = np.full((2, 8, 8), 7, dtype=np.int32)
    assert (np.asarray(C.variance_batch(flat)) == 0).all()
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (1, 16, 16)).astype(np.int32)
    v = int(np.asarray(C.variance_batch(x))[0])
    expect = int((x[0].astype(np.int64) ** 2).sum()
                 - (int(x[0].sum()) ** 2) // 256)
    assert v == expect
