"""Native C entropy kernels vs pure-python golden (checkasm parity)."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.native import native_entropy
from x265_mod_by_patman_tpu.bitstream.bitwriter import BitWriter
from x265_mod_by_patman_tpu.entropy.binir import BinIR
from x265_mod_by_patman_tpu.entropy.cabac import CabacEncoder
from x265_mod_by_patman_tpu.entropy.contexts import NUM_CONTEXTS, init_states
from x265_mod_by_patman_tpu.entropy.residual import (
    _encode_residual_py, encode_residual, _native_setup)
from x265_mod_by_patman_tpu.constants.hevc_tables import (
    SCAN_DIAG, SCAN_HOR, SCAN_VER)

nat = native_entropy()
pytestmark = pytest.mark.skipif(not nat.available,
                                reason="native build unavailable")


def test_engine_parity_random_streams():
    rng = np.random.default_rng(0)
    for trial in range(10):
        n = int(rng.integers(100, 30000))
        bins = rng.integers(0, 2, n).astype(np.uint8)
        ctx = rng.integers(-1, NUM_CONTEXTS, n).astype(np.int32)
        bins[-1] = 1
        ctx[-1] = -2                       # terminate(1)
        st_py = init_states(2, 30)
        st_c = st_py.copy()

        bw = BitWriter()
        enc = CabacEncoder(bw)
        enc.encode_stream(bins, ctx, st_py)
        enc.finish()
        bw.rbsp_trailing_bits()
        golden = bw.get_bytes()

        data, tail_val, tail_n = nat.cabac_encode(bins, ctx, st_c)
        bw2 = BitWriter()
        bw2.write_bytes(data)
        bw2.u(tail_val, tail_n)
        bw2.rbsp_trailing_bits()
        assert bw2.get_bytes() == golden, trial
        assert np.array_equal(st_py, st_c), trial


@pytest.mark.parametrize("log2_tb,c_idx,scan",
                         [(2, 0, SCAN_DIAG), (2, 0, SCAN_HOR),
                          (3, 0, SCAN_VER), (3, 1, SCAN_DIAG),
                          (4, 0, SCAN_DIAG), (4, 1, SCAN_DIAG),
                          (5, 0, SCAN_DIAG)])
@pytest.mark.parametrize("sign_hide", [False, True])
def test_residual_gen_parity(log2_tb, c_idx, scan, sign_hide):
    assert _native_setup(), "native setup failed"
    rng = np.random.default_rng(log2_tb * 10 + c_idx)
    n = 1 << log2_tb
    for density, amp in ((0.05, 4), (0.3, 40), (0.9, 30000)):
        lv = ((rng.random((n, n)) < density) *
              rng.integers(1, amp, (n, n)) *
              rng.choice([-1, 1], (n, n))).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 1
        ir_py = BinIR()
        _encode_residual_py(ir_py, lv, log2_tb, c_idx, scan, sign_hide)
        ir_c = BinIR()
        encode_residual(ir_c, lv, log2_tb, c_idx, scan, sign_hide)
        bp, cp = ir_py.arrays()
        bc, cc = ir_c.arrays()
        assert np.array_equal(bp, bc), (density, "bins")
        assert np.array_equal(cp, cc), (density, "ctx")


def test_corner_cases():
    # DC-only, HF-only, all-ones across sizes
    for log2_tb in (2, 3, 4, 5):
        n = 1 << log2_tb
        cases = [np.zeros((n, n), np.int32) for _ in range(3)]
        cases[0][0, 0] = -1
        cases[1][n - 1, n - 1] = 1
        cases[2][:] = 1
        for lv in cases:
            ir_py = BinIR()
            _encode_residual_py(ir_py, lv, log2_tb, 0, SCAN_DIAG, False)
            ir_c = BinIR()
            encode_residual(ir_c, lv, log2_tb, 0, SCAN_DIAG, False)
            assert ir_py.bins == ir_c.bins and ir_py.ctx == ir_c.ctx
