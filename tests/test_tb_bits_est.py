"""Golden-parity sanity for ops/rdoq.tb_bits_est (the structural CABAC
rate model driving chroma skip-RD and the luma rate floor).

The estimator intentionally freezes context states at slice-start and
ignores within-CG adaptation (rice escalation, per-CG gt1/gt2 caps,
live sig patterns) — so the golden here counts bits of the REAL
residual_coding bin stream (python golden emitter) under the same
frozen slice-start states.  That isolates exactly what the estimator
claims to model: which bins are emitted in which contexts (scan order,
context maps, binarization).  A scan/context regression shifts the
golden and the estimate apart far beyond the calibrated envelopes.

Calibrated envelopes (2026-08-19, seed 3 corpus):
  sparse decision regime (<=12% density, levels <=4): per-TB abs err
  <=1.4 bits on 1-coeff TBs, rel p95 ~0.39 driven by tiny totals;
  corpus bit-mass ratio within 12%.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from x265_mod_by_patman_tpu.entropy.binir import BinIR
from x265_mod_by_patman_tpu.entropy.residual import _encode_residual_py
from x265_mod_by_patman_tpu.entropy.contexts import init_states
from x265_mod_by_patman_tpu.entropy.cabac import CTX_BYPASS, CTX_TERM
from x265_mod_by_patman_tpu.constants.hevc_tables import ENTROPY_BITS
from x265_mod_by_patman_tpu.ops.rdoq import tb_bits_est

_EB = ENTROPY_BITS.astype(np.float64) / 32768.0


def _frozen_golden_bits(lev: np.ndarray, log2: int, c_idx: int,
                        init_type: int, qp: int) -> float:
    """Bits of the real residual_coding bin stream with contexts pinned
    at their slice-start states (no adaptation)."""
    ir = BinIR()
    _encode_residual_py(ir, lev, log2, c_idx, 0, False)
    bins = ir._bins[:ir.n].astype(np.int64)
    ctx = ir._ctx[:ir.n]
    st = init_states(init_type, qp).astype(np.int64)
    is_byp = ctx == CTX_BYPASS
    is_trm = ctx == CTX_TERM
    reg = ~(is_byp | is_trm)
    total = float(np.count_nonzero(is_byp))
    total += _EB[126 ^ bins[is_trm]].sum()
    total += _EB[st[ctx[reg]] ^ bins[reg]].sum()
    return total


def _corpus(rng, log2, c_idx, dens, mag, trials=3):
    n = 1 << log2
    out = []
    for _ in range(trials):
        lev = (rng.random((n, n)) < dens).astype(np.int32) \
            * rng.integers(1, mag + 1, (n, n)).astype(np.int32)
        lev *= rng.choice(np.array([-1, 1], np.int32), (n, n))
        if not lev.any():
            lev[0, 0] = 1
        out.append(lev)
    return out


@pytest.mark.parametrize("log2,c_idx", [(2, 0), (2, 1), (3, 0), (3, 1),
                                        (4, 0), (4, 1), (5, 0)])
def test_tb_bits_est_vs_frozen_golden(log2, c_idx):
    rng = np.random.default_rng(100 + 10 * log2 + c_idx)
    gs, es = [], []
    for init_type in (0, 1, 2):
        for qp in (22, 32, 40):
            for dens, mag in ((0.02, 2), (0.06, 3), (0.12, 4)):
                for lev in _corpus(rng, log2, c_idx, dens, mag):
                    g = _frozen_golden_bits(lev, log2, c_idx,
                                            init_type, qp)
                    e = float(tb_bits_est(jnp.asarray(lev[None]), qp,
                                          log2, c_idx, init_type)[0])
                    e -= 0.8  # estimator folds in a cbf-flag charge
                    # per-TB envelope: small absolute slack (last-pos
                    # LUT on tiny TBs) + relative slack (frozen sig map
                    # / ctx_set approximations)
                    assert abs(e - g) <= 4.0 + 0.45 * g, \
                        (init_type, qp, dens, g, e)
                    gs.append(g)
                    es.append(e)
    # no systematic drift: total estimated bit mass within 20% of the
    # frozen-state golden mass over the whole corpus
    ratio = sum(es) / sum(gs)
    assert 0.80 <= ratio <= 1.25, ratio


def test_tb_bits_est_zero_tb_is_free():
    lev = np.zeros((16, 16), np.int32)
    assert float(tb_bits_est(jnp.asarray(lev[None]), 32, 4, 0, 2)[0]) \
        == 0.0


def test_tb_bits_est_dc_cg_sig_bins_charged():
    """A TB whose DC sub-block is all-zero but has a coded CG elsewhere
    must still pay the DC CG's sig_coeff_flag=0 bins (csbf inferred 1,
    spec 7.4.9.11) — the ADVICE r2 undercharge."""
    lev = np.zeros((16, 16), np.int32)
    lev[5, 5] = 1  # single coeff in CG (1,1); DC CG all-zero
    e = float(tb_bits_est(jnp.asarray(lev[None]), 32, 4, 0, 2)[0])
    g = _frozen_golden_bits(lev, 4, 0, 2, 32)
    # without the DC-CG charge the estimate sits ~8 bits under golden
    assert abs((e - 0.8) - g) <= 4.0 + 0.45 * g, (g, e)


def test_adaptive_bits_table_machinery():
    """End-of-slice context states feed the next same-type frame's
    rate tables (1-frame-lag EstBitsSbac refresh): states are captured
    per slice type, the derived table differs from slice-start after
    real content, and streams still decode bit-exact."""
    import numpy as np
    from x265_mod_by_patman_tpu.params import default_params
    from x265_mod_by_patman_tpu.encoder.top import Encoder
    from x265_mod_by_patman_tpu.decoder.decoder import Decoder
    from x265_mod_by_patman_tpu.entropy.contexts import init_states
    from x265_mod_by_patman_tpu.entropy.est_bits import (
        BITS_TABLE, bits_table_from_states)
    rng = np.random.default_rng(8)
    big = rng.integers(0, 255, (80, 128)).astype(np.int32)
    big = (big + np.roll(big, 1, 0)) // 2
    p = default_params(96, 64, qp=30, keyframe_max=250, bframes=0,
                       scenecut=False, info_sei=False)
    enc = Encoder(p)
    stream = b""
    outs = []
    for i in range(4):
        y = np.clip(big[i:i + 64, 2 * i:2 * i + 96], 0,
                    255).astype(np.uint8)
        c = np.full((32, 48), 120, np.uint8)
        for f in enc.encode_frame(y, c, c):
            stream += f.bitstream
            outs.append(f)
    for f in enc.flush():
        stream += f.bitstream
        outs.append(f)
    # P states captured (SLICE_P == init_type 1)
    assert 1 in enc._adapt_states
    tab = bits_table_from_states(enc._adapt_states[1])
    base = bits_table_from_states(init_states(1, 30))
    assert tab.shape == base.shape
    assert not np.allclose(tab, base), "states must have adapted"
    # slice-start table equals the baked row (first-frame equivalence)
    assert np.allclose(base, BITS_TABLE[1, 30])
    pics = Decoder().decode(stream)
    for f, pc in zip(outs, pics):
        assert pc.md5 == f.md5 == pc.sei_md5
