"""CABAC engine round-trip tests (testbench analog for the entropy layer;
reference test strategy: source/test/ checkasm harness, SURVEY.md §4)."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.bitstream.bitwriter import BitWriter
from x265_mod_by_patman_tpu.entropy import contexts
from x265_mod_by_patman_tpu.entropy.cabac import (
    CabacDecoder, CabacEncoder, CTX_BYPASS, CTX_TERM, init_context,
    stream_frac_bits,
)


def roundtrip(bins, ctx_idx, slice_type=2, qp=32):
    states_e = contexts.init_states(slice_type, qp)
    bw = BitWriter()
    enc = CabacEncoder(bw)
    enc.encode_stream(np.asarray(bins), np.asarray(ctx_idx), states_e)
    enc.encode_bin_trm(1)
    enc.finish()
    bw.rbsp_trailing_bits()
    data = bw.get_bytes()

    states_d = contexts.init_states(slice_type, qp)
    dec = CabacDecoder(data)
    out = []
    for c in ctx_idx:
        if c == CTX_BYPASS:
            out.append(dec.decode_bin_ep())
        elif c == CTX_TERM:
            out.append(dec.decode_bin_trm())
        else:
            out.append(dec.decode_bin(states_d, c))
    assert dec.decode_bin_trm() == 1
    assert np.array_equal(states_e, states_d)
    return out, data


def test_context_init_matches_spec_formula():
    # init value 154 at any QP is the "equiprobable" CNU state
    s = init_context(32, 154)
    assert s >> 1 <= 2  # near state 0
    # spec formula worked example: initValue 184 at qp 26:
    # slope=(184>>4)*5-45=10, offset=((184&15)<<3)-16=48,
    # pre=clip3(1,126,(10*26>>4)+48)=64 -> valMps=1, pStateIdx=0
    assert init_context(26, 184) == 1
    # initValue 107 (split-flag B ctx0) at qp 0: slope=-15, offset=72,
    # pre=72 -> mps=1, pState=8
    assert init_context(0, 107) == (8 << 1 | 1)


def test_roundtrip_context_bins():
    rng = np.random.RandomState(7)
    n = 5000
    bins = rng.randint(0, 2, n)
    ctx = rng.randint(0, contexts.NUM_CONTEXTS, n)
    out, _ = roundtrip(bins, ctx)
    assert np.array_equal(out, bins)


def test_roundtrip_bypass_heavy():
    rng = np.random.RandomState(3)
    n = 4000
    bins = rng.randint(0, 2, n)
    ctx = np.where(rng.rand(n) < 0.7, CTX_BYPASS, rng.randint(0, 40, n))
    out, _ = roundtrip(bins, ctx)
    assert np.array_equal(out, bins)


def test_roundtrip_skewed_bins():
    # highly skewed bins drive contexts to extreme states and force
    # long carry/0xff runs
    rng = np.random.RandomState(11)
    n = 8000
    bins = (rng.rand(n) < 0.02).astype(int)
    ctx = rng.randint(0, 8, n)
    out, data = roundtrip(bins, ctx)
    assert np.array_equal(out, bins)
    # skewed stream must compress far below 1 bit/bin
    assert len(data) * 8 < n / 2


def test_roundtrip_all_ones():
    n = 2000
    bins = np.ones(n, dtype=int)
    ctx = np.zeros(n, dtype=int)
    out, _ = roundtrip(bins, ctx)
    assert np.array_equal(out, bins)


def test_terminate_bins_interleaved():
    bins = [1, 0, 1, 1, 0, 0, 1, 0]
    ctx = [0, CTX_TERM, 1, CTX_BYPASS, CTX_TERM, 2, CTX_BYPASS, 3]
    out, _ = roundtrip(bins, ctx)
    assert out == bins


def test_frac_bits_estimate_tracks_actual():
    rng = np.random.RandomState(5)
    n = 20000
    bins = (rng.rand(n) < 0.3).astype(int)
    ctx = rng.randint(0, contexts.NUM_CONTEXTS, n)
    states = contexts.init_states(2, 32)
    est = stream_frac_bits(bins, ctx, states.copy())
    _, data = roundtrip(bins, ctx)
    actual_bits = len(data) * 8
    assert abs(est / 32768 - actual_bits) / actual_bits < 0.02


def test_ep_bins_batch_matches_single():
    bw1, bw2 = BitWriter(), BitWriter()
    e1, e2 = CabacEncoder(bw1), CabacEncoder(bw2)
    value = 0b1011011101
    for b in f"{value:010b}":
        e1.encode_bin_ep(int(b))
    e2.encode_bins_ep(value, 10)
    e1.encode_bin_trm(1)
    e2.encode_bin_trm(1)
    e1.finish()
    e2.finish()
    bw1.rbsp_trailing_bits()
    bw2.rbsp_trailing_bits()
    assert bw1.get_bytes() == bw2.get_bytes()
