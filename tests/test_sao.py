"""SAO: batched apply vs golden parity; decisions engage; PSNR improves."""
import numpy as np
import pytest
import jax.numpy as jnp

from x265_mod_by_patman_tpu.ops.sao import (
    SaoParams, sao_apply_batch, sao_apply_ref, sao_stats_batch,
    sao_decide, SAO_BAND, SAO_EDGE)
from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_intra import synth_frame


def test_apply_parity_random_params():
    rng = np.random.default_rng(0)
    h, w = 64, 96
    rec = rng.integers(0, 256, (h, w)).astype(np.int32)
    ncy, ncx = h // 32, w // 32
    params = []
    tm = np.zeros((ncy, ncx), np.int32)
    cm = np.zeros((ncy, ncx), np.int32)
    bm = np.zeros((ncy, ncx), np.int32)
    om = np.zeros((ncy, ncx, 4), np.int32)
    for cy in range(ncy):
        row = []
        for cx in range(ncx):
            t = int(rng.integers(0, 3))
            cls = int(rng.integers(0, 4))
            bp = int(rng.integers(0, 32))
            if t == SAO_EDGE:      # spec sign constraints
                offs = (int(rng.integers(0, 8)), int(rng.integers(0, 8)),
                        -int(rng.integers(0, 8)), -int(rng.integers(0, 8)))
            else:
                offs = tuple(int(o) for o in rng.integers(-7, 8, 4))
            row.append(SaoParams(t, cls, bp, offs))
            tm[cy, cx], cm[cy, cx], bm[cy, cx] = t, cls, bp
            om[cy, cx] = offs
        params.append(row)
    golden = sao_apply_ref(rec, params, 32)
    got = np.asarray(sao_apply_batch(
        jnp.asarray(rec), jnp.asarray(tm), jnp.asarray(cm),
        jnp.asarray(bm), jnp.asarray(om), 32, h, w))
    assert np.array_equal(golden, got)


def test_sao_engages_and_improves():
    w, h = 96, 64
    p = default_params(w, h, qp=35, keyframe_max=1, sao=True)
    y, u, v = synth_frame(w, h, seed=1)
    enc = Encoder(p)
    [f] = enc.encode_frame(y, u, v)
    pics = Decoder().decode(f.bitstream)
    assert np.array_equal(pics[0].y, f.recon[0])
    assert pics[0].md5 == f.md5 == pics[0].sei_md5

    p2 = default_params(w, h, qp=35, keyframe_max=1, sao=False)
    [f2] = Encoder(p2).encode_frame(y, u, v)

    def psnr(a, b):
        mse = np.mean((a.astype(np.int64) - b.astype(np.int64)) ** 2)
        return 10 * np.log10(255 * 255 / max(mse, 1e-9))

    assert psnr(f.recon[0], y) >= psnr(f2.recon[0], y) - 0.01, \
        (psnr(f.recon[0], y), psnr(f2.recon[0], y))
    # and SAO should actually have fired somewhere (different recon)
    assert not np.array_equal(f.recon[0], f2.recon[0])


def test_sao_merge_e2e():
    """Merge-left/up RDO (sao.cpp rdoSaoUnitCu analog): merges must
    appear in the bitstream and decode bit-exact."""
    import numpy as np
    from x265_mod_by_patman_tpu.params import default_params
    from x265_mod_by_patman_tpu.encoder.top import Encoder
    from x265_mod_by_patman_tpu.decoder.decoder import Decoder
    import x265_mod_by_patman_tpu.ops.sao as sao_mod

    rng = np.random.default_rng(2)
    w, h = 128, 96
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    frames = []
    for i in range(3):
        y = (100 + 60 * np.sin((xx + 3 * i) / 17) + 40 * np.cos(yy / 13)
             + rng.integers(0, 14, (h, w))).clip(0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((y, u, u))

    merged = [0]
    orig_pass = sao_mod.sao_merge_pass

    def spy(*a, **k):
        m = orig_pass(*a, **k)
        merged[0] += int((m > 0).sum())
        return m

    sao_mod.sao_merge_pass = spy
    try:
        p = default_params(w, h, qp=34, keyframe_max=250, bframes=1,
                           scenecut=False)
        enc = Encoder(p)
        out = []
        for f in frames:
            out.extend(enc.encode_frame(*f))
        out.extend(enc.flush())
    finally:
        sao_mod.sao_merge_pass = orig_pass
    bs = enc.headers() + b"".join(f.bitstream for f in out)
    pics = Decoder().decode(bs)
    assert merged[0] > 0, "merge RDO should fire on smooth content"
    by = {f.disp: f for f in out}
    for pc in pics:
        assert pc.sei_md5 == pc.md5
        assert np.array_equal(pc.y, by[pc.poc].recon[0])
        assert np.array_equal(pc.u, by[pc.poc].recon[1])
