"""64x64 skip CUs at CTU64: four identical-motion zero-residual 32x32
inter CUs merge into one skip CU (pure syntax; kills the per-16-block
skip-flag tax on low-motion content)."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params


def _static_clip(rng, w, h, n):
    base = rng.integers(0, 255, (h, w)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    u = np.full((h // 2, w // 2), 120, np.uint8)
    return [(np.clip(base, 0, 255).astype(np.uint8), u, u)
            for _ in range(n)]


def test_skip64_e2e_bitexact_and_used():
    from x265_mod_by_patman_tpu.encoder.top import Encoder
    from x265_mod_by_patman_tpu.decoder import decoder as decmod
    rng = np.random.default_rng(11)
    w, h = 192, 128
    frames = _static_clip(rng, w, h, 3)
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=0,
                       ctu_size=64, scenecut=False, weightp=False,
                       sao=False)
    enc = Encoder(p)
    out = []
    for f in frames:
        out.extend(enc.encode_frame(*f))
    out.extend(enc.flush())
    bs = enc.headers() + b"".join(f.bitstream for f in out)

    sizes = []
    orig = decmod.Decoder._recon_cu

    def patched(self, cu, *a, **k):
        if cu.is_inter:
            sizes.append(cu.log2_size)
        return orig(self, cu, *a, **k)

    decmod.Decoder._recon_cu = patched
    try:
        pics = decmod.Decoder().decode(bs)
    finally:
        decmod.Decoder._recon_cu = orig

    by = {f.disp: f for f in out}
    for pc in pics:
        f = by[pc.poc]
        assert pc.sei_md5 == pc.md5
        assert np.array_equal(pc.y, f.recon[0])
        assert np.array_equal(pc.u, f.recon[1])
        assert np.array_equal(pc.v, f.recon[2])
    assert sizes.count(6) >= 2, sizes      # 64x64 skips actually used

    # the P frames must be tiny: static content at CTU64 should cost
    # only a handful of skip bins per CTU
    p_bits = [f.bits for f in out if f.slice_type == "P"]
    assert p_bits and max(p_bits) < 1200, p_bits
