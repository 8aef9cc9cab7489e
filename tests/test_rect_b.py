"""B-slice rect (2NxN / Nx2N) inter PUs: analysis picks per-PU lists,
stream decodes bit-exact (B arm of x265 checkInter rect shapes,
analysis.cpp:2368)."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params


def _b_band_clip(rng, w, h, n):
    """Top band pans; bottom band is static content that is REPLACED
    after frame 0 — in B frames the bottom half matches only the future
    (L1) anchor, the top half needs motion, so a block straddling the
    boundary wants a 2NxN split with different lists per PU."""
    big = rng.integers(0, 255, (h + 64, w + 64)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
           + np.roll(big, (1, 1), (0, 1))) // 4
    alt = rng.integers(0, 255, (h, w)).astype(np.int32)
    alt = (alt + np.roll(alt, 1, 0) + np.roll(alt, 1, 1)) // 3
    B = 40
    frames = []
    for i in range(n):
        y = np.empty((h, w), np.int32)
        y[:B] = big[4:4 + B, 3 * i:3 * i + w]
        y[B:] = big[8 + B:8 + h, 5:5 + w] if i == 0 else alt[B:]
        u = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((np.clip(y, 0, 255).astype(np.uint8), u, u))
    return frames


def test_rect_b_e2e_bitexact_and_used():
    from x265_mod_by_patman_tpu.encoder.top import Encoder
    from x265_mod_by_patman_tpu.decoder import decoder as decmod
    rng = np.random.default_rng(7)
    w, h = 96, 64
    frames = _b_band_clip(rng, w, h, 4)
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=2,
                       rect=True, scenecut=False, weightp=False,
                       b_adapt=0)
    enc = Encoder(p)
    out = []
    for f in frames:
        out.extend(enc.encode_frame(*f))
    out.extend(enc.flush())
    bs = enc.headers() + b"".join(f.bitstream for f in out)

    seen = []                   # (part_mode, dir, dir_b) of rect CUs
    orig = decmod.Decoder._recon_cu

    def patched(self, cu, *a, **k):
        if cu.is_inter and getattr(cu, "part_mode", 0):
            seen.append((cu.part_mode, cu.inter_dir, cu.inter_dir_b))
        return orig(self, cu, *a, **k)

    decmod.Decoder._recon_cu = patched
    try:
        pics = decmod.Decoder().decode(bs)
    finally:
        decmod.Decoder._recon_cu = orig

    by = {f.disp: f for f in out}
    assert len(pics) == len(frames)
    for pc in pics:
        f = by[pc.poc]
        assert pc.sei_md5 == pc.md5
        assert np.array_equal(pc.y, f.recon[0])
        assert np.array_equal(pc.u, f.recon[1])
        assert np.array_equal(pc.v, f.recon[2])
    # rect CUs whose PUs use different directions, or any L1 PU, can
    # only come from a B slice (P rect is always (1, 1))
    b_rect = [s for s in seen if s[1] != s[2] or (s[1] | s[2]) & 2]
    assert b_rect, seen


def test_amp_b_e2e_bitexact():
    """B-slice AMP (2NxnU/.../nRx2N) with per-PU list choice: streams
    decode bit-exact and quarter-shape parts appear in B slices."""
    from x265_mod_by_patman_tpu.encoder.top import Encoder
    from x265_mod_by_patman_tpu.decoder import decoder as decmod
    from tests.test_amp_pu import quarter_strip_scene
    w, h = 96, 64
    frames = quarter_strip_scene(w, h, 4, True)
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=2,
                       rect=True, amp=True, scenecut=False,
                       weightp=False, b_adapt=0)
    enc = Encoder(p)
    out = []
    for f in frames:
        out.extend(enc.encode_frame(*f))
    out.extend(enc.flush())
    bs = enc.headers() + b"".join(f.bitstream for f in out)

    seen = []
    orig = decmod.Decoder._recon_cu

    def patched(self, cu, *a, **k):
        if cu.is_inter and getattr(cu, "part_mode", 0) >= 4:
            seen.append((cu.part_mode, cu.inter_dir, cu.inter_dir_b))
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
    assert seen, "AMP parts should appear"
