"""Coded-residual 64x64 inter CUs: four same-motion TU32/zero 32-CUs
merge into one 64 CU whose forced depth-0 transform-tree split codes
the same four TU32 nodes (x265 compressInterCU upper-depth coded CUs,
analysis.cpp:2368) — pure CU-syntax savings, bit-exact recon."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def panning_noise(w, h, n, seed=11):
    """Global pan over textured noise — uniform motion with residual
    energy everywhere (the coded-64 case; pure static would skip)."""
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 255, (h + 64, w + 64)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)) // 3
    frames = []
    for i in range(n):
        y = big[4 + i:4 + i + h, 4 + 2 * i:4 + 2 * i + w].copy()
        # strong per-frame noise so the TU32 form wins the TU32-vs-quad
        # RD (sparse residual prefers the quad-TU16 split, which can't
        # legally merge to 64 at tu-inter-depth 2)
        y = y + rng.integers(-25, 26, (h, w))
        u = np.full((h // 2, w // 2), 100, np.int32)
        v = np.full((h // 2, w // 2), 140, np.int32)
        frames.append((np.clip(y, 0, 255).astype(np.uint8),
                       u.astype(np.uint8), v.astype(np.uint8)))
    return frames


def test_coded_64_inter_cu_bit_exact():
    w, h = 128, 128
    fr = panning_noise(w, h, 3)
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=0)
    stream, enc = encode_sequence(p, fr)
    dec = Decoder()
    pics = dec.decode(stream)
    coded64 = [cu for pic in pics for cu in pic.cus
               if cu.log2_size == 6 and cu.is_inter and cu.coeffs]
    assert coded64, "expected at least one coded-residual 64x64 CU"
    for f, pic in zip(enc, pics):
        assert np.array_equal(pic.y, f.recon[0])
        assert np.array_equal(pic.u, f.recon[1])
        assert np.array_equal(pic.v, f.recon[2])
        assert pic.md5 == f.md5 == pic.sei_md5
