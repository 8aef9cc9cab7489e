"""DCT-domain noise reduction (x265 --nr-intra/--nr-inter analog):
offsets build from running |coef| sums and shrink residual rate on
noisy content; streams decode bit-exact."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def _noisy_clip(rng, w, h, n):
    base = rng.integers(0, 255, (h, w)).astype(np.float64)
    for _ in range(3):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                + np.roll(base, (1, 1), (0, 1))) / 4
    u = np.full((h // 2, w // 2), 120, np.uint8)
    out = []
    for i in range(n):
        noise = rng.integers(-10, 11, (h, w))
        y = np.clip(np.roll(base, i, 1) + noise, 0, 255).astype(np.uint8)
        out.append((y, u, u))
    return out


def _encode(p, frames):
    enc = Encoder(p)
    out = []
    for f in frames:
        out.extend(enc.encode_frame(*f))
    out.extend(enc.flush())
    return enc, out


def test_nr_bitexact_and_denoises():
    rng = np.random.default_rng(9)
    w, h = 96, 64
    frames = _noisy_clip(rng, w, h, 5)
    base = default_params(w, h, qp=26, keyframe_max=250, bframes=0,
                          scenecut=False, weightp=False)
    _, out0 = _encode(base, frames)
    p = default_params(w, h, qp=26, keyframe_max=250, bframes=0,
                       scenecut=False, weightp=False,
                       nr_intra=800, nr_inter=800)
    enc, out1 = _encode(p, frames)

    # running state must have accumulated and produced offsets
    offs = enc._nr_offsets()
    assert offs is not None
    assert int(offs[0][0].sum()) > 0 or int(offs[0][1].sum()) > 0
    assert offs[0][0][0] == 0 and offs[0][1][0] == 0   # DC untouched

    # denoising must reduce bits on noisy content (after the first
    # frame, which encodes before any offsets exist)
    b0 = sum(f.bits for f in out0[1:])
    b1 = sum(f.bits for f in out1[1:])
    assert b1 < b0, (b1, b0)

    pics = Decoder().decode(b"".join(f.bitstream for f in out1))
    for pc, f in zip(pics, out1):
        assert pc.md5 == pc.sei_md5 == f.md5


def test_nr_disabled_for_tree():
    """v1: NR runs the fixed-grid wavefront (the TU32 tree path carries
    no noise state) — validate() must drop var_cu_tree."""
    p = default_params(96, 64, qp=30, rd_level=3, nr_inter=400)
    assert not p.var_cu_tree
