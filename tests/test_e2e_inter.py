"""End-to-end IPPP encode -> validation decode (north-star config-2 shape:
P-frames with motion, single ref)."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder, encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def moving_scene(w, h, n_frames, seed=0):
    """Global pan + a moving box over textured background."""
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 255, (h + 64, w + 64)).astype(np.int32)
    # low-pass it for realistic texture
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
           + np.roll(big, (1, 1), (0, 1))) // 4
    frames = []
    for i in range(n_frames):
        ox, oy = 8 + 2 * i, 8 + i
        y = big[oy:oy + h, ox:ox + w].copy()
        bx, by = 10 + 4 * i, 20 + 2 * i
        y[by:by + 24, bx:bx + 24] = 220
        u = np.full((h // 2, w // 2), 100 + i, np.int32)
        v = np.full((h // 2, w // 2), 140 - i, np.int32)
        frames.append((np.clip(y, 0, 255).astype(np.uint8),
                       u.astype(np.uint8), v.astype(np.uint8)))
    return frames


@pytest.mark.parametrize("size", [(96, 64)])
def test_e2e_ippp_bit_exact(size):
    w, h = size
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=0)
    frames = moving_scene(w, h, 4)
    stream, encoded = encode_sequence(p, frames)

    types = [f.slice_type for f in encoded]
    assert types == ["I", "P", "P", "P"]

    dec = Decoder()
    pics = dec.decode(stream)
    assert len(pics) == 4
    for i, (f, pic) in enumerate(zip(encoded, pics)):
        ry, ru, rv = f.recon
        assert np.array_equal(pic.y, ry), f"luma mismatch frame {i}"
        assert np.array_equal(pic.u, ru), f"cb mismatch frame {i}"
        assert np.array_equal(pic.v, rv), f"cr mismatch frame {i}"
        assert pic.md5 == f.md5 == pic.sei_md5


def test_p_frames_compress_better_than_intra():
    w, h = 96, 64
    frames = moving_scene(w, h, 4, seed=2)
    p_ippp = default_params(w, h, qp=30, keyframe_max=250, bframes=0)
    p_intra = default_params(w, h, qp=30, keyframe_max=1)
    s_ippp, e_ippp = encode_sequence(p_ippp, frames)
    s_intra, _ = encode_sequence(p_intra, frames)
    assert len(s_ippp) < 0.7 * len(s_intra), \
        (len(s_ippp), len(s_intra), "inter should beat all-intra")
    # P frames should find real motion: most blocks inter, decent PSNR
    for f, (y, _, _) in zip(e_ippp[1:], frames[1:]):
        mse = np.mean((f.recon[0].astype(np.int64) - y.astype(np.int64)) ** 2)
        psnr = 10 * np.log10(255 * 255 / max(mse, 1e-9))
        assert psnr > 30, psnr


def test_idr_interval():
    w, h = 64, 64
    p = default_params(w, h, qp=32, keyframe_max=2, open_gop=False)
    frames = moving_scene(w, h, 5, seed=3)
    _, encoded = encode_sequence(p, frames)
    assert [f.slice_type for f in encoded] == ["I", "P", "I", "P", "I"]
    dec = Decoder()
    pics = dec.decode(b"".join(f.bitstream for f in encoded))
    for f, pic in zip(encoded, pics):
        assert pic.md5 == f.md5 == pic.sei_md5


def test_e2e_b_frames_bit_exact():
    """IBBP mini-GOP: B slices with bi-prediction, decode-order output."""
    w, h = 96, 64
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=2)
    frames = moving_scene(w, h, 7, seed=5)
    stream, encoded = encode_sequence(p, frames)
    types = [f.slice_type for f in encoded]
    pocs = [f.poc for f in encoded]
    assert types == ["I", "P", "B", "B", "P", "B", "B"]
    assert pocs == [0, 3, 1, 2, 6, 4, 5]

    dec = Decoder()
    pics = dec.decode(stream)
    assert len(pics) == 7
    n_bi = 0
    for f, pic in zip(encoded, pics):
        assert pic.poc == f.poc
        ry, ru, rv = f.recon
        assert np.array_equal(pic.y, ry), f"luma mismatch poc {f.poc}"
        assert np.array_equal(pic.u, ru)
        assert np.array_equal(pic.v, rv)
        assert pic.md5 == f.md5 == pic.sei_md5
    # B frames should compress better than the P frames on average
    b_bits = np.mean([f.bits for f in encoded if f.slice_type == "B"])
    p_bits = np.mean([f.bits for f in encoded if f.slice_type == "P"])
    assert b_bits < p_bits


def test_multi_ref_p():
    """2+ reference P frames: ref_idx syntax, per-block ref choice."""
    w, h = 96, 64
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=0,
                       max_num_references=3)
    frames = moving_scene(w, h, 6, seed=11)
    # make frame 5 resemble frame 3 (ref 1 wins over ref 0 for many blocks)
    frames[5] = frames[3]
    stream, encoded = encode_sequence(p, frames)
    assert [f.slice_type for f in encoded] == ["I"] + ["P"] * 5
    pics = Decoder().decode(stream)
    for f, pic in zip(encoded, pics):
        assert np.array_equal(pic.y, f.recon[0]), f.poc
        assert pic.md5 == f.md5 == pic.sei_md5


def test_b_pyramid():
    """bframes>=3 with b_pyramid: referenced middle B, all bit-exact."""
    w, h = 96, 64
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=3,
                       b_pyramid=True)
    frames = moving_scene(w, h, 9, seed=13)
    stream, encoded = encode_sequence(p, frames)
    # decode order per minigop: P, Bref(mid), B, B
    types = [f.slice_type for f in encoded]
    assert types[0] == "I" and types.count("B") >= 4
    pics = Decoder().decode(stream)
    assert len(pics) == len(encoded)
    for f, pic in zip(encoded, pics):
        assert np.array_equal(pic.y, f.recon[0]), f.poc
        assert pic.md5 == f.md5 == pic.sei_md5
    # pyramid should not be larger than flat-B coding
    p_flat = default_params(w, h, qp=30, keyframe_max=250, bframes=3,
                            b_pyramid=False)
    s_flat, _ = encode_sequence(p_flat, frames)
    assert len(stream) < 1.05 * len(s_flat)
