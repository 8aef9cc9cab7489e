"""Tile-row sharded analysis (halo exchange over the device mesh) must
be bit-identical to the whole-frame call, and the sharded encoder must
produce the byte-identical bitstream (SURVEY §4 multi-chip bit-exactness
requirement; reference determinism contract threading.rst:180-190)."""
import numpy as np
import pytest
import jax

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder


def _clip(w, h, n, seed=9):
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 255, (h + 64, w + 64)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
           + np.roll(big, (1, 1), (0, 1))) // 4
    frames = []
    for i in range(n):
        y = np.clip(big[2 + i:2 + i + h, 3 * i:3 * i + w],
                    0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((y, u, u))
    return frames


def _need_devices(n):
    if len(jax.devices("cpu")) < n:
        pytest.skip(f"needs {n} virtual devices")


def test_tiles_analysis_equals_whole_frame():
    _need_devices(8)
    from x265_mod_by_patman_tpu.analysis.inter_mode import analyse_p_frame
    from x265_mod_by_patman_tpu.parallel.tiles import analyse_p_frame_tiles
    w, h = 416, 240
    frames = _clip(w, h, 2)
    p = default_params(w, h, qp=30).validate()
    enc = Encoder(p)
    f0 = tuple(enc._pad(a, s) for a, s in zip(frames[0], (0, 1, 1)))
    f1 = tuple(enc._pad(a, s) for a, s in zip(frames[1], (0, 1, 1)))
    ref = analyse_p_frame(*f1, [f0], enc.sps, 30, rect=True)
    til = analyse_p_frame_tiles(*f1, [f0], enc.sps, 30, n_devices=8,
                                rect=True)
    for a, b in zip(ref[:4] + ref[5:], til[:4] + til[5:]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for k in range(3):
        assert np.array_equal(np.asarray(ref[4][k]), np.asarray(til[4][k]))


def test_sharded_bitstream_byte_identical():
    _need_devices(4)
    w, h = 416, 240
    frames = _clip(w, h, 3)

    def encode(tile_rows):
        # info SEI off: it embeds the param string, which names the
        # device count (metadata, not coded content)
        p = default_params(w, h, qp=32, keyframe_max=250, bframes=0,
                           rect=True, scenecut=False, weightp=False,
                           mesh_tile_rows=tile_rows, info_sei=False)
        enc = Encoder(p)
        out = []
        for f in frames:
            out.extend(enc.encode_frame(*f))
        out.extend(enc.flush())
        return enc.headers() + b"".join(f.bitstream for f in out)

    bs1 = encode(1)
    bs4 = encode(4)
    assert bs1 == bs4

    from x265_mod_by_patman_tpu.decoder.decoder import Decoder
    pics = Decoder().decode(bs4)
    assert len(pics) == len(frames)
    assert all(pc.sei_md5 == pc.md5 for pc in pics)
