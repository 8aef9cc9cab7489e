"""Chunked GOP-parallel encode: concatenated stream decodes whole."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.parallel.gop import (
    chunk_bounds, encode_gop_parallel)
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_inter import moving_scene


def test_chunk_bounds():
    assert chunk_bounds(10, 4) == [(0, 4), (4, 8), (8, 10)]


def test_gop_parallel_stream_decodes():
    frames = moving_scene(96, 64, 9, seed=14)
    p = default_params(96, 64, qp=30, keyframe_max=250, bframes=2)
    stream, encoded = encode_gop_parallel(p, frames, chunk_len=3)
    assert len(encoded) == 9
    pics = Decoder().decode(stream)
    assert len(pics) == 9
    md5s = {f.md5 for f in encoded}
    for p_ in pics:
        assert p_.md5 == p_.sei_md5
        assert p_.md5 in md5s
