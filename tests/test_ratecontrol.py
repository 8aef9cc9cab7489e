"""Rate control: ABR hits the target bitrate; CRF scales with quality;
all RC modes stay decodable/bit-exact."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder, encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_inter import moving_scene


def run_encode(p, frames):
    stream, encoded = encode_sequence(p, frames)
    kbps = (sum(f.bits for f in encoded) / len(encoded)
            * p.fps_num / p.fps_denom / 1000)
    return stream, encoded, kbps


def test_abr_hits_target():
    w, h = 96, 64
    frames = moving_scene(w, h, 24, seed=7)
    target = 400
    p = default_params(w, h, rc_mode="abr", bitrate_kbps=target,
                       keyframe_max=250, bframes=2, fps_num=25)
    stream, encoded, kbps = run_encode(p, frames)
    # single-pass no-lookahead ABR: 35% tolerance for a 1s clip
    assert abs(kbps - target) / target < 0.35, kbps
    # bit-exactness still holds under varying QP
    pics = Decoder().decode(stream)
    for f, pic in zip(encoded, pics):
        assert pic.md5 == f.md5 == pic.sei_md5


def test_abr_adapts_rate():
    w, h = 96, 64
    frames = moving_scene(w, h, 20, seed=8)
    rates = []
    for target in (200, 800):
        p = default_params(w, h, rc_mode="abr", bitrate_kbps=target,
                           keyframe_max=250, bframes=0, fps_num=25)
        _, _, kbps = run_encode(p, frames)
        rates.append(kbps)
    assert rates[1] > rates[0] * 2, rates


def test_crf_quality_ladder():
    w, h = 96, 64
    frames = moving_scene(w, h, 6, seed=9)
    sizes = []
    for crf in (22, 34):
        p = default_params(w, h, rc_mode="crf", crf=float(crf),
                           keyframe_max=250, bframes=0)
        stream, encoded, _ = run_encode(p, frames)
        sizes.append(len(stream))
        pics = Decoder().decode(stream)
        for f, pic in zip(encoded, pics):
            assert pic.md5 == f.md5 == pic.sei_md5
    assert sizes[0] > 1.5 * sizes[1], sizes
