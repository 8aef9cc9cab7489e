"""Batched multi-frame intra path: identical bitstreams to per-frame."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_intra import synth_frame


def test_batch_matches_streaming():
    w, h = 96, 64
    frames = [synth_frame(w, h, seed=i, motion=i) for i in range(3)]
    p = default_params(w, h, qp=32, keyframe_max=1, rc_mode="cqp")

    enc_a = Encoder(p)
    serial = []
    for f in frames:
        serial += enc_a.encode_frame(*f)

    enc_b = Encoder(default_params(w, h, qp=32, keyframe_max=1,
                                   rc_mode="cqp"))
    batched = enc_b.encode_batch(frames)

    assert len(serial) == len(batched)
    for a, b in zip(serial, batched):
        assert a.bitstream == b.bitstream
        assert a.md5 == b.md5

    pics = Decoder().decode(b"".join(f.bitstream for f in batched))
    for f, pic in zip(batched, pics):
        assert pic.md5 == f.md5 == pic.sei_md5
