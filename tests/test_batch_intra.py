"""Batched multi-frame intra path: identical bitstreams to per-frame."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_intra import synth_frame


def test_batch_matches_streaming():
    w, h = 96, 64
    frames = [synth_frame(w, h, seed=i, motion=i) for i in range(3)]
    # rd 2: the batched paths run the fixed-grid analysis; the serial
    # side must match that grade for bitstream equality
    p = default_params(w, h, qp=32, keyframe_max=1, rc_mode="cqp",
                       rd_level=2)

    enc_a = Encoder(p)
    serial = []
    for f in frames:
        serial += enc_a.encode_frame(*f)

    enc_b = Encoder(default_params(w, h, qp=32, keyframe_max=1,
                                   rc_mode="cqp", rd_level=2))
    batched = enc_b.encode_batch(frames)

    assert len(serial) == len(batched)
    for a, b in zip(serial, batched):
        assert a.bitstream == b.bitstream
        assert a.md5 == b.md5

    pics = Decoder().decode(b"".join(f.bitstream for f in batched))
    for f, pic in zip(batched, pics):
        assert pic.md5 == f.md5 == pic.sei_md5


def test_pipelined_matches_streaming():
    """encode_intra_pipelined must produce the same slices as the
    serial path (device/host overlap is a pure scheduling change)."""
    import numpy as np
    from x265_mod_by_patman_tpu.params import default_params
    from x265_mod_by_patman_tpu.encoder.top import Encoder
    from x265_mod_by_patman_tpu.decoder.decoder import Decoder
    rng = np.random.default_rng(3)
    frames = [(rng.integers(0, 256, (64, 96)).astype(np.uint8),
               rng.integers(0, 256, (32, 48)).astype(np.uint8),
               rng.integers(0, 256, (32, 48)).astype(np.uint8))
              for _ in range(3)]
    p = default_params(96, 64, qp=32, keyframe_max=1, rd_level=2)
    e1 = Encoder(p)
    serial = [e1.encode_frame(*f)[0] for f in frames]
    e2 = Encoder(p)
    piped = e2.encode_intra_pipelined(frames)
    for a, b in zip(serial, piped):
        assert a.bitstream == b.bitstream
    pics = Decoder().decode(b"".join(f.bitstream for f in piped))
    assert all(p_.md5 == p_.sei_md5 for p_ in pics)


def test_intra_batched_pipeline_matches_and_decodes():
    """encode_intra_batched (chained device programs + packed async
    transfers) must bit-match the single-frame pipelined path and
    decode bit-exact, across a partial final batch."""
    from x265_mod_by_patman_tpu.params import default_params
    from x265_mod_by_patman_tpu.encoder.top import Encoder
    from x265_mod_by_patman_tpu.decoder.decoder import Decoder
    w, h = 96, 64
    frames = [synth_frame(w, h, seed=i, motion=i) for i in range(5)]
    kw = dict(qp=32, keyframe_max=1, rc_mode="cqp", sao=False,
              rd_level=2)

    ref = Encoder(default_params(w, h, **kw)).encode_intra_pipelined(frames)
    got = Encoder(default_params(w, h, **kw)).encode_intra_batched(
        frames, batch=2)

    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        assert a.bitstream == b.bitstream and a.md5 == b.md5

    pics = Decoder().decode(b"".join(f.bitstream for f in got))
    for f, pic in zip(got, pics):
        assert pic.md5 == f.md5 == pic.sei_md5
        assert np.array_equal(pic.y, f.recon[0])
