"""WPP substreams: entry points present, per-row CABAC lanes decode
bit-exact, and wpp on/off produce (different but both valid) streams."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_intra import synth_frame


def test_wpp_substreams_roundtrip():
    w, h = 160, 96                    # 5 x 3 CTUs -> 3 substreams
    y, u, v = synth_frame(w, h, seed=2)
    for wpp in (True, False):
        p = default_params(w, h, qp=30, keyframe_max=1, wpp=wpp)
        enc = Encoder(p)
        [f] = enc.encode_frame(y, u, v)
        pics = Decoder().decode(f.bitstream)
        assert np.array_equal(pics[0].y, f.recon[0]), f"wpp={wpp}"
        assert pics[0].md5 == f.md5 == pics[0].sei_md5

    # wpp stream should be slightly larger (substream termination costs)
    p1 = default_params(w, h, qp=30, keyframe_max=1, wpp=True)
    p0 = default_params(w, h, qp=30, keyframe_max=1, wpp=False)
    [f1] = Encoder(p1).encode_frame(y, u, v)
    [f0] = Encoder(p0).encode_frame(y, u, v)
    assert f1.bitstream != f0.bitstream
    assert abs(len(f1.bitstream) - len(f0.bitstream)) < \
        0.05 * len(f0.bitstream) + 200


def test_wpp_inter_gop():
    w, h = 96, 64
    frames = [synth_frame(w, h, seed=i, motion=2 * i) for i in range(4)]
    p = default_params(w, h, qp=32, keyframe_max=250, bframes=1, wpp=True)
    enc = Encoder(p)
    encoded = []
    for f in frames:
        encoded += enc.encode_frame(*f)
    encoded += enc.flush()
    pics = Decoder().decode(b"".join(f.bitstream for f in encoded))
    for f, pic in zip(encoded, pics):
        assert np.array_equal(pic.y, f.recon[0])
        assert pic.md5 == f.md5 == pic.sei_md5
