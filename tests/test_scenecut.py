"""Scene-cut detection: a hard content change forces an IDR."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_inter import moving_scene


def flat_scene(w, h, n):
    """Smooth gradient frames — structurally unlike moving_scene."""
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        y = ((xx * 2 + yy + 4 * i) % 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 128, np.uint8)
        v = np.full((h // 2, w // 2), 128, np.uint8)
        out.append((y, u, v))
    return out


def test_scenecut_inserts_idr():
    w, h = 96, 64
    scene_a = moving_scene(w, h, 4, seed=1)
    scene_b = flat_scene(w, h, 4)              # hard content change
    frames = scene_a + scene_b
    p = default_params(w, h, qp=32, keyframe_max=250, keyframe_min=1,
                       bframes=0)
    enc = Encoder(p)
    encoded = []
    for f in frames:
        encoded += enc.encode_frame(*f)
    encoded += enc.flush()
    types = [f.slice_type for f in encoded]
    assert types[0] == "I"
    assert "I" in types[1:], types       # the cut forced a new IDR
    # everything still decodes bit-exact
    pics = Decoder().decode(b"".join(f.bitstream for f in encoded))
    for f, pic in zip(encoded, pics):
        assert pic.md5 == f.md5 == pic.sei_md5


def test_no_spurious_idr_on_smooth_content():
    w, h = 96, 64
    frames = moving_scene(w, h, 8, seed=5)
    p = default_params(w, h, qp=32, keyframe_max=250, keyframe_min=1,
                       bframes=0)
    enc = Encoder(p)
    encoded = []
    for f in frames:
        encoded += enc.encode_frame(*f)
    encoded += enc.flush()
    assert [f.slice_type for f in encoded].count("I") == 1
