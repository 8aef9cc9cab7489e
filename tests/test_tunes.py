"""x265 tune parity (parameter presets)."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def test_tune_effects():
    p = default_params(64, 64).apply_tune("psnr")
    assert p.aq_strength == 0.0 and p.psy_rd == 0.0
    p = default_params(64, 64).apply_tune("zerolatency")
    assert p.bframes == 0 and p.rc_lookahead == 0 and not p.scenecut
    p = default_params(64, 64).apply_tune("fastdecode")
    assert not p.deblock and not p.sao and not p.weightp
    p = default_params(64, 64).parse("tune", "ssim")
    assert p.aq_mode == 2


def test_tuned_encode_roundtrips():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    c = np.full((32, 48), 128, np.uint8)
    for tune in ("psnr", "ssim", "grain", "fastdecode", "zerolatency",
                 "animation"):
        p = default_params(96, 64, qp=32, keyframe_max=1)
        p.apply_tune(tune)
        [f] = Encoder(p).encode_frame(y, c, c)
        pics = Decoder().decode(f.bitstream)
        assert pics[0].md5 == f.md5 == pics[0].sei_md5, tune
