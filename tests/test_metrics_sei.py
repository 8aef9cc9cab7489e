"""Metrics (PSNR/SSIM) + SEI writer breadth."""
import numpy as np

from x265_mod_by_patman_tpu.utils.metrics import (
    psnr, ssim, frame_mse, global_psnr)
from x265_mod_by_patman_tpu.bitstream.sei import (
    SEI_CONTENT_LIGHT_LEVEL, SEI_MASTERING_DISPLAY,
    SEI_USER_DATA_UNREGISTERED, X265_USER_DATA_UUID, parse_master_display,
    parse_sei, write_content_light_level, write_mastering_display,
    write_user_data_info, write_recovery_point)


def test_psnr_known_value():
    a = np.zeros((64, 64), np.uint8)
    b = a.copy()
    b[0, 0] = 255
    # mse = 255^2/4096 -> psnr = 10*log10(4096)
    assert abs(psnr(a, b) - 10 * np.log10(4096)) < 1e-6
    assert psnr(a, a) == 99.99


def test_ssim_bounds():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    assert ssim(a, a) > 0.9999
    n = np.clip(a.astype(int) + rng.integers(-20, 21, a.shape), 0,
                255).astype(np.uint8)
    v = ssim(a, n)
    assert 0.0 < v < 0.99


def test_global_psnr_pools_mse():
    a = np.zeros((8, 8), np.uint8)
    b = a.copy(); b[0, 0] = 16
    m = frame_mse(a, b)
    assert abs(global_psnr([m, m], 128) -
               10 * np.log10(255**2 / (2 * 256 / 128))) < 1e-6


def test_sei_writers_roundtrip():
    md = parse_master_display(
        "G(13250,34500)B(7500,3000)R(34000,16000)WP(15635,16450)"
        "L(10000000,1)")
    assert md[8] == 10000000 and md[0] == 13250
    [(t, p)] = parse_sei(write_mastering_display(md))
    assert t == SEI_MASTERING_DISPLAY and len(p) == 24
    [(t, p)] = parse_sei(write_content_light_level(1000, 400))
    assert t == SEI_CONTENT_LIGHT_LEVEL
    assert int.from_bytes(p[:2], "big") == 1000
    assert int.from_bytes(p[2:], "big") == 400
    [(t, p)] = parse_sei(write_user_data_info("hello"))
    assert t == SEI_USER_DATA_UNREGISTERED
    assert p[:16] == X265_USER_DATA_UUID and p[16:] == b"hello"
    [(t, p)] = parse_sei(write_recovery_point(0))
    assert t == 6


def test_hdr_seis_in_stream():
    from x265_mod_by_patman_tpu.params import default_params
    from x265_mod_by_patman_tpu.encoder.top import Encoder
    from x265_mod_by_patman_tpu.decoder.decoder import Decoder
    p = default_params(64, 64, qp=32, keyframe_max=1)
    p.parse("master-display",
            "G(13250,34500)B(7500,3000)R(34000,16000)WP(15635,16450)"
            "L(10000000,1)")
    p.parse("max-cll", "1000,400")
    enc = Encoder(p)
    y = np.full((64, 64), 100, np.uint8)
    c = np.full((32, 32), 128, np.uint8)
    f = enc.encode_frame(y, c, c)[0]
    d = Decoder()
    pics = d.decode(f.bitstream)
    types = [t for t, _ in d.prefix_seis]
    assert SEI_USER_DATA_UNREGISTERED in types
    assert SEI_MASTERING_DISPLAY in types
    assert SEI_CONTENT_LIGHT_LEVEL in types
    assert pics[0].md5 == pics[0].sei_md5
