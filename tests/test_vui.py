"""VUI parameters: write/parse roundtrip + stream integration."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.bitstream.headers import build_sps_info, write_sps
from x265_mod_by_patman_tpu.bitstream.nal import remove_emulation
from x265_mod_by_patman_tpu.decoder.decoder import parse_sps, Decoder
from x265_mod_by_patman_tpu.encoder.top import Encoder


def test_vui_roundtrip():
    p = default_params(64, 64)
    p.parse("colorprim", "bt2020")
    p.parse("transfer", "smpte2084")
    p.parse("colormatrix", "bt2020nc")
    p.parse("sar", "4:3")
    s2 = parse_sps(remove_emulation(write_sps(build_sps_info(p))))
    assert s2.sar == (4, 3)
    assert s2.colour_primaries == 9
    assert s2.transfer_characteristics == 16
    assert s2.matrix_coeffs == 9
    assert s2.fps == (25, 1)


def test_vui_absent_when_defaults():
    p = default_params(64, 64, vui_timing_info=False)
    sps = build_sps_info(p)
    assert not sps.vui_present


def test_vui_stream_decodes():
    p = default_params(64, 64, qp=32, keyframe_max=1)
    p.parse("colorprim", "bt709")
    enc = Encoder(p)
    y = np.full((64, 64), 90, np.uint8)
    c = np.full((32, 32), 128, np.uint8)
    [f] = enc.encode_frame(y, c, c)
    d = Decoder()
    pics = d.decode(f.bitstream)
    assert d.sps.colour_primaries == 1
    assert pics[0].md5 == pics[0].sei_md5
