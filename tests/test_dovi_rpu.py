"""Dolby Vision RPU passthrough (reference frameencoder.cpp:1281:
per-picture RPU emitted as an UNSPECIFIED(62) NAL after the slice;
profile gate per param.cpp:1939)."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def _rpu_nal(i):
    # Annex-B start + nal header 0x7C 0x01 (type 62) + payload
    return b"\x00\x00\x00\x01\x7c\x01" + bytes([0x10 + i, 0xAA, i])


def test_rpu_passthrough(tmp_path):
    rpus = tmp_path / "dovi.rpu"
    rpus.write_bytes(b"".join(_rpu_nal(i) for i in range(3)))
    rng = np.random.default_rng(2)
    frames = [(rng.integers(0, 255, (48, 64)).astype(np.uint8),
               np.full((24, 32), 128, np.uint8),
               np.full((24, 32), 128, np.uint8)) for _ in range(3)]
    p = default_params(64, 48, qp=32, keyframe_max=250, bframes=0,
                       dolby_vision_rpu=str(rpus),
                       dolby_vision_profile=81)
    stream, encoded = encode_sequence(p, frames)
    # profile 8.1 pins the HDR10 colour description
    assert (p.colorprim, p.transfer, p.colormatrix) == (9, 16, 9)
    dec = Decoder()
    pics = dec.decode(stream)
    assert len(pics) == 3
    for pc in pics:
        assert pc.md5 == pc.sei_md5
    assert len(dec.unspecified_nals) == 3
    assert all(t == 62 for (t, _) in dec.unspecified_nals)
    # per-picture payloads ride in display order (split_annexb may
    # leave the next start code's leading zero bytes on the tail)
    assert dec.unspecified_nals[0][1].rstrip(b"\x00") \
        .endswith(bytes([0x10, 0xAA]))
    assert dec.unspecified_nals[2][1].rstrip(b"\x00") \
        .endswith(bytes([0x12, 0xAA, 2]))


def test_rpu_profile_gate():
    with pytest.raises(AssertionError):
        default_params(64, 48, dolby_vision_profile=7).validate()
    with pytest.raises(AssertionError):
        default_params(64, 48, dolby_vision_profile=81).validate()
    p = default_params(64, 48)
    p.parse("dolby-vision-profile", "8.1")
    assert p.dolby_vision_profile == 81
