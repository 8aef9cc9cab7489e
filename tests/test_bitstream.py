"""Bit writer / NAL / header syntax tests."""
import numpy as np

from x265_mod_by_patman_tpu.bitstream.bitwriter import BitWriter, anti_emulation
from x265_mod_by_patman_tpu.bitstream import nal
from x265_mod_by_patman_tpu.bitstream.headers import (
    SliceHeader, build_pps_info, build_sps_info, write_pps, write_sps,
    write_slice_header, write_vps,
)
from x265_mod_by_patman_tpu.params import default_params


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u(self, n):
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self):
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
        return ((1 << zeros) | self.u(zeros)) - 1 if zeros else 0

    def se(self):
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)


def test_bitwriter_basic():
    bw = BitWriter()
    bw.u(5, 4)
    bw.u(1, 1)
    bw.ue(0)
    bw.ue(3)
    bw.se(-2)
    bw.rbsp_trailing_bits()
    data = bw.get_bytes()
    br = BitReader(data)
    assert br.u(4) == 5
    assert br.u(1) == 1
    assert br.ue() == 0
    assert br.ue() == 3
    assert br.se() == -2


def test_ue_values():
    for v in [0, 1, 2, 3, 7, 8, 255, 256, 12345]:
        bw = BitWriter()
        bw.ue(v)
        bw.rbsp_trailing_bits()
        assert BitReader(bw.get_bytes()).ue() == v


def test_anti_emulation():
    assert anti_emulation(b"\x00\x00\x00") == b"\x00\x00\x03\x00"
    assert anti_emulation(b"\x00\x00\x01\x00\x00\x02") == \
        b"\x00\x00\x03\x01\x00\x00\x03\x02"
    assert anti_emulation(b"\x00\x00\x04") == b"\x00\x00\x04"
    data = anti_emulation(b"\x00" * 6)
    assert data == b"\x00\x00\x03\x00\x00\x03\x00\x00"
    assert nal.remove_emulation(data) == b"\x00" * 6


def test_emulation_roundtrip_random():
    rng = np.random.RandomState(0)
    for _ in range(50):
        raw = bytes(rng.randint(0, 4, rng.randint(1, 100)).astype(np.uint8))
        assert nal.remove_emulation(anti_emulation(raw)) == raw


def test_annexb_split():
    stream = nal.annexb(nal.NAL_VPS, b"\x10\x20") + \
        nal.annexb(nal.NAL_SPS, b"\x30", long_start_code=False)
    units = nal.split_annexb(stream)
    assert len(units) == 2
    assert units[0][2:] == b"\x10\x20"
    assert (units[0][0] >> 1) & 0x3F == nal.NAL_VPS
    assert (units[1][0] >> 1) & 0x3F == nal.NAL_SPS


def test_sps_header_fields_parse_back():
    p = default_params(416, 240, qp=32).validate()
    sps = build_sps_info(p)
    assert sps.width == 416 and sps.height == 240
    data = write_sps(sps)
    br = BitReader(data)
    assert br.u(4) == 0          # vps id
    assert br.u(3) == 0          # max_sub_layers_minus1
    assert br.u(1) == 1          # temporal_id_nesting
    br.pos += 2 + 1 + 5 + 32 + 4 + 44 + 8  # profile_tier_level
    assert br.ue() == 0          # sps id
    assert br.ue() == 1          # chroma_format_idc
    assert br.ue() == 416        # width
    assert br.ue() == 240        # height


def test_sps_conformance_window():
    p = default_params(1280, 724).validate()
    sps = build_sps_info(p)
    assert sps.height == 736  # padded to the 16-px analysis grid
    assert sps.conf_win_bottom == 6  # chroma units


def test_slice_header_writes():
    p = default_params(416, 240, qp=32, sao=False, deblock=False,
                       wpp=False).validate()
    sps = build_sps_info(p)
    pps = build_pps_info(p)
    sh = SliceHeader(slice_type=2, nal_type=nal.NAL_IDR_W_RADL, qp=32,
                     deblocking_disabled=True)
    bw = write_slice_header(sh, sps, pps)
    data = bw.get_bytes()
    br = BitReader(data)
    assert br.u(1) == 1          # first_slice
    assert br.u(1) == 0          # no_output_of_prior_pics
    assert br.ue() == 0          # pps id
    assert br.ue() == 2          # slice_type I


def test_vps_pps_produce_bytes():
    p = default_params(64, 64).validate()
    sps = build_sps_info(p)
    pps = build_pps_info(p)
    assert len(write_vps(sps)) > 10
    assert len(write_pps(pps)) > 2
