"""HDR10+ JSON -> ST 2094-40 T.35 SEI."""
import json
import numpy as np

from x265_mod_by_patman_tpu.bitstream.hdr10plus import (
    load_dhdr10_json, pack_st2094_40, write_dhdr10_sei)
from x265_mod_by_patman_tpu.bitstream.sei import parse_sei
from x265_mod_by_patman_tpu.bitstream.bitreader import BitReader

REC = {
    "NumberOfWindows": 1,
    "TargetedSystemDisplayMaximumLuminance": 400,
    "LuminanceParameters": {
        "AverageRGB": 1200,
        "MaxScl": [12000, 11000, 9000],
        "LuminanceDistributions": {
            "DistributionIndex": [1, 5, 10, 25, 50, 75, 90, 95, 99],
            "DistributionValues": [10, 300, 900, 2000, 4000, 6000,
                                   8000, 9000, 9900]}},
    "BezierCurveData": {
        "KneePointX": 100, "KneePointY": 200,
        "Anchors": [102, 205, 307, 410, 512, 614, 717, 819, 922]},
}


def test_pack_roundtrip_bits():
    body = pack_st2094_40(REC)
    br = BitReader(body)
    assert br.u(8) == 4 and br.u(8) == 1          # app id/version
    assert br.u(2) == 1                            # num_windows
    assert br.u(27) == 400
    assert br.u(1) == 0
    assert [br.u(17) for _ in range(3)] == [12000, 11000, 9000]
    assert br.u(17) == 1200
    n = br.u(4)
    assert n == 9
    pairs = [(br.u(7), br.u(17)) for _ in range(n)]
    assert pairs[0] == (1, 10) and pairs[-1] == (99, 9900)
    br.u(10); br.u(1)
    assert br.u(1) == 1                            # tone_mapping_flag
    assert br.u(12) == 100 and br.u(12) == 200
    na = br.u(4)
    assert na == 9
    assert [br.u(10) for _ in range(na)][0] == 102


def test_sei_wrapper():
    [(t, p)] = parse_sei(write_dhdr10_sei(REC))
    assert t == 4
    assert p[0] == 0xB5
    assert int.from_bytes(p[1:3], "big") == 0x003C
    assert int.from_bytes(p[3:5], "big") == 0x0001


def test_e2e_injection(tmp_path):
    from x265_mod_by_patman_tpu.params import default_params
    from x265_mod_by_patman_tpu.encoder.top import Encoder
    from x265_mod_by_patman_tpu.decoder.decoder import Decoder
    jf = tmp_path / "m.json"
    jf.write_text(json.dumps({"SceneInfo": [REC, REC]}))
    p = default_params(64, 64, qp=32, keyframe_max=1)
    p.parse("dhdr10-info", str(jf))
    enc = Encoder(p)
    y = np.full((64, 64), 90, np.uint8)
    c = np.full((32, 32), 128, np.uint8)
    s = b"".join(enc.encode_frame(y, c, c)[0].bitstream for _ in range(2))
    d = Decoder()
    pics = d.decode(s)
    t35 = [x for t, x in d.prefix_seis if t == 4]
    assert len(t35) == 2
    assert all(p_.md5 == p_.sei_md5 for p_ in pics)
