"""Public API layer (x265 C-API analog): open/encode/drain framing,
headers as NAL records, mid-stream reconfig semantics, intra refresh,
zones, stats, and multilib bit-depth dispatch.

Reference: encoder/api.cpp:75-1130, encoder.cpp:2582 reconfigureParam.
"""
import numpy as np

from x265_mod_by_patman_tpu import api
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def _frames(n, w=64, h=48, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h + 32, w + 32)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    out = []
    for i in range(n):
        y = np.clip(base[i:i + h, 2 * i:2 * i + w], 0, 255)
        u = np.full((h // 2, w // 2), 100, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        out.append((y.astype(np.uint8), u, v))
    return out


def _encode_all(enc, frames):
    payload = b""
    pics = []
    for i, f in enumerate(frames):
        pic = api.Picture(planes=f, pts=i)
        n, nals, out = api.encoder_encode(enc, pic)
        payload += b"".join(x.payload for x in nals)
        if n:
            pics.append(out)
    for nals, out in api.encoder_close(enc):
        payload += b"".join(x.payload for x in nals)
        pics.append(out)
    return payload, pics


def test_api_roundtrip_and_nal_types():
    p = api.param_default_preset("fast")
    assert api.param_parse(p, "input-res", "64x48") == 0
    assert api.param_parse(p, "qp", "32") == 0
    assert api.param_parse(p, "bframes", "0") == 0
    assert api.param_parse(p, "keyint", "250") == 0
    assert api.param_parse(p, "no-such-flag", "1") == -1
    assert api.param_apply_profile(p, "main") == 0
    enc = api.encoder_open(p)
    hdr = api.encoder_headers(enc)
    types = [n.type for n in hdr]
    assert api.NAL_UNIT_VPS in types
    assert api.NAL_UNIT_SPS in types
    assert api.NAL_UNIT_PPS in types

    frames = _frames(5)
    payload, pics = _encode_all(enc, frames)
    assert len(pics) == 5
    stream = b"".join(n.payload for n in hdr) + payload
    dec = Decoder()
    dpics = dec.decode(stream)
    assert len(dpics) == 5
    by_poc = {pc.poc: pc for pc in dpics}
    for pic in pics:
        assert np.array_equal(by_poc[pic.poc].y, pic.planes[0])
    st = api.encoder_get_stats(enc)
    assert st.encoded_picture_count == 5
    assert st.accum_bits > 0
    assert st.total_frames_by_type.get("I", 0) >= 1


def test_api_reconfig_midstream():
    p = api.param_default_preset("fast")
    api.param_parse(p, "input-res", "64x48")
    api.param_parse(p, "qp", "30")
    api.param_parse(p, "bframes", "0")
    api.param_parse(p, "keyint", "250")
    enc = api.encoder_open(p)
    frames = _frames(6, seed=3)
    for f in frames[:3]:
        api.encoder_encode(enc, api.Picture(planes=f))
    # qp change applies to later frames
    assert api.encoder_reconfig(enc, qp=40) == 0
    assert enc.enc.rc.base_qp == 40
    # whitelisted analysis knobs
    assert api.encoder_reconfig(enc, aq_strength=0.5, rect=True) == 0
    # header-affecting fields are rejected
    assert api.encoder_reconfig(enc, ctu_size=16) == -1
    # search range can only shrink
    before = enc.enc._me_range
    assert api.encoder_reconfig(enc, search_range=9999) == 0
    assert enc.enc._me_range <= before
    # VBV can't turn on mid-stream
    assert api.encoder_reconfig(enc, vbv_maxrate=500) == -1
    for f in frames[3:]:
        api.encoder_encode(enc, api.Picture(planes=f))
    api.encoder_close(enc)
    assert api.encoder_get_stats(enc).encoded_picture_count == 6


def test_api_reconfig_stream_decodes():
    p = api.param_default_preset("fast")
    api.param_parse(p, "input-res", "64x48")
    api.param_parse(p, "qp", "28")
    api.param_parse(p, "bframes", "0")
    api.param_parse(p, "keyint", "250")
    enc = api.encoder_open(p)
    frames = _frames(6, seed=5)
    payload = b""
    for i, f in enumerate(frames):
        if i == 3:
            assert api.encoder_reconfig(enc, qp=38) == 0
        n, nals, _ = api.encoder_encode(enc, api.Picture(planes=f))
        payload += b"".join(x.payload for x in nals)
    for nals, _ in api.encoder_close(enc):
        payload += b"".join(x.payload for x in nals)
    hdr = b"".join(n.payload for n in api.encoder_headers(enc))
    pics = Decoder().decode(hdr + payload)
    assert len(pics) == 6
    for pc in pics:
        assert pc.sei_md5 is not None and pc.md5 == pc.sei_md5


def test_api_intra_refresh_and_zone():
    p = api.param_default_preset("fast")
    api.param_parse(p, "input-res", "64x48")
    api.param_parse(p, "qp", "30")
    api.param_parse(p, "bframes", "0")
    api.param_parse(p, "keyint", "250")
    enc = api.encoder_open(p)
    assert api.encoder_reconfig_zone(enc, 4, 5, qp=44) == 0
    frames = _frames(6, seed=7)
    payload = b""
    pics_out = []
    for i, f in enumerate(frames):
        if i == 2:
            assert api.encoder_intra_refresh(enc) == 0
        n, nals, pic = api.encoder_encode(enc, api.Picture(planes=f))
        payload += b"".join(x.payload for x in nals)
        if n:
            pics_out.append(pic)
    for nals, pic in api.encoder_close(enc):
        payload += b"".join(x.payload for x in nals)
        pics_out.append(pic)
    types = {p_.pts: p_.slice_type for p_ in pics_out}
    assert types[2] == "I", types          # intra refresh landed
    hdr = b"".join(n.payload for n in api.encoder_headers(enc))
    pics = Decoder().decode(hdr + payload)
    assert len(pics) == 6
    # zone applied: frames 4-5 coded at QP 44
    zoned = [p_ for p_ in pics_out if p_.pts in (4, 5)]
    assert zoned


def test_api_multilib_dispatch():
    a8 = api.api_get(8)
    a10 = api.api_get(10)
    assert a8 and a10 and api.api_get(12) is None
    p8 = a8.param_default_preset("fast")
    p10 = a10.param_default_preset("fast")
    assert p8.internal_bit_depth == 8
    assert p10.internal_bit_depth == 10
    assert a8.version_str == api.version_str()
