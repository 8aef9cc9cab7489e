"""HRD signaling + CPB model conformance and row-level VBV
(reference initHRD ratecontrol.cpp:934, hrdFullness :2694,
rowVbvRateControl :3034)."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from x265_mod_by_patman_tpu.bitstream.bitreader import BitReader
from x265_mod_by_patman_tpu.bitstream.headers import (
    HRD_INIT_LEN, HRD_AU_LEN, HRD_DPB_LEN)


def _clip(w, h, n, hard_from=5, seed=5):
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 255, (h + 32, w + 32)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)) // 3
    frames = []
    for i in range(n):
        if i < hard_from:
            y = np.clip(big[2:2 + h, 2 + 2 * i:2 + 2 * i + w],
                        0, 255).astype(np.uint8)
        else:
            y = rng.integers(0, 255, (h, w)).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((y, u, u))
    return frames


def _encode(frames, w, h, **kw):
    p = default_params(w, h, rc_mode="abr", bitrate_kbps=200, fps_num=25,
                       fps_denom=1, keyframe_max=250, bframes=0,
                       vbv_bufsize=100, vbv_maxrate=200, scenecut=False,
                       **kw)
    enc = Encoder(p)
    out = []
    for f in frames:
        out.extend(enc.encode_frame(*f))
    out.extend(enc.flush())
    return enc, out


def test_row_vbv_prevents_underflow():
    w, h = 128, 96
    frames = _clip(w, h, 10)
    enc, out = _encode(frames, w, h)
    assert enc.rc.vbv_underflows == 0
    # exact CPB simulation at the configured rate
    buf, rate = 100e3, 200e3 / 25
    fill = 0.9 * buf
    for f in out:
        assert f.bits <= fill + 1, "frame busts the CPB"
        fill = min(buf, fill - f.bits + rate)
    # decodes bit-exact (per-row QP bumps have decoder mirrors)
    bs = enc.headers() + b"".join(f.bitstream for f in out)
    pics = Decoder().decode(bs)
    assert all(pc.sei_md5 == pc.md5 for pc in pics)


def test_hrd_sei_cpb_conformance():
    w, h = 128, 96
    frames = _clip(w, h, 10)
    enc, out = _encode(frames, w, h, hrd=True)
    bs = enc.headers() + b"".join(f.bitstream for f in out)
    dec = Decoder()
    pics = dec.decode(bs)
    assert all(pc.sei_md5 == pc.md5 for pc in pics)
    # signaled HRD params parsed back from the VUI
    sps = dec.sps
    assert sps.hrd and sps.hrd_bitrate >= 200e3 \
        and sps.hrd_cpb_size >= 100e3

    # collect BP/PT SEIs in decode order
    bps, pts = [], []
    for ptype, payload in dec.prefix_seis:
        br = BitReader(payload)
        if ptype == 0:
            br.ue()                        # sps id
            br.flag()                      # irap_cpb_params
            br.flag()                      # concatenation
            br.u(HRD_AU_LEN)               # delay delta
            bps.append((br.u(HRD_INIT_LEN), br.u(HRD_INIT_LEN)))
        elif ptype == 1:
            pts.append((br.u(HRD_AU_LEN), br.u(HRD_DPB_LEN)))
    assert len(bps) == 1 and len(pts) == len(out)

    # CPB model: bits arrive at hrd_bitrate, AU i removed at
    # removal(BP) + (au_delay_minus1 + 1)/fps; final arrival of every
    # AU must precede its removal (no underflow)
    br_rate = sps.hrd_bitrate
    fps = 25.0
    t_arrival = 0.0
    removal_bp = bps[0][0] / 90000.0
    for i, f in enumerate(out):
        t_arrival += f.bits / br_rate
        if i == 0:
            removal = removal_bp
        else:
            removal = removal_bp + (pts[i][0] + 1) / fps
        assert t_arrival <= removal + 1e-9, \
            f"CPB underflow at AU {i}: arrive {t_arrival} > {removal}"


def test_hrd_requires_vbv():
    import pytest
    p = default_params(64, 64, hrd=True)
    with pytest.raises(AssertionError):
        p.validate()
