"""Open GOP: non-first keyframes are CRA with RASL leading pictures
referencing across the keyframe (x265 --open-gop; dpb.cpp
getNalUnitType:572); POC continues across CRAs (decoder derives the
MSB, spec 8.3.1)."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from x265_mod_by_patman_tpu.bitstream.nal import (
    NAL_CRA_NUT, NAL_IDR_W_RADL, NAL_RASL_N, NAL_RASL_R, split_annexb)
from tests.test_e2e_intra import synth_frame


def _nal_types(bs: bytes):
    return [(n[0] >> 1) & 0x3F for n in split_annexb(bs)]


def _encode(p, frames):
    enc = Encoder(p)
    out = []
    for f in frames:
        out.extend(enc.encode_frame(*f))
    out.extend(enc.flush())
    return out


def _check_decode(out, frames):
    bs = b"".join(f.bitstream for f in out)
    pics = Decoder().decode(bs)
    assert len(pics) == len(frames)
    # decode order: pics[i] is out[i]'s picture (POC resets at IDRs, so
    # a display-index map would collide across closed GOPs)
    for pc, f in zip(pics, out):
        assert pc.sei_md5 == pc.md5
        assert np.array_equal(pc.y, f.recon[0])
        assert np.array_equal(pc.u, f.recon[1])
    return bs


def test_open_gop_cra_rasl():
    w, h = 96, 64
    frames = [synth_frame(w, h, seed=i, motion=i) for i in range(14)]
    p = default_params(w, h, qp=32, keyframe_max=6, bframes=2,
                       b_adapt=0, scenecut=False, open_gop=True)
    out = _encode(p, frames)
    bs = _check_decode(out, frames)
    nals = _nal_types(bs)
    assert nals.count(NAL_IDR_W_RADL) == 1       # only the first keyframe
    assert NAL_CRA_NUT in nals                   # later keyframes are CRA
    assert NAL_RASL_N in nals or NAL_RASL_R in nals
    # POC continues across the CRA (no reset within the CVS)
    pocs = sorted(f.disp for f in out)
    assert pocs == list(range(len(frames)))


def test_closed_gop_still_idr():
    w, h = 96, 64
    frames = [synth_frame(w, h, seed=i, motion=i) for i in range(10)]
    p = default_params(w, h, qp=32, keyframe_max=5, bframes=2,
                       b_adapt=0, scenecut=False, open_gop=False)
    out = _encode(p, frames)
    bs = _check_decode(out, frames)
    nals = _nal_types(bs)
    assert nals.count(NAL_IDR_W_RADL) == 2
    assert NAL_CRA_NUT not in nals


def test_open_gop_poc_wrap():
    """POC lsb wraps at 1 << log2_max_poc_lsb; the decoder must derive
    the MSB across the wrap (long CVS without IDR resets).  Shrink the
    lsb field to 4 bits so 20 frames cross the wrap."""
    w, h = 64, 48
    u0 = np.full((h // 2, w // 2), 120, np.uint8)
    rng = np.random.default_rng(1)
    base = rng.integers(0, 255, (h, w)).astype(np.uint8)
    frames = [(np.roll(base, i, axis=1), u0, u0) for i in range(20)]
    p = default_params(w, h, qp=35, keyframe_max=6, bframes=0,
                       scenecut=False, open_gop=True)
    enc = Encoder(p)
    enc.sps.log2_max_poc_lsb = 4          # wrap at 16
    out = []
    for f in frames:
        out.extend(enc.encode_frame(*f))
    out.extend(enc.flush())
    bs = enc.headers() + b"".join(f.bitstream for f in out)
    pics = Decoder().decode(bs)
    pocs = sorted(p_.poc for p_ in pics)
    assert len(set(pocs)) == len(pics)
    assert max(pocs) >= 16                # crossed the lsb wrap
    by = {f.disp: f for f in out}
    for pc in pics:
        assert pc.md5 == by[pc.poc].md5
