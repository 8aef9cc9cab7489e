"""Slicetype lookahead: lowres (p0,p1,b) cost lattice, b-adapt DP,
cost-ratio scenecut (reference slicetype.cpp slicetypeDecide:1996,
slicetypePath:3468, scenecutInternal:2832)."""
import numpy as np

from x265_mod_by_patman_tpu.params import EncoderParams
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from x265_mod_by_patman_tpu.analysis.slicetype import SlicetypeLookahead


def clip_with_cut(w, h, n, cut, seed=7):
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n):
        base = 60 if i < cut else 180
        y = (base + 30 * np.sin(np.arange(w)[None, :] / 9 + i * 0.7)
             + rng.integers(0, 12, (h, w))).astype(np.uint8)
        u = np.full((h // 2, w // 2), 110 + i, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y, u, v))
    return frames


def encode_all(frames, **kw):
    p = EncoderParams(source_width=frames[0][0].shape[1],
                      source_height=frames[0][0].shape[0], qp=32, **kw)
    enc = Encoder(p)
    pics = []
    for (y, u, v) in frames:
        pics.extend(enc.encode_frame(y, u, v))
    pics.extend(enc.flush())
    return enc, pics


def test_scenecut_promotes_idr_and_decodes():
    frames = clip_with_cut(96, 64, 14, cut=8)
    enc, pics = encode_all(frames, bframes=3, keyframe_max=250,
                           keyframe_min=4, b_adapt=2)
    by_disp = {f.disp: f.slice_type for f in pics}
    assert by_disp[8] == "I", by_disp        # cut detected at frame 8
    assert sum(1 for t in by_disp.values() if t == "I") == 2  # no spurious I
    assert any(t == "B" for t in by_disp.values())
    bs = enc.headers() + b"".join(f.bitstream for f in pics)
    out = Decoder().decode(bs)
    assert len(out) == len(frames)
    assert all(pic.sei_md5 == pic.md5 for pic in out
               if pic.sei_md5 is not None)


def test_static_scene_keeps_long_minigops():
    # no cut: scenecut must not fire, minigops use the full B window
    frames = clip_with_cut(96, 64, 9, cut=99)
    enc, pics = encode_all(frames, bframes=3, keyframe_max=250,
                           keyframe_min=4, b_adapt=2)
    types = [f.slice_type for f in sorted(pics, key=lambda f: f.disp)]
    assert types.count("I") == 1
    assert types.count("B") >= 4


def test_badapt_dp_shortens_gop_on_motion_burst():
    # frames 0-3 static, 4-5 violent motion: the DP should place a P
    # anchor before/at the burst rather than spanning it with Bs
    w, h = 96, 64
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (h + 64, w + 64)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    frames = []
    for i in range(7):
        off = i if i < 4 else 4 + (i - 3) * 18
        y = np.clip(base[2:2 + h, off:off + w], 0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((y, u, v))
    st = SlicetypeLookahead(w, h, bframes=3, b_adapt=2)
    for i, (y, u, v) in enumerate(frames):
        st.push(i, y.astype(np.int32))
    k_static = st.decide_gop(0, [1, 2, 3])
    assert k_static == 3                       # cheap Bs: keep the window
    k_burst = st.decide_gop(3, [4, 5, 6])
    assert k_burst <= 2                        # burst breaks the minigop


def test_scenecut_param_parse():
    p = EncoderParams()
    p.parse("scenecut", "25")
    assert p.scenecut and p.scenecut_threshold == 25
    p.parse("scenecut", "0")
    assert not p.scenecut
    p.parse("no-scenecut", "1")
    assert not p.scenecut


def test_hme_lookahead_finds_large_motion():
    """The 1/4-of-lowres HME tier (x265 --hme analog) extends the
    lowres lookahead's reach: a 50-px global pan (beyond the +-16
    half-res window = +-32 source px) must still yield a cheap P cost
    relative to intra, where the unseeded search saturates."""
    import numpy as np
    from x265_mod_by_patman_tpu.analysis.slicetype import \
        SlicetypeLookahead
    rng = np.random.default_rng(12)
    big = rng.integers(0, 255, (192, 384)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)) // 3
    f0 = np.clip(big[16:16 + 128, 0:256], 0, 255).astype(np.uint8)
    f1 = np.clip(big[16:16 + 128, 48:304], 0, 255).astype(np.uint8)
    costs = {}
    for hme in (False, True):
        la = SlicetypeLookahead(256, 128, bframes=2, hme=hme)
        la.push(0, f0)
        la.push(1, f1)
        costs[hme] = la.frame_cost(1, 0, 1)
    assert costs[True] < 0.6 * costs[False], costs
