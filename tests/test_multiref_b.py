"""Full B reference lists: analysis picks non-zero ref_idx when an
older reference matches better, the stream signals it (ref_idx TR
bins + num_ref_idx override), and the decoder mirror stays bit-exact
(reference dpb.cpp:151 ref list build + search.cpp:2554 per-ref
loop)."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from x265_mod_by_patman_tpu.analysis.inter_mode import analyse_b_frame


def _sps(w, h, bd=8):
    from x265_mod_by_patman_tpu.bitstream.headers import build_sps_info
    return build_sps_info(default_params(w, h))


def flashing_scene(w, h, n, seed=0):
    """Textured background where even frames carry a bright overlay in
    a region — the 2-away reference matches better than the 1-away."""
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 255, (h + 64, w + 64)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)) // 3
    frames = []
    for i in range(n):
        y = big[8:8 + h, 8:8 + w].copy()
        if i % 2 == 1:
            y[16:48, 16:48] = np.clip(y[16:48, 16:48] + 90, 0, 255)
        u = np.full((h // 2, w // 2), 110, np.int32)
        v = np.full((h // 2, w // 2), 130, np.int32)
        frames.append((np.clip(y, 0, 255).astype(np.uint8),
                       u.astype(np.uint8), v.astype(np.uint8)))
    return frames


def test_b_analysis_selects_older_ref():
    w, h = 96, 64
    fr = flashing_scene(w, h, 4)
    sps = _sps(w, h)
    # current = frame 3 (flash ON); L0 = [frame 2 (off), frame 1 (on)]:
    # the flashed region should ride ref_idx 1
    cur = fr[3]
    refs0 = [tuple(p.astype(np.int32) for p in fr[2]),
             tuple(p.astype(np.int32) for p in fr[1])]
    refs1 = [tuple(p.astype(np.int32) for p in fr[0])]
    (modes, inter, dirs, mv0, mv1, rs0, rs1, mc, part,
     pu1) = analyse_b_frame(cur[0].astype(np.int32),
                            cur[1].astype(np.int32),
                            cur[2].astype(np.int32),
                            refs0, refs1, sps, qp=32,
                            ref_pocs=((2, 1), (4,)), cur_poc=3)
    assert rs0.shape == inter.shape and rs1.shape == inter.shape
    flash = rs0[1:3, 1:3]        # blocks covering the flashed region
    assert (flash == 1).any(), (rs0, "expected ref_idx 1 in flash area")


def test_multiref_b_stream_decodes_and_differs():
    w, h = 96, 64
    fr = flashing_scene(w, h, 9, seed=3)
    p2 = default_params(w, h, qp=31, keyframe_max=250, bframes=2)
    p2.max_num_references = 3
    p1 = default_params(w, h, qp=31, keyframe_max=250, bframes=2)
    p1.max_num_references = 1
    s2, e2 = encode_sequence(p2, fr)
    s1, _ = encode_sequence(p1, fr)
    assert s2 != s1, "ref count must change B streams"
    for stream, enc in ((s2, e2),):
        pics = Decoder().decode(stream)
        assert len(pics) == len(fr)
        by_poc = {f.disp: f for f in enc}
        for pic in pics:
            f = by_poc[pic.poc]
            assert np.array_equal(pic.y, f.recon[0])
            assert np.array_equal(pic.u, f.recon[1])
            assert np.array_equal(pic.v, f.recon[2])
            assert pic.md5 == f.md5 == pic.sei_md5


def test_b_pyramid_multiref_bit_exact():
    w, h = 96, 64
    fr = flashing_scene(w, h, 10, seed=5)
    p = default_params(w, h, qp=32, keyframe_max=250, bframes=3)
    p.max_num_references = 3
    p.b_pyramid = True
    stream, enc = encode_sequence(p, fr)
    pics = Decoder().decode(stream)
    assert len(pics) == len(fr)
    by_poc = {f.disp: f for f in enc}
    for pic in pics:
        f = by_poc[pic.poc]
        assert np.array_equal(pic.y, f.recon[0])
        assert pic.md5 == f.md5 == pic.sei_md5
