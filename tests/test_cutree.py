"""cuTree lookahead: lowres costs, propagation, e2e bit-exactness."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.analysis.lookahead import (
    CuTreeLookahead, lowres_plane)
from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_inter import moving_scene


def test_lowres_plane():
    y = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64)
    lo = lowres_plane(y)
    assert lo.shape == (32, 32)
    assert lo[0, 0] == (int(y[0, 0]) + y[0, 1] + y[1, 0] + y[1, 1] + 2) >> 2


def test_cutree_static_scene_negative_offsets():
    """A static textured scene is fully referenced by the future: every
    frame except the last should get negative offsets."""
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    la = CuTreeLookahead(96, 64, 32)
    for _ in range(8):
        la.push(y)
    off = la.pop()
    assert off.shape == (2, 3)
    assert off.max() <= 0 and off.min() < 0   # strongly propagated


def test_cutree_scene_cut_stops_propagation():
    """Propagation must not cross a scene cut (inter ~ intra there)."""
    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    b = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    la = CuTreeLookahead(96, 64, 32)
    la.push(a)                     # frame 0
    for _ in range(7):
        la.push(b)                 # cut at frame 1
    off0 = la.pop()
    la2 = CuTreeLookahead(96, 64, 32)
    la2.push(a)
    off0_alone = la2.pop()
    # frame 0 gains (almost) nothing from the post-cut future
    assert np.abs(off0 - off0_alone).max() <= 1


def test_cutree_e2e_bit_exact():
    w, h = 96, 64
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=2,
                       rc_mode="crf", crf=30.0, rc_lookahead=6)
    assert p.cu_tree
    enc = Encoder(p)
    assert enc._cutree is not None
    assert enc.pps.cu_qp_delta_enabled
    out = []
    for (y, u, v) in moving_scene(w, h, 10, seed=9):
        out.extend(enc.encode_frame(y, u, v))
    out.extend(enc.flush())
    assert len(out) == 10
    stream = b"".join(f.bitstream for f in out)
    pics = Decoder().decode(stream)
    assert len(pics) == 10
    by_poc = {f.poc: f for f in out}
    for pic in pics:
        f = by_poc[pic.poc]
        assert np.array_equal(pic.y, f.recon[0]), pic.poc
        assert np.array_equal(pic.u, f.recon[1]), pic.poc
        assert np.array_equal(pic.v, f.recon[2]), pic.poc
        assert pic.md5 == f.md5 == pic.sei_md5


def test_cutree_disabled_under_cqp():
    p = default_params(64, 64, qp=30, keyframe_max=250)
    enc = Encoder(p)
    assert enc._cutree is None and not enc.pps.cu_qp_delta_enabled


def test_cutree_b_structure_two_ref():
    """With bframes > 0 the propagation follows the anchor grid
    (slicetype.cpp:3752 two-ref analog): static content pulls anchors
    down, and B frames interpolate their anchors' offsets instead of
    riding a display-order chain."""
    rng = np.random.default_rng(7)
    y = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    la = CuTreeLookahead(96, 64, 32, bframes=2)
    for _ in range(10):
        la.push(y)
    off_anchor = la.pop()           # disp 0: anchor
    off_b1 = la.pop()               # disp 1: B
    off_b2 = la.pop()               # disp 2: B
    assert off_anchor.min() < 0, "anchor must be pulled down"
    # Bs interpolate surrounding anchors -> also negative, and close
    # to the anchor's offsets on static content
    assert off_b1.min() < 0 and off_b2.min() < 0
    assert np.abs(off_b1 - off_anchor).max() <= 2
