"""Interlace signaling (--interlace tff/bff): VUI field flags, PTL
source flags, per-AU pic_struct SEI — signaling-only like the
reference (x265 does not field-code either)."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from x265_mod_by_patman_tpu.bitstream.bitreader import BitReader


def _frames(n=4, w=64, h=48):
    rng = np.random.default_rng(6)
    return [(rng.integers(0, 255, (h, w)).astype(np.uint8),
             np.full((h // 2, w // 2), 128, np.uint8),
             np.full((h // 2, w // 2), 128, np.uint8))
            for _ in range(n)]


def test_interlace_tff_signaling():
    p = default_params(64, 48, qp=32, keyframe_max=250, bframes=0)
    p.parse("interlace", "tff")
    assert p.interlace == 1
    stream, encoded = encode_sequence(p, _frames())
    dec = Decoder()
    pics = dec.decode(stream)
    assert len(pics) == 4
    for pc in pics:
        assert pc.md5 == pc.sei_md5
    assert not dec.sps.ptl.progressive_source
    assert dec.sps.ptl.interlaced_source
    # per-AU pic_timing SEI carries alternating pic_struct (tff:
    # top(1) first at even display index)
    pts = [pl for (t, pl) in dec.prefix_seis if t == 1]
    assert len(pts) == 4
    structs = [BitReader(pl).u(4) for pl in pts]
    assert structs == [1, 2, 1, 2]


def test_progressive_default_unchanged():
    p = default_params(64, 48, qp=32, keyframe_max=250, bframes=0)
    stream, encoded = encode_sequence(p, _frames(2))
    dec = Decoder()
    dec.decode(stream)
    assert dec.sps.ptl.progressive_source
    assert not [1 for (t, _) in dec.prefix_seis if t == 1]
