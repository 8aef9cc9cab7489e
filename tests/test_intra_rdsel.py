"""In-wavefront RD intra mode selection (rd_level >= 4): the wavefront
evaluates the analysis' top-3 candidates with full quant/recon and the
slice codes the winners; streams stay bit-exact against the decoder."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_intra import synth_frame


@pytest.mark.parametrize("kw", [dict(), dict(ctu_size=16),
                                dict(aq_mode=2)],
                         ids=["tree", "ctu16", "aq"])
def test_rdsel_e2e_bitexact(kw):
    w, h = 112, 80
    y, u, v = synth_frame(w, h, seed=3)
    p = default_params(w, h, qp=30, keyframe_max=1, rd_level=4, **kw)
    enc = Encoder(p)
    [f] = enc.encode_frame(y, u, v)
    pics = Decoder().decode(f.bitstream)
    assert pics[0].md5 == pics[0].sei_md5 == f.md5


def test_rdsel_changes_modes():
    """The RD pass must actually flip some winners vs the SATD slot-0
    choice (engagement guard)."""
    w, h = 112, 80
    y, u, v = synth_frame(w, h, seed=5)
    outs = {}
    for rd in (2, 4):
        p = default_params(w, h, qp=30, keyframe_max=1, rd_level=rd,
                           ctu_size=16)
        enc = Encoder(p)
        [f] = enc.encode_frame(y, u, v)
        pics = Decoder().decode(f.bitstream)
        assert pics[0].md5 == f.md5
        outs[rd] = f.bitstream
    assert outs[2] != outs[4], "rd 4 must differ from rd 2"
