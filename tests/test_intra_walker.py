"""Native intra-slice walker parity: the C phase-1 walk
(entropy_kernels.c intra_slice_bins) must produce byte-identical slices
to the python SliceSyntaxEncoder across the configurations it covers
(CTU 32/64, tree and legacy 32-merges, AQ/dqp, SAO, WPP, 10-bit,
partial border CTUs), and must NOT engage for configs it doesn't."""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_intra import synth_frame


def _encode(p, frames, force_python=False, monkeypatch=None,
            engaged=None):
    enc = Encoder(p)
    if force_python:
        monkeypatch.setattr(Encoder, "_native_intra_rows",
                            lambda self, *a, **k: None)
    elif engaged is not None:
        orig = Encoder._native_intra_rows

        def spy(self, *a, **k):
            r = orig(self, *a, **k)
            if r is not None:
                engaged.append(True)
            return r

        monkeypatch.setattr(Encoder, "_native_intra_rows", spy)
    out = b""
    for f in frames:
        for fr in enc.encode_frame(*f):
            out += fr.bitstream
    for fr in enc.flush():
        out += fr.bitstream
    return out


CFGS = [
    dict(),                                       # tree CU32, deblock
    dict(sao=True),                               # + SAO syntax
    dict(aq_mode=2, aq_strength=1.2),             # dqp / qp_map
    dict(wpp=True),                               # per-row substreams
    dict(ctu_size=64),                            # 4-level quadtree
    dict(rd_level=2),                             # legacy same-mode merge
    dict(bit_depth=10),                           # 10-bit SAO cmax/levels
    dict(sign_hide=True),
]


@pytest.mark.parametrize("kw", CFGS, ids=[str(sorted(c)) for c in CFGS])
def test_walker_matches_python(kw, monkeypatch):
    w, h = (112, 80)
    bd = kw.get("bit_depth", 8)
    frames = [synth_frame(w, h, seed=i, motion=i) for i in range(2)]
    if bd > 8:
        frames = [tuple((np.asarray(pl, np.uint16) << (bd - 8))
                        for pl in f) for f in frames]
    p = default_params(w, h, qp=30, keyframe_max=1, **kw)
    from x265_mod_by_patman_tpu.entropy.residual import _native_setup
    engaged = []
    a = _encode(p, frames, monkeypatch=monkeypatch, engaged=engaged)
    b = _encode(p, frames, force_python=True, monkeypatch=monkeypatch)
    assert a == b
    if _native_setup():
        # parity must not pass vacuously: the C walker has to have run
        assert engaged, "native walker did not engage for this config"
    pics = Decoder().decode(a)
    assert len(pics) == 2
    for pc in pics:
        assert pc.md5 == pc.sei_md5


def test_walker_engages(monkeypatch):
    """The fast path actually runs for the bench configuration (guards
    against silently falling back to python)."""
    from x265_mod_by_patman_tpu.entropy.residual import _native_setup
    if not _native_setup():
        pytest.skip("native library unavailable")
    called = {}
    orig = Encoder._native_intra_rows

    def spy(self, *a, **k):
        r = orig(self, *a, **k)
        called["rows"] = r is not None
        return r

    monkeypatch.setattr(Encoder, "_native_intra_rows", spy)
    p = default_params(96, 48, qp=32, keyframe_max=1, sao=False)
    _ = _encode(p, [synth_frame(96, 48)])
    assert called.get("rows") is True
