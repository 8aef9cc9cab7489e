"""AMP inter PUs (2NxnU/2NxnD/nLx2N/nRx2N): analysis picks them on
quarter-strip motion boundaries, the stream signals the spec 9.3.3.7
AMP binarization, and the validation decoder reconstructs bit-exact.

Reference: analysis.cpp checkInter AMP shapes, x265.h --amp.
"""
import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import encode_sequence
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def quarter_strip_scene(w, h, n_frames, horiz=True):
    """Two objects moving differently with their boundary at a
    quarter-line INSIDE a 16-block row/column (y=36 / x=36): the block
    row at 32..47 has a 4-px strip continuing the upper object's
    motion — the geometry AMP exists for."""
    rng = np.random.default_rng(11)
    big = rng.integers(0, 255, (h + 128, w + 128)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
           + np.roll(big, (1, 1), (0, 1))) // 4
    B = 36                               # boundary: 16-block + 4
    frames = []
    for i in range(n_frames):
        a = big[16:16 + h, 16 + 3 * i:16 + 3 * i + w]     # obj A: pan x
        b = big[16 + 2 * i:16 + 2 * i + h, 16:16 + w]     # obj B: pan y
        y = np.empty((h, w), np.int32)
        if horiz:
            y[:B] = a[:B]
            y[B:] = b[B:]
        else:
            y[:, :B] = a[:, :B]
            y[:, B:] = b[:, B:]
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 132, np.uint8)
        frames.append((np.clip(y, 0, 255).astype(np.uint8), u, v))
    return frames


def _decode_counting_parts(stream):
    from x265_mod_by_patman_tpu.decoder import decoder as decmod
    parts = []
    orig = decmod.Decoder._recon_cu

    def patched(self, cu, *a, **k):
        if cu.is_inter:
            parts.append(getattr(cu, "part_mode", 0))
        return orig(self, cu, *a, **k)

    decmod.Decoder._recon_cu = patched
    try:
        pics = decmod.Decoder().decode(stream)
    finally:
        decmod.Decoder._recon_cu = orig
    return pics, parts


@pytest.mark.parametrize("horiz", [True, False])
def test_amp_e2e_bit_exact_and_used(horiz):
    w, h = 96, 64
    frames = quarter_strip_scene(w, h, 3, horiz)
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=0,
                       rect=True, amp=True, sao=False, scenecut=False,
                       cu_tree=False, aq_mode=0)
    stream, encoded = encode_sequence(p, frames)
    pics, parts = _decode_counting_parts(stream)
    assert len(pics) == 3
    for i, (f, pic) in enumerate(zip(encoded, pics)):
        assert np.array_equal(pic.y, f.recon[0]), i
        assert np.array_equal(pic.u, f.recon[1]), i
        assert np.array_equal(pic.v, f.recon[2]), i
        assert pic.md5 == f.md5 == pic.sei_md5, i
    # the clip's quarter-strip motion must actually elicit AMP parts
    amp_parts = [pm for pm in parts if pm >= 4]
    assert amp_parts, f"no AMP PUs chosen (parts seen: {set(parts)})"
    if horiz:
        assert any(pm in (4, 5) for pm in amp_parts)
    else:
        assert any(pm in (6, 7) for pm in amp_parts)


def test_amp_partition_geometry():
    from x265_mod_by_patman_tpu.entropy.cu_syntax import pu_partitions
    # spec 7.4.9.5 quarter splits at nbs=16
    assert pu_partitions(0, 0, 16, 4) == [
        (0, 0, 16, 4, None), (0, 4, 16, 12, "no_b1")]
    assert pu_partitions(0, 0, 16, 5) == [
        (0, 0, 16, 12, None), (0, 12, 16, 4, "no_b1")]
    assert pu_partitions(0, 0, 16, 6) == [
        (0, 0, 4, 16, None), (4, 0, 12, 16, "no_a1")]
    assert pu_partitions(0, 0, 16, 7) == [
        (0, 0, 12, 16, None), (12, 0, 4, 16, "no_a1")]


def test_amp_needs_rect_and_flags():
    """amp without rect stays 2Nx2N-or-rect-free (analysis gate), and
    amp=False streams never contain part codes >= 4."""
    w, h = 64, 48
    frames = quarter_strip_scene(w, h, 2, True)
    p = default_params(w, h, qp=30, keyframe_max=250, bframes=0,
                       rect=False, amp=True, sao=False, scenecut=False,
                       cu_tree=False, aq_mode=0)
    stream, encoded = encode_sequence(p, frames)
    pics, parts = _decode_counting_parts(stream)
    for f, pic in zip(encoded, pics):
        assert pic.md5 == f.md5 == pic.sei_md5
    assert all(pm == 0 for pm in parts)
