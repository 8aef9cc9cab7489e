"""Default scaling lists: matrices, quant/dequant math, e2e."""
import numpy as np
import jax.numpy as jnp

from x265_mod_by_patman_tpu.constants.scaling import default_matrix
from x265_mod_by_patman_tpu.ops.transform import (
    dequant_ref, dequant_dyn, quant_dyn, quant_mats)
from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_inter import moving_scene


def test_default_matrix_shapes():
    assert default_matrix(2, True).min() == 16 == default_matrix(2, True).max()
    m8 = default_matrix(3, True)
    assert m8[0, 0] == 16 and m8[7, 7] == 115
    m16 = default_matrix(4, False)
    assert m16.shape == (16, 16)
    assert m16[0, 0] == 16                      # DC override
    assert m16[1, 1] == 16                      # upsample of base[0,0]
    assert m16[15, 15] == 91


def test_flat_matrix_equals_plain_dequant():
    rng = np.random.default_rng(0)
    lv = rng.integers(-100, 101, (16, 16)).astype(np.int16)
    flat = np.full((16, 16), 16, np.int32)
    assert np.array_equal(dequant_ref(lv, 30, 4, 8),
                          dequant_ref(lv, 30, 4, 8, flat))


def test_batched_dequant_matches_golden():
    rng = np.random.default_rng(1)
    lv = rng.integers(-50, 51, (6, 16, 16)).astype(np.int32)
    intra = jnp.asarray(np.array([1, 0, 1, 0, 1, 0], bool))
    dm = np.stack([default_matrix(4, True), default_matrix(4, False)])
    got = np.asarray(dequant_dyn(jnp.asarray(lv), 31, 4, 8,
                                 jnp.asarray(dm), intra))
    for i in range(6):
        ref = dequant_ref(lv[i].astype(np.int16), 31, 4, 8,
                          dm[0 if i % 2 == 0 else 1])
        assert np.array_equal(got[i], ref), i


def test_scaling_list_e2e_bit_exact():
    p = default_params(96, 64, qp=30, keyframe_max=250, bframes=2,
                       scaling_list="default", wpp=True)
    enc = Encoder(p)
    out = []
    for (y, u, v) in moving_scene(96, 64, 5, seed=4):
        out.extend(enc.encode_frame(y, u, v))
    out.extend(enc.flush())
    pics = Decoder().decode(b"".join(f.bitstream for f in out))
    by = {f.poc: f for f in out}
    for p_ in pics:
        f = by[p_.poc]
        assert np.array_equal(p_.y, f.recon[0])
        assert np.array_equal(p_.u, f.recon[1])
        assert np.array_equal(p_.v, f.recon[2])
        assert p_.md5 == f.md5 == p_.sei_md5


def _write_custom_file(path):
    """x265/HM-format custom scaling-list file: default matrices with
    the high-frequency corner doubled (visible in streams)."""
    from x265_mod_by_patman_tpu.constants.scaling import (
        FLAT4, _D8_INTRA, _D8_INTER)
    names = ("INTRA{}_LUMA", "INTRA{}_CHROMAU", "INTRA{}_CHROMAV",
             "INTER{}_LUMA", "INTER{}_CHROMAU", "INTER{}_CHROMAV")
    sizes = ("4X4", "8X8", "16X16", "32X32")
    with open(path, "w") as f:
        for sid in range(4):
            for lid in range(0, 6, 3 if sid == 3 else 1):
                if sid == 0:
                    m = FLAT4.copy()
                else:
                    m = (_D8_INTRA if lid < 3 else _D8_INTER).copy()
                    m[6:, 6:] = np.minimum(m[6:, 6:] * 2, 255)
                name = names[lid].format(sizes[sid])
                f.write(f"{name} =\n")
                f.write(",".join(str(int(v)) for v in m.ravel()))
                f.write("\n")
                if sid >= 2:
                    f.write(f"{name}_DC =\n16\n")
    return path


def test_custom_scaling_list_roundtrip(tmp_path):
    from x265_mod_by_patman_tpu.constants.scaling import (
        parse_scaling_list_file)
    from x265_mod_by_patman_tpu.bitstream.headers import (
        build_sps_info, write_sps)
    from x265_mod_by_patman_tpu.decoder.decoder import parse_sps
    path = _write_custom_file(str(tmp_path / "lists.txt"))
    lists, dc = parse_scaling_list_file(path)
    assert lists[(1, 0)][7, 7] == 230          # doubled corner
    assert dc[(2, 0)] == 16
    p = default_params(96, 64, qp=30)
    p.scaling_list = path
    p.validate()
    sps = build_sps_info(p)
    assert sps.scaling_lists is not None
    rbsp = write_sps(sps)          # raw RBSP (annexb adds the header)
    sps2 = parse_sps(rbsp)
    lists2, dc2 = sps2.scaling_lists
    for k in lists:
        assert np.array_equal(lists[k], lists2[k]), k
    assert dc == dc2


def test_custom_scaling_list_e2e(tmp_path):
    path = _write_custom_file(str(tmp_path / "lists.txt"))
    frames = moving_scene(96, 64, 3, seed=4)
    outs = {}
    for mode in ("default", path):
        p = default_params(96, 64, qp=28, keyframe_max=250, bframes=0)
        p.scaling_list = mode
        from x265_mod_by_patman_tpu.encoder.top import encode_sequence
        stream, enc = encode_sequence(p, frames)
        pics = Decoder().decode(stream)
        assert len(pics) == 3
        for f, pic in zip(enc, pics):
            assert np.array_equal(pic.y, f.recon[0])
            assert np.array_equal(pic.u, f.recon[1])
            assert np.array_equal(pic.v, f.recon[2])
            assert pic.md5 == f.md5 == pic.sei_md5
        outs[mode] = stream
    assert outs["default"] != outs[path], \
        "custom lists must change the stream"


def test_custom_scaling_list_rdoq_e2e(tmp_path):
    path = _write_custom_file(str(tmp_path / "lists.txt"))
    frames = moving_scene(96, 64, 2, seed=6)
    p = default_params(96, 64, qp=28, keyframe_max=250, bframes=0)
    p.scaling_list = path
    p.rdoq_level = 2
    from x265_mod_by_patman_tpu.encoder.top import encode_sequence
    stream, enc = encode_sequence(p, frames)
    pics = Decoder().decode(stream)
    for f, pic in zip(enc, pics):
        assert np.array_equal(pic.y, f.recon[0])
        assert pic.md5 == f.md5 == pic.sei_md5
