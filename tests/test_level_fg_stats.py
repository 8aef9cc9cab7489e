"""Level/tier determination (spec Annex A), film-grain SEI round trip
(D.2.21), and frame-stats CSV level 2."""
import json

import numpy as np
import pytest

from x265_mod_by_patman_tpu.bitstream.level import (
    determine_level, max_dpb_size, level_name)


def test_level_table_spec_points():
    # 1080p30 -> level 4 main tier
    idc, high, dpb = determine_level(1920, 1080, 30.0)
    assert idc == 120 and not high
    # 1080p60 exceeds 4.0 samples/sec -> 4.1
    idc, _, _ = determine_level(1920, 1080, 60.0)
    assert idc == 123
    # 4K60 -> 5.1
    idc, _, _ = determine_level(3840, 2160, 60.0)
    assert idc == 153
    # CIF at 15fps -> level 2
    idc, _, _ = determine_level(352, 288, 15.0)
    assert idc == 60
    # high tier by VBV rate: 1080p30 at 25 Mbps exceeds main 12000
    idc, high, _ = determine_level(1920, 1080, 30.0,
                                   vbv_maxrate_kbps=25000)
    assert idc == 120 and high
    assert level_name(123) == "4.1"


def test_level_dpb_and_forced():
    # A.4.2: full-size pictures allow 6, quarter-size allow 16
    assert max_dpb_size(2228224, 2228224) == 6
    assert max_dpb_size(2228224 // 4, 2228224) == 16
    # forced level too low for the config -> error
    with pytest.raises(ValueError):
        determine_level(3840, 2160, 60.0, forced_idc=120)
    # forced adequate level passes through
    idc, _, _ = determine_level(1920, 1080, 30.0, forced_idc=153)
    assert idc == 153


def test_level_auto_in_sps():
    from x265_mod_by_patman_tpu.params import default_params
    from x265_mod_by_patman_tpu.bitstream.headers import build_sps_info
    p = default_params(1920, 1080)
    p.fps_num, p.fps_denom = 30, 1
    p.validate()
    s = build_sps_info(p)
    assert s.ptl.level_idc == 120
    # --level-idc 51 x265 convention
    p.level_idc = 51
    s = build_sps_info(p)
    assert s.ptl.level_idc == 153


def test_film_grain_sei_roundtrip(tmp_path):
    from x265_mod_by_patman_tpu.bitstream.sei import (
        parse_film_grain_json, write_film_grain, parse_film_grain,
        parse_sei, SEI_FILM_GRAIN_CHARACTERISTICS)
    fg = {
        "model_id": 0, "blending_mode_id": 0, "log2_scale_factor": 4,
        "persistence": True,
        "comp_models": [
            {"num_model_values": 1, "intervals": [
                {"lower": 0, "upper": 127, "values": [48]},
                {"lower": 128, "upper": 255, "values": [32]}]},
            None, None],
    }
    path = tmp_path / "fg.json"
    path.write_text(json.dumps(fg))
    loaded = parse_film_grain_json(str(path))
    rbsp = write_film_grain(loaded)
    msgs = parse_sei(rbsp)
    assert msgs and msgs[0][0] == SEI_FILM_GRAIN_CHARACTERISTICS
    back = parse_film_grain(msgs[0][1])
    assert back["model_id"] == 0
    assert back["log2_scale_factor"] == 4
    assert back["persistence"] is True
    assert back["comp_models"][0]["intervals"] == \
        fg["comp_models"][0]["intervals"]
    assert back["comp_models"][1] is None


def test_film_grain_in_headers(tmp_path):
    from x265_mod_by_patman_tpu.params import default_params
    from x265_mod_by_patman_tpu.encoder.top import Encoder
    fg = {"model_id": 0, "blending_mode_id": 0, "log2_scale_factor": 2,
          "comp_models": [{"num_model_values": 1, "intervals": [
              {"lower": 0, "upper": 255, "values": [40]}]}]}
    path = tmp_path / "fg.json"
    path.write_text(json.dumps(fg))
    p = default_params(64, 48, qp=32, film_grain=str(path))
    hdr = Encoder(p).headers()
    # SEI NAL with payload type 19 present
    assert bytes((0x4E, 0x01, 19)) in hdr or b"\x4e\x01\x13" in hdr


def test_frame_stats_level2():
    from x265_mod_by_patman_tpu.params import default_params
    from x265_mod_by_patman_tpu.encoder.top import encode_sequence
    rng = np.random.default_rng(1)
    base = rng.integers(0, 255, (80, 96)).astype(np.int32)
    frames = []
    for i in range(4):
        y = np.clip(np.roll(base, 2 * i, 1)[:48, :64], 0, 255)
        frames.append((y.astype(np.uint8),
                       np.full((24, 32), 128, np.uint8),
                       np.full((24, 32), 128, np.uint8)))
    p = default_params(64, 48, qp=32, keyframe_max=250, bframes=0,
                       scenecut=False, cu_tree=False, aq_mode=0)
    _, out = encode_sequence(p, frames)
    i_frames = [f for f in out if f.slice_type == "I"]
    p_frames = [f for f in out if f.slice_type == "P"]
    assert i_frames and p_frames
    assert i_frames[0].stats["cu_intra_pct"] == 100.0
    st = p_frames[-1].stats
    assert st["cu_inter_pct"] > 50.0           # pan -> mostly inter
    assert "cu_skip_pct" in st
    assert st.get("avg_mv", 0) >= 0
