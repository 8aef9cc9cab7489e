"""Analysis save/load: replayed decisions reproduce the stream."""
import numpy as np

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.encoder.top import Encoder
from x265_mod_by_patman_tpu.decoder.decoder import Decoder
from tests.test_e2e_inter import moving_scene


def test_save_load_identical_stream(tmp_path):
    w, h = 96, 64
    frames = moving_scene(w, h, 6, seed=12)
    path = str(tmp_path / "a.bin")

    def run(save, load):
        # info_sei embeds the param string (which names the analysis
        # file), so disable it for byte-comparison
        p = default_params(w, h, qp=30, keyframe_max=250, bframes=2,
                           analysis_save=save, analysis_load=load,
                           info_sei=False)
        enc = Encoder(p)
        out = []
        for f in frames:
            out.extend(enc.encode_frame(*f))
        out.extend(enc.flush())
        enc.write_stats()
        return b"".join(f.bitstream for f in out)

    s1 = run(path, "")
    s2 = run("", path)
    assert s1 == s2                     # replay is bit-identical
    pics = Decoder().decode(s2)
    assert all(p_.md5 == p_.sei_md5 for p_ in pics)
