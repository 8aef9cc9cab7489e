"""Cross-process cuTree share over RingMem (the ABR-ladder analysis
reuse, reference ratecontrol.cpp:380)."""
import numpy as np

from x265_mod_by_patman_tpu.analysis.cutree_share import (
    CuTreeShareWriter, CuTreeShareReader)


def test_share_roundtrip_and_rescale():
    w = CuTreeShareWriter("x265tpu_test_ct", 4, 6)
    try:
        r = CuTreeShareReader("x265tpu_test_ct")
        off0 = -np.arange(24, dtype=np.int32).reshape(4, 6) % 7
        assert w.publish(0, off0)
        w.publish(1, np.full((4, 6), -3, np.int32))
        got = r.get(0, 4, 6)
        assert np.array_equal(got, off0)
        # rescale to a smaller rung's CTU grid
        got1 = r.get(1, 2, 3)
        assert got1.shape == (2, 3)
        assert (got1 == -3).all()
        # missing index -> None (no stall)
        assert r.get(7, 4, 6) is None
        r.close()
    finally:
        w.close()


def test_ladder_share_consumes_master_offsets():
    from x265_mod_by_patman_tpu.parallel.ladder import AbrLadder, Rung
    rng = np.random.default_rng(3)
    big = rng.integers(0, 255, (96 + 32, 128 + 32)).astype(np.int32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)) // 3
    frames = []
    for i in range(8):
        y = np.clip(big[i:i + 96, 2 * i:2 * i + 128], 0, 255)
        frames.append((y.astype(np.uint8),
                       np.full((48, 64), 128, np.uint8),
                       np.full((48, 64), 128, np.uint8)))
    lad = AbrLadder([Rung(128, 96, rc_mode="abr", bitrate_kbps=800),
                     Rung(64, 48, rc_mode="abr", bitrate_kbps=300)],
                    share_cutree=True, rc_lookahead=4, bframes=0,
                    scenecut=False, keyframe_max=250)
    assert lad.encoders[0]._ctshare_w is not None
    assert lad.encoders[1]._ctshare_r is not None
    assert lad.encoders[1]._cutree is None       # no own lookahead
    outs = [[], []]
    for f in frames:
        for i, fr in enumerate(lad.encode_frame(*f)):
            outs[i].extend(fr)
    for i, fr in enumerate(lad.flush()):
        outs[i].extend(fr)
    assert len(outs[0]) == 8 and len(outs[1]) == 8
    # both rungs decode clean
    from x265_mod_by_patman_tpu.decoder.decoder import Decoder
    for i, enc in enumerate(lad.encoders):
        bs = enc.headers() + b"".join(f.bitstream for f in outs[i])
        pics = Decoder().decode(bs)
        assert len(pics) == 8
        for pc in pics:
            assert pc.md5 == pc.sei_md5, (i, pc.poc)
    lad.encoders[0]._ctshare_w.close()
