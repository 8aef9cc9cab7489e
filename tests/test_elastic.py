"""Elastic GOP encoding: worker preemption -> re-dispatch, driver
death -> spool resume, and stream equivalence with the plain chunked
encode (SURVEY §5 failure-detection requirement)."""
import threading

import numpy as np
import pytest

from x265_mod_by_patman_tpu.params import default_params
from x265_mod_by_patman_tpu.parallel.gop import encode_gop_parallel
from x265_mod_by_patman_tpu.parallel.elastic import (
    ElasticGopEncoder, WorkerFailure, default_worker)
from x265_mod_by_patman_tpu.decoder.decoder import Decoder


def _frames(n, w=64, h=48):
    rng = np.random.default_rng(2)
    base = rng.integers(0, 255, (h + 32, w + 32)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    out = []
    for i in range(n):
        y = np.clip(base[i % 16:i % 16 + h, i:i + w], 0, 255)
        u = np.full((h // 2, w // 2), 90 + i, np.uint8)
        v = np.full((h // 2, w // 2), 150, np.uint8)
        out.append((y.astype(np.uint8), u, v))
    return out


def _params(w=64, h=48):
    return default_params(w, h, qp=32, keyframe_max=4, bframes=0,
                          scenecut=False, cu_tree=False, aq_mode=0,
                          info_sei=False)


def test_elastic_survives_preemption_and_matches_plain():
    frames = _frames(12)
    p = _params()
    ref_stream, _ = encode_gop_parallel(p, frames, chunk_len=4)

    fails = {"n": 0}
    lock = threading.Lock()

    def flaky(params, chunk, first):
        with lock:
            # preempt the first two dispatches of chunk index != 0
            if not first and fails["n"] < 2:
                fails["n"] += 1
                raise OSError("worker preempted (simulated)")
        return default_worker(params, chunk, first)

    enc = ElasticGopEncoder(_params(), chunk_len=4, workers=2,
                            max_retries=3, worker_fn=flaky)
    stream, report = enc.encode(frames)
    assert fails["n"] == 2
    assert sum(report["retries"].values()) == 2
    assert stream == ref_stream          # deterministic re-dispatch
    pics = Decoder().decode(stream)
    assert len(pics) == 12
    for pc in pics:
        assert pc.md5 == pc.sei_md5


def test_elastic_gives_up_after_max_retries():
    frames = _frames(8)

    def always_dies(params, chunk, first):
        raise OSError("dead worker")

    enc = ElasticGopEncoder(_params(), chunk_len=4, workers=1,
                            max_retries=1, worker_fn=always_dies)
    with pytest.raises(WorkerFailure):
        enc.encode(frames)


def test_elastic_spool_resume(tmp_path):
    frames = _frames(12)
    p = _params()
    ref_stream, _ = encode_gop_parallel(p, frames, chunk_len=4)
    spool = str(tmp_path / "spool")

    calls = {"n": 0}

    def dies_after_first(params, chunk, first):
        calls["n"] += 1
        if calls["n"] > 1:
            raise OSError("driver lost worker")
        return default_worker(params, chunk, first)

    # driver run 1: completes some chunks then dies
    enc1 = ElasticGopEncoder(_params(), chunk_len=4, workers=1,
                             max_retries=0, spool_dir=spool,
                             worker_fn=dies_after_first)
    with pytest.raises(WorkerFailure):
        enc1.encode(frames)

    # driver run 2 (restart): resumes from the spool, encodes only the
    # missing chunks
    calls2 = {"n": 0}

    def counting(params, chunk, first):
        calls2["n"] += 1
        return default_worker(params, chunk, first)

    enc2 = ElasticGopEncoder(_params(), chunk_len=4, workers=1,
                             max_retries=0, spool_dir=spool,
                             worker_fn=counting)
    stream, report = enc2.encode(frames)
    assert report["resumed"] >= 1
    assert calls2["n"] == 3 - report["resumed"]
    assert stream == ref_stream
