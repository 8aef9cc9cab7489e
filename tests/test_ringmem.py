"""Cross-process shared-memory ring (cuTree share primitive)."""
import multiprocessing as mp
import numpy as np

from x265_mod_by_patman_tpu.utils.ringmem import RingMem


def test_ring_basic():
    r = RingMem("t_basic", rec_size=16, capacity=4, create=True)
    try:
        assert r.pop() is None
        assert r.push(b"hello")
        assert r.push(b"world0123456789x")
        assert r.pop()[:5] == b"hello"
        assert r.pop()[:5] == b"world"
        assert r.pop() is None
    finally:
        r.close(); r.unlink()


def test_ring_full_drops():
    r = RingMem("t_full", rec_size=8, capacity=2, create=True)
    try:
        assert r.push(b"a") and r.push(b"b")
        assert not r.push(b"c")              # full -> dropped
        assert r.pop()[:1] == b"a"
        assert r.push(b"c")
    finally:
        r.close(); r.unlink()


def _writer(name, n):
    r = RingMem(name)
    for i in range(n):
        while not r.push(i.to_bytes(8, "little")):
            pass
    r.close()


def test_ring_cross_process():
    """A child process streams cuTree-style records through the ring
    (the reference's ABR-ladder share, ratecontrol.cpp:380)."""
    name = "t_xproc"
    r = RingMem(name, rec_size=8, capacity=8, create=True)
    try:
        ctx = mp.get_context("spawn")
        pr = ctx.Process(target=_writer, args=(name, 50))
        pr.start()
        got = []
        while len(got) < 50:
            rec = r.pop()
            if rec is not None:
                got.append(int.from_bytes(rec, "little"))
        pr.join(timeout=30)
        assert got == list(range(50))
    finally:
        r.close(); r.unlink()
