"""C++ shared-memory broadcast ring: single-process roundtrip, ring wrap,
cross-process broadcast to 2 readers (role of reference
tests/distributed/test_shm_broadcast.py)."""

import multiprocessing as mp
import pickle

import pytest

from vllm_pq_tpu.distributed.shm_ring import ShmRing, _build_lib


def test_native_lib_builds():
    assert _build_lib() is not None, "g++ extension must build here"


def test_roundtrip_and_wrap():
    ring = ShmRing(capacity=4, slot_size=256, n_readers=1)
    try:
        for i in range(10):  # wraps the 4-slot ring twice
            msg = f"message-{i}".encode()
            ring.write(msg)
            assert ring.read(0) == msg
    finally:
        ring.close()


def test_backpressure_timeout():
    ring = ShmRing(capacity=2, slot_size=64, n_readers=1)
    try:
        ring.write(b"a")
        ring.write(b"b")
        with pytest.raises(TimeoutError):
            ring.write(b"c", spin=1000)  # reader never drains
    finally:
        ring.close()


def _reader_proc(name, reader_id, n, out_q):
    ring = ShmRing(name=name, create=False, capacity=8, slot_size=4096,
                   n_readers=2)
    got = []
    for _ in range(n):
        got.append(pickle.loads(ring.read(reader_id)))
    ring.shm.close()
    out_q.put((reader_id, got))


def test_cross_process_broadcast():
    if _build_lib() is None:
        pytest.skip("native lib unavailable")
    ring = ShmRing(capacity=8, slot_size=4096, n_readers=2)
    try:
        ctx = mp.get_context("spawn")
        out_q = ctx.Queue()
        procs = [ctx.Process(target=_reader_proc,
                             args=(ring.name, rid, 20, out_q))
                 for rid in range(2)]
        for p in procs:
            p.start()
        msgs = [{"step": i, "ids": list(range(i))} for i in range(20)]
        for m in msgs:
            ring.write(pickle.dumps(m))
        results = {}
        for _ in range(2):
            rid, got = out_q.get(timeout=30)
            results[rid] = got
        for p in procs:
            p.join(timeout=10)
        assert results[0] == msgs
        assert results[1] == msgs
    finally:
        ring.close()
