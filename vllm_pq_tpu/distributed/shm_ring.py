"""Python bindings for the C++ shared-memory broadcast ring
(``csrc/shm_ring.cpp``) — scheduler->worker broadcast transport (role of
reference ``shm_broadcast.py:177`` MessageQueue; the hot path is native).

The extension is compiled on demand with g++ into a per-user cache dir
(no pip/build step; ctypes ABI). A pure-python struct-based fallback
keeps the queue functional where no compiler exists.
"""

import ctypes
import hashlib
import os
import subprocess
import tempfile
from multiprocessing import shared_memory
from typing import Optional

from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc", "shm_ring.cpp")

_LIB = None
_LIB_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        tag = hashlib.sha256(src).hexdigest()[:16]
        cache = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "vllm_pq_tpu")
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, f"shm_ring_{tag}.so")
        if not os.path.exists(so):
            tmp = so + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", tmp],
                check=True, capture_output=True)
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        lib.shm_ring_bytes.restype = ctypes.c_uint64
        lib.shm_ring_bytes.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
        lib.shm_ring_init.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                      ctypes.c_uint64, ctypes.c_uint64]
        lib.shm_ring_write.restype = ctypes.c_int
        lib.shm_ring_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_uint64, ctypes.c_uint64]
        lib.shm_ring_read.restype = ctypes.c_long
        lib.shm_ring_read.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                      ctypes.c_void_p, ctypes.c_uint64,
                                      ctypes.c_uint64]
        _LIB = lib
    except Exception as e:  # noqa: BLE001
        logger.warning("shm_ring native build unavailable (%s); "
                       "falling back to pure-python ring", e)
    return _LIB


DEFAULT_SPIN = 10_000_000  # sched_yield iterations (~tens of seconds)


class ShmRing:
    """Single-writer multi-reader broadcast queue over shared memory.

    One process creates it (``create=True``); workers attach by name.
    """

    def __init__(self, capacity: int = 64, slot_size: int = 1 << 20,
                 n_readers: int = 1, name: Optional[str] = None,
                 create: bool = True):
        self.capacity = capacity
        self.slot_size = slot_size
        self.n_readers = n_readers
        lib = _build_lib()
        self._native = lib is not None
        nbytes = (int(lib.shm_ring_bytes(capacity, slot_size)) if lib
                  else 16 + capacity * (16 + slot_size))
        if create:
            self.shm = shared_memory.SharedMemory(create=True, size=nbytes,
                                                  name=name)
            if lib:
                lib.shm_ring_init(self._base(), capacity, slot_size,
                                  n_readers)
            else:
                self._py_init()
        else:
            assert name is not None
            self.shm = shared_memory.SharedMemory(name=name)
        self.name = self.shm.name
        self._owner = create

    def _base(self):
        return ctypes.addressof(
            ctypes.c_char.from_buffer(self.shm.buf))

    # -- native-backed ops ----------------------------------------------

    def write(self, payload: bytes, spin: int = DEFAULT_SPIN) -> None:
        if self._native:
            rc = _LIB.shm_ring_write(self._base(), payload, len(payload),
                                     spin)
            if rc == -1:
                raise ValueError(
                    f"payload {len(payload)} > slot {self.slot_size}")
            if rc == -2:
                raise TimeoutError("ring full: readers stalled")
            return
        self._py_write(payload)

    def read(self, reader_id: int, spin: int = DEFAULT_SPIN) -> bytes:
        if self._native:
            out = ctypes.create_string_buffer(self.slot_size)
            n = _LIB.shm_ring_read(self._base(), reader_id, out,
                                   self.slot_size, spin)
            if n == -2:
                raise TimeoutError("ring empty: writer stalled")
            if n < 0:
                raise RuntimeError(f"shm_ring_read error {n}")
            return out.raw[:n]
        return self._py_read(reader_id)

    # -- pure-python fallback (same layout idea, struct + polling) ------

    def _py_init(self):
        import struct
        self.shm.buf[:16] = struct.pack("<QQ", 0, 0)  # head, pad
        # per-reader tails live in the writer process only (fallback is
        # single-process testing aid)
        self._py_tails = [0] * self.n_readers

    def _py_write(self, payload: bytes):
        import struct
        head = struct.unpack_from("<Q", self.shm.buf, 0)[0]
        stride = 16 + self.slot_size
        off = 16 + (head % self.capacity) * stride
        struct.pack_into("<QQ", self.shm.buf, off, head + 1, len(payload))
        self.shm.buf[off + 16:off + 16 + len(payload)] = payload
        struct.pack_into("<Q", self.shm.buf, 0, head + 1)

    def _py_read(self, reader_id: int) -> bytes:
        import struct
        import time
        want = self._py_tails[reader_id]
        stride = 16 + self.slot_size
        off = 16 + (want % self.capacity) * stride
        deadline = time.monotonic() + 30
        while True:
            seq, ln = struct.unpack_from("<QQ", self.shm.buf, off)
            if seq == want + 1:
                break
            if time.monotonic() > deadline:
                raise TimeoutError("ring empty")
            time.sleep(0.0001)
        data = bytes(self.shm.buf[off + 16:off + 16 + ln])
        self._py_tails[reader_id] = want + 1
        return data

    def close(self):
        try:
            self.shm.close()
            if self._owner:
                self.shm.unlink()
        except Exception:  # noqa: BLE001
            pass
