"""KV transfer for disaggregated prefill (role of reference
``vllm/distributed/kv_transfer/`` — KV pipe / KV lookup buffer / KV
connector three-layer design, ``kv_transfer/README.md:9-13``,
``simple_connector.py``, ``pynccl_pipe.py``, ``simple_buffer.py``).

TPU-native shape: the transfer unit is a request's KV PAGES gathered
from the paged cache (``runner.gather_kv``), moved host-side as one
numpy block, and injected on the consumer straight into the PREFIX
CACHE hash chain (``KVCacheManager.import_prefix``) — so the consumer's
scheduler picks transferred KV up through the exact same
``get_computed_blocks`` path as a local prefix hit, with zero special
cases past admission. NCCL pipes are replaced by ZMQ for the host hop
(device-to-device ICI transfer between pod slices is follow-up work).

Producer flow:  request finishes prefill -> gather full-block KV ->
                pipe.send((key, token_ids, kv))
Consumer flow:  request arrives -> buffer.drain(pipe) ->
                lookup(key) -> import_prefix + scatter_kv -> schedule
                sees a cached prefix and computes only the tail.
"""

import hashlib
import pickle
import threading
from collections import OrderedDict, deque
from typing import Any, List, Optional, Tuple

import numpy as np

from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)


def prompt_key(token_ids: List[int]) -> bytes:
    """Stable lookup key for a prompt (role of the reference buffer's
    input-tokens + roi key, simple_buffer.py)."""
    h = hashlib.sha256()
    h.update(np.asarray(token_ids, np.int64).tobytes())
    return h.digest()


# ---------------------------------------------------------------------------
# pipes


class InprocPipe:
    """In-process pipe for tests and single-proc producer+consumer
    colocation: a thread-safe deque shared by both endpoints."""

    def __init__(self, queue: Optional[deque] = None):
        self.queue = queue if queue is not None else deque()
        self._lock = threading.Lock()

    def send(self, obj: Any) -> None:
        with self._lock:
            self.queue.append(obj)

    def recv_nowait(self) -> Optional[Any]:
        with self._lock:
            return self.queue.popleft() if self.queue else None

    def close(self) -> None:
        pass


class ZmqKVPipe:
    """ZMQ PUSH/PULL pipe between prefill and decode instances (role of
    reference PyNcclPipe / MooncakePipe for the host-side hop)."""

    def __init__(self, role: str, endpoint: str):
        import zmq
        self.ctx = zmq.Context.instance()
        if role == "kv_producer":
            self.sock = self.ctx.socket(zmq.PUSH)
            self.sock.connect(endpoint)
        else:
            self.sock = self.ctx.socket(zmq.PULL)
            self.sock.bind(endpoint)
        self.role = role

    def send(self, obj: Any) -> None:
        self.sock.send(pickle.dumps(obj, protocol=5))

    def recv_nowait(self) -> Optional[Any]:
        import zmq
        try:
            data = self.sock.recv(flags=zmq.NOBLOCK)
        except zmq.Again:
            return None
        return pickle.loads(data)

    def close(self) -> None:
        self.sock.close(linger=0)


# ---------------------------------------------------------------------------


class KVLookupBuffer:
    """Consumer-side staging buffer: payloads pulled off the pipe wait
    here until the matching request arrives (role of reference
    SimpleKVLookupBuffer, simple_buffer.py). FIFO-evicted at a byte
    cap so a missing consumer request can't OOM the host."""

    def __init__(self, max_bytes: int = 4 << 30):
        self.max_bytes = max_bytes
        self._bytes = 0
        self._store: "OrderedDict[bytes, Tuple]" = OrderedDict()

    def insert(self, key: bytes, payload: Tuple) -> None:
        kv = payload[1]
        nbytes = kv.nbytes if hasattr(kv, "nbytes") else 0
        while self._bytes + nbytes > self.max_bytes and self._store:
            _, old = self._store.popitem(last=False)
            self._bytes -= getattr(old[1], "nbytes", 0)
            logger.warning("kv_transfer buffer full: evicted an entry")
        self._store[key] = payload
        self._bytes += nbytes

    def drop_select(self, key: bytes) -> Optional[Tuple]:
        payload = self._store.pop(key, None)
        if payload is not None:
            self._bytes -= getattr(payload[1], "nbytes", 0)
        return payload

    def __len__(self) -> int:
        return len(self._store)


class KVConnector:
    """Engine-facing facade (role of reference SimpleConnector:
    send_kv_caches_and_hidden_states / recv_kv_caches_and_hidden_states,
    simple_connector.py)."""

    def __init__(self, role: str, pipe, buffer_bytes: int = 4 << 30):
        assert role in ("kv_producer", "kv_consumer")
        self.role = role
        self.pipe = pipe
        self.buffer = KVLookupBuffer(buffer_bytes) \
            if role == "kv_consumer" else None

    # -- producer ------------------------------------------------------

    def send_kv(self, token_ids: List[int], num_tokens: int,
                kv: np.ndarray) -> None:
        """kv: [L, n_full_blocks, page_size, ...] gathered pages for the
        first ``num_tokens`` (full blocks) of ``token_ids``."""
        self.pipe.send((prompt_key(token_ids), kv, num_tokens,
                        list(token_ids)))

    # -- consumer ------------------------------------------------------

    def lookup(self, token_ids: List[int]) -> Optional[Tuple]:
        """Drain the pipe into the buffer, then pop a payload for this
        prompt. Returns (kv, num_tokens) or None."""
        while True:
            msg = self.pipe.recv_nowait()
            if msg is None:
                break
            key, kv, num_tokens, toks = msg
            self.buffer.insert(key, (key, kv, num_tokens, toks))
        payload = self.buffer.drop_select(prompt_key(token_ids))
        if payload is None:
            return None
        _, kv, num_tokens, _ = payload
        return kv, num_tokens

    def close(self) -> None:
        self.pipe.close()


def make_connector(config) -> Optional[KVConnector]:
    """Build from EngineConfig.kv_transfer (None when disabled)."""
    kt = config.kv_transfer
    if not kt.kv_role:
        return None
    pipe = ZmqKVPipe(kt.kv_role, kt.kv_endpoint)
    return KVConnector(kt.kv_role, pipe, kt.kv_buffer_bytes)
