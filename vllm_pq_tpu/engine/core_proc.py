"""EngineCore in a background process over ZMQ.

Role of the reference's ``EngineCoreProc`` + ``EngineCoreClient``
(``v1/engine/core.py:237-405``, ``core_client.py:35-201``): the
schedule->execute->update busy loop runs in its own process so the
frontend's tokenization/detokenization and HTTP work never stall device
dispatch. Requests flow over a PUSH/PULL pair; outputs flow back over a
second pair; utility RPCs (stats, reset_prefix_cache, profiling) use the
same input socket and return on the output socket tagged by call id.

Serialization is pickle protocol 5 (trusted same-host IPC; the reference
uses msgspec/msgpack for the same purpose, ``v1/serial_utils.py``).
Worker death: the child sends a sentinel on its output socket and exits
nonzero; the parent raises ``EngineDeadError`` on the next interaction
(reference SIGUSR1 pattern, ``core.py:300-303``).
"""

import multiprocessing as mp
import os
import pickle
import queue
import signal
import tempfile
import threading
import time
import traceback
from typing import Any, List, Optional, Tuple

from vllm_pq_tpu.config import EngineConfig
from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)

_SENTINEL = b"__ENGINE_DEAD__"


class EngineDeadProcError(RuntimeError):
    pass


def _sock_pair_addrs() -> Tuple[str, str]:
    d = tempfile.mkdtemp(prefix="vpq_zmq_")
    return (f"ipc://{d}/input.sock", f"ipc://{d}/output.sock")


def run_engine_core(config: EngineConfig, input_addr: str,
                    output_addr: str) -> None:
    """Child process entry: busy loop (reference ``run_busy_loop``,
    ``core.py:309-333``)."""
    import zmq

    # die if the parent dies
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        PR_SET_PDEATHSIG = 1
        libc.prctl(PR_SET_PDEATHSIG, signal.SIGKILL)
    except Exception:
        pass

    ctx = zmq.Context()
    in_sock = ctx.socket(zmq.PULL)
    in_sock.connect(input_addr)
    out_sock = ctx.socket(zmq.PUSH)
    out_sock.connect(output_addr)

    try:
        from vllm_pq_tpu.engine.core import EngineCore
        core = EngineCore(config)
        out_sock.send(pickle.dumps(("ready", None)))

        while True:
            # drain the input queue; block only when idle
            timeout = 0 if core.has_unfinished_requests() else 100
            while in_sock.poll(timeout=timeout):
                kind, payload = pickle.loads(in_sock.recv())
                if kind == "add":
                    core.add_request(payload)
                elif kind == "abort":
                    core.abort_requests(payload)
                elif kind == "shutdown":
                    out_sock.send(pickle.dumps(("bye", None)))
                    return
                elif kind == "rpc":
                    call_id, method, args = payload
                    try:
                        result = getattr(core, method)(*args)
                        out_sock.send(pickle.dumps(
                            ("rpc", (call_id, result, None))))
                    except Exception as e:  # noqa: BLE001
                        out_sock.send(pickle.dumps(
                            ("rpc", (call_id, None, repr(e)))))
                timeout = 0
            if core.has_unfinished_requests():
                outputs = core.step()
                if outputs:
                    out_sock.send(pickle.dumps(("outputs", outputs)))
    except Exception:  # noqa: BLE001
        logger.error("EngineCore died:\n%s", traceback.format_exc())
        try:
            out_sock.send(pickle.dumps(
                ("dead", traceback.format_exc())), zmq.NOBLOCK)
        except Exception:  # noqa: BLE001
            pass
        os._exit(1)


class MPEngineCoreClient:
    """Parent-side client. API mirrors EngineCore so LLMEngine/AsyncLLM
    can use either interchangeably (reference InprocClient/MPClient
    duality, ``core_client.py:146+``)."""

    def __init__(self, config: EngineConfig):
        import zmq

        self.ctx = zmq.Context()
        input_addr, output_addr = _sock_pair_addrs()
        self.in_sock = self.ctx.socket(zmq.PUSH)
        self.in_sock.bind(input_addr)
        self.out_sock = self.ctx.socket(zmq.PULL)
        self.out_sock.bind(output_addr)

        mp_ctx = mp.get_context("spawn")
        self.proc = mp_ctx.Process(
            target=run_engine_core,
            args=(config, input_addr, output_addr),
            daemon=True, name="EngineCore")
        self.proc.start()
        self._dead: Optional[str] = None
        self._outputs: "queue.Queue[List]" = queue.Queue()
        self._rpc_results = {}
        self._rpc_lock = threading.Lock()
        self._rpc_counter = 0
        self._unfinished = 0

        # wait for ready (engine init compiles/loads the model)
        kind, payload = self._recv(timeout_s=600.0)
        if kind != "ready":
            raise EngineDeadProcError(f"engine failed to start: {payload}")

        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()
        # watchdog: a silently-killed engine process (SIGKILL sends no
        # "dead" message) surfaces within ~1s instead of blocking
        # readers until their timeout (role of the reference MQ engine
        # health-check loop, engine/multiprocessing/)
        self._watchdog = threading.Thread(target=self._watch_loop,
                                          daemon=True)
        self._watchdog.start()

    def _watch_loop(self) -> None:
        import time
        while True:
            time.sleep(1.0)
            if self._dead is not None:
                return
            if not self.proc.is_alive():
                self._dead = ("engine core process died "
                              f"(exitcode {self.proc.exitcode})")
                self._outputs.put(None)
                return

    def health(self) -> bool:
        """Raises EngineDeadProcError when the engine proc is gone."""
        self._check_dead()
        return True

    # -- wire helpers ---------------------------------------------------

    def _recv(self, timeout_s: float):
        if not self.out_sock.poll(timeout=int(timeout_s * 1000)):
            raise EngineDeadProcError("engine core timed out")
        return pickle.loads(self.out_sock.recv())

    def _read_loop(self) -> None:
        while True:
            try:
                kind, payload = pickle.loads(self.out_sock.recv())
            except Exception:  # noqa: BLE001
                return
            if kind == "outputs":
                self._outputs.put(payload)
            elif kind == "rpc":
                call_id, result, err = payload
                with self._rpc_lock:
                    self._rpc_results[call_id] = (result, err)
            elif kind == "dead":
                self._dead = payload
                self._outputs.put(None)
                return
            elif kind == "bye":
                return

    def _check_dead(self) -> None:
        if self._dead is not None:
            raise EngineDeadProcError(self._dead)
        if not self.proc.is_alive():
            raise EngineDeadProcError("engine core process exited")

    # -- EngineCore API -------------------------------------------------

    def add_request(self, request) -> None:
        self._check_dead()
        self._unfinished += 1
        self.in_sock.send(pickle.dumps(("add", request)))

    def abort_requests(self, request_ids) -> None:
        self.in_sock.send(pickle.dumps(("abort", request_ids)))

    def has_unfinished_requests(self) -> bool:
        return self._unfinished > 0

    def get_output(self, timeout_s: float = 600.0) -> List:
        """Blocking pull of the next batch of EngineCoreOutputs."""
        self._check_dead()
        try:
            outputs = self._outputs.get(timeout=timeout_s)
        except queue.Empty:
            self._check_dead()
            raise EngineDeadProcError("no engine output (timeout)")
        if outputs is None:
            self._check_dead()
            return []
        for o in outputs:
            if o.finish_reason is not None:
                self._unfinished -= 1
        return outputs

    def step(self) -> List:
        """Synchronous facade: wait for the next output batch."""
        if not self.has_unfinished_requests():
            return []
        return self.get_output()

    def call(self, method: str, *args, timeout_s: float = 600.0) -> Any:
        """Utility RPC (stats/reset_prefix_cache/profiling...)."""
        self._check_dead()
        with self._rpc_lock:
            self._rpc_counter += 1
            call_id = self._rpc_counter
        self.in_sock.send(pickle.dumps(("rpc", (call_id, method, args))))
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            with self._rpc_lock:
                if call_id in self._rpc_results:
                    result, err = self._rpc_results.pop(call_id)
                    if err is not None:
                        raise RuntimeError(err)
                    return result
            self._check_dead()
            time.sleep(0.002)
        raise EngineDeadProcError(f"rpc {method} timed out")

    # facades matching EngineCore utility methods
    def encode(self, ids_list, pool=None):
        return self.call("encode", ids_list, pool)

    def classify(self, ids_list, type_ids_list=None):
        return self.call("classify", ids_list, type_ids_list)

    def reset_prefix_cache(self) -> bool:
        return self.call("reset_prefix_cache")

    def make_stats(self) -> dict:
        return self.call("make_stats")

    def add_lora(self, lora_model) -> int:
        return self.call("add_lora", lora_model)

    def remove_lora(self, name: str) -> bool:
        return self.call("remove_lora", name)

    def sleep(self, level: int = 1) -> None:
        self.call("sleep", level)

    def wake_up(self) -> None:
        self.call("wake_up")

    def profile_start(self, path: str) -> None:
        self.call("profile_start", path)

    def profile_stop(self) -> None:
        self.call("profile_stop")

    def shutdown(self) -> None:
        try:
            self.in_sock.send(pickle.dumps(("shutdown", None)))
            self.proc.join(timeout=5)
        except Exception:  # noqa: BLE001
            pass
        if self.proc.is_alive():
            self.proc.kill()
