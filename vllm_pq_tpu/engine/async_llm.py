"""AsyncLLM: asyncio wrapper over the sync engine (role of reference
``v1/engine/async_llm.py:39``).

A dedicated engine thread runs the schedule->execute->update loop
whenever requests exist; finished/streamed outputs are routed to
per-request asyncio queues on the event loop (the reference's
output_handler pattern, ``async_llm.py:280+``)."""

import asyncio
import threading
import time
from typing import AsyncGenerator, Dict, Optional, Union

from vllm_pq_tpu.config import EngineConfig
from vllm_pq_tpu.engine.llm_engine import LLMEngine
from vllm_pq_tpu.logger import init_logger
from vllm_pq_tpu.outputs import RequestOutput
from vllm_pq_tpu.sampling_params import RequestOutputKind, SamplingParams
from vllm_pq_tpu.utils import random_uuid

logger = init_logger(__name__)


class EngineDeadError(RuntimeError):
    pass


class AsyncLLM:

    def __init__(self, config: EngineConfig):
        if config.parallel.data_parallel_size > 1:
            from vllm_pq_tpu.engine.dp_engine import DPLLMEngine
            self.engine = DPLLMEngine(config)
        else:
            self.engine = LLMEngine(config)
        self.config = config
        self._lock = threading.Lock()
        # adds/aborts ride a thread-safe queue drained by the engine
        # thread: acquiring the lock from the event loop starves behind
        # the hot engine loop (measured: TTFT p50 66 s at 1 QPS while
        # TPOT was 32 ms — the step loop re-acquires instantly)
        from collections import deque
        self._pending = deque()
        self._admin_waiting = 0
        self._streams: Dict[str, asyncio.Queue] = {}
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._wakeup = threading.Event()
        self._shutdown = False
        self.dead_error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run_engine,
                                        name="engine-loop", daemon=True)
        self._thread.start()

    @classmethod
    def from_engine_args(cls, engine_args) -> "AsyncLLM":
        return cls(engine_args.create_engine_config())

    @property
    def errored(self) -> bool:
        return self.dead_error is not None

    # ------------------------------------------------------------------

    def _drain_pending(self) -> None:
        while self._pending:
            op = self._pending.popleft()
            try:
                if op[0] == "add":
                    _, rid, prompt, sp, lora = op
                    self.engine.add_request(rid, prompt, sp,
                                            lora_request=lora)
                else:
                    self.engine.abort_request(op[1])
            except BaseException as e:  # bad request: fail its stream
                q = self._streams.pop(op[1], None)
                if q is not None and self._loop is not None:
                    self._loop.call_soon_threadsafe(q.put_nowait, e)

    def _run_engine(self) -> None:
        while not self._shutdown:
            with self._lock:
                self._drain_pending()
                busy = self.engine.has_unfinished_requests()
                if busy:
                    try:
                        t0 = time.monotonic()
                        outputs = self.engine.step()
                        dt = time.monotonic() - t0
                        if dt > 1.0:
                            logger.warning(
                                "engine step took %.1f s (one-time "
                                "compile/load or overload)", dt)
                    except BaseException as e:  # engine death => fail fast
                        logger.exception("engine loop died")
                        self.dead_error = e
                        self._fail_all_streams(e)
                        return
                    for out in outputs:
                        self._route(out)
            if self._admin_waiting > 0:
                # let a blocking admin RPC (stats/reset/profile) in;
                # bare Lock release gives no handoff fairness
                time.sleep(0.001)
            if not busy:
                self._wakeup.wait(timeout=0.005)
                self._wakeup.clear()

    def _route(self, out: RequestOutput) -> None:
        q = self._streams.get(out.request_id)
        if q is None or self._loop is None:
            return
        self._loop.call_soon_threadsafe(q.put_nowait, out)
        if out.finished:
            self._streams.pop(out.request_id, None)

    def _fail_all_streams(self, e: BaseException) -> None:
        if self._loop is None:
            return
        for q in list(self._streams.values()):
            self._loop.call_soon_threadsafe(q.put_nowait, e)
        self._streams.clear()

    # ------------------------------------------------------------------

    async def generate(
        self,
        prompt: Union[str, dict],
        sampling_params: SamplingParams,
        request_id: Optional[str] = None,
        lora_request=None,
    ) -> AsyncGenerator[RequestOutput, None]:
        if self.errored:
            raise EngineDeadError() from self.dead_error
        request_id = request_id or random_uuid()
        self._loop = asyncio.get_running_loop()
        q: asyncio.Queue = asyncio.Queue()
        self._streams[request_id] = q
        try:
            self._pending.append(("add", request_id, prompt,
                                  sampling_params, lora_request))
            self._wakeup.set()
            while True:
                item = await q.get()
                if isinstance(item, BaseException):
                    raise EngineDeadError() from item
                yield item
                if item.finished:
                    return
        finally:
            if request_id in self._streams:
                self._streams.pop(request_id, None)
                self._pending.append(("abort", request_id))
                self._wakeup.set()

    async def abort(self, request_id: str) -> None:
        self._streams.pop(request_id, None)
        self._pending.append(("abort", request_id))
        self._wakeup.set()

    # -- admin -----------------------------------------------------------

    def get_tokenizer(self):
        return self.engine.tokenizer

    def add_lora_adapter(self, name: str, path: str) -> None:
        """Install a PEFT adapter for per-request routing by model
        name (role of reference ``--lora-modules NAME=PATH``,
        ``entrypoints/openai/cli_args.py:LoRAParserAction``)."""
        from vllm_pq_tpu.lora.models import LoRAModel
        lora = LoRAModel.from_local_checkpoint(path, name)
        self.install_lora(lora)

    def _admin_lock(self):
        """Lock acquisition with a fairness hint: the engine loop
        yields 1 ms whenever an admin caller is waiting (bare Lock
        release has no handoff fairness against a hot loop)."""
        import contextlib

        @contextlib.contextmanager
        def cm():
            self._admin_waiting += 1
            acquired = False
            try:
                with self._lock:
                    self._admin_waiting -= 1
                    acquired = True
                    yield
            finally:
                if not acquired:
                    self._admin_waiting -= 1
        return cm()

    def install_lora(self, lora_model) -> None:
        """Install an already-built LoRAModel on every replica."""
        engines = getattr(self.engine, "engines", [self.engine])
        with self._admin_lock():
            slot = None
            for eng in engines:
                slot = eng.engine_core.add_lora(lora_model)
        if not hasattr(self, "lora_names"):
            self.lora_names = {}
        self.lora_names[lora_model.name] = slot

    def lora_request_for(self, model_name: str):
        slot = getattr(self, "lora_names", {}).get(model_name)
        if slot is not None:
            from vllm_pq_tpu.lora.request import LoRARequest
            return LoRARequest(model_name, slot)
        return None

    async def get_stats(self) -> dict:
        with self._admin_lock():
            return self.engine.get_stats()

    async def reset_prefix_cache(self) -> bool:
        with self._admin_lock():
            return self.engine.reset_prefix_cache()

    def start_profile(self) -> None:
        self.engine.start_profile()

    def stop_profile(self) -> None:
        self.engine.stop_profile()

    def shutdown(self) -> None:
        self._shutdown = True
        self._wakeup.set()
