"""In-process executor: owns the Worker + ModelRunner (role of
reference ``executor/uniproc_executor.py``)."""

from typing import Any, Dict, Optional

from vllm_pq_tpu.config import EngineConfig
from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)


class ExecutorBase:
    """Interface the EngineCore drives (subset of reference
    ExecutorBase): model init, KV sizing, step execution (split into
    dispatch/fetch for async scheduling), utility RPCs."""

    def __init__(self, config: EngineConfig):
        self.config = config

    # -- lifecycle ------------------------------------------------------
    def init_model(self) -> int:
        """Load the model; return the KV block count."""
        raise NotImplementedError

    @property
    def runner(self):
        """The local ModelRunner (uniproc) or a proxy to rank 0."""
        raise NotImplementedError

    def shutdown(self) -> None:
        pass

    # -- execution ------------------------------------------------------
    def execute_model(self, scheduler_output,
                      request_meta: Optional[Dict] = None):
        return self.runner.execute_model(scheduler_output, request_meta)

    def dispatch_model(self, scheduler_output,
                       request_meta: Optional[Dict] = None) -> Any:
        return self.runner.dispatch_model(scheduler_output, request_meta)

    def fetch_model(self, handle) -> Any:
        return self.runner.fetch_model(handle)

    # -- health ---------------------------------------------------------
    def check_health(self) -> bool:
        return True


class UniprocExecutor(ExecutorBase):
    """Single-process executor: on TPU one jitted SPMD program spans
    the whole local mesh, so the worker fan-out the reference needs for
    multi-GPU is a single process here; multi-host ranks each run their
    own engine + executor in lockstep (parallel/host_agent.py)."""

    def __init__(self, config: EngineConfig):
        super().__init__(config)
        from vllm_pq_tpu.worker.worker import Worker
        self.worker = Worker(config)
        self._runner = None

    def init_model(self) -> int:
        self.worker.load_model()
        num_blocks = self.worker.determine_num_kv_blocks()
        self._runner = self.worker.init_runner(num_blocks)
        return num_blocks

    @property
    def runner(self):
        return self._runner

    def check_health(self) -> bool:
        return self._runner is not None
