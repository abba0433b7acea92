"""Synchronous LLMEngine (role of reference ``v1/engine/llm_engine.py``):
Processor -> EngineCore -> OutputProcessor, one process."""

import time
from typing import Dict, List, Optional, Union

from vllm_pq_tpu.config import EngineConfig
from vllm_pq_tpu.engine.core import EngineCore
from vllm_pq_tpu.engine.output_processor import OutputProcessor
from vllm_pq_tpu.engine.processor import Processor
from vllm_pq_tpu.engine.tokenizer import get_tokenizer
from vllm_pq_tpu.logger import init_logger
from vllm_pq_tpu.metrics.stats import StatsLogger
from vllm_pq_tpu.outputs import RequestOutput
from vllm_pq_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


class LLMEngine:

    def __init__(self, config: EngineConfig):
        self.config = config
        self.tokenizer = get_tokenizer(
            config.model.tokenizer,
            trust_remote_code=config.model.trust_remote_code,
            revision=config.model.revision)
        self.processor = Processor(config, self.tokenizer)
        self.output_processor = OutputProcessor(self.tokenizer)
        if config.parallel.engine_multiprocessing:
            from vllm_pq_tpu.engine.core_proc import MPEngineCoreClient
            self.engine_core = MPEngineCoreClient(config)
        else:
            self.engine_core = EngineCore(config)
        self.stats = StatsLogger(config)
        self._cached_stats: Dict = {}
        self._last_stats_t = 0.0

    @classmethod
    def from_engine_args(cls, **kwargs) -> "LLMEngine":
        from vllm_pq_tpu.engine.arg_utils import EngineArgs
        return cls(EngineArgs(**kwargs).create_engine_config())

    # ------------------------------------------------------------------

    def add_request(self, request_id: Optional[str],
                    prompt: Union[str, dict],
                    sampling_params: SamplingParams,
                    lora_request=None) -> str:
        request = self.processor.process_inputs(prompt, sampling_params,
                                                request_id,
                                                lora_request=lora_request)
        self.output_processor.add_request(request)
        self.engine_core.add_request(request)
        self.stats.on_request_arrival(request)
        return request.request_id

    def abort_request(self, request_ids: Union[str, List[str]]) -> None:
        if isinstance(request_ids, str):
            request_ids = [request_ids]
        self.engine_core.abort_requests(request_ids)
        for rid in request_ids:
            self.output_processor.abort_request(rid)

    def has_unfinished_requests(self) -> bool:
        return self.engine_core.has_unfinished_requests()

    def step(self) -> List[RequestOutput]:
        t0 = time.monotonic()
        core_outputs = self.engine_core.step()
        outputs, to_abort = self.output_processor.process_outputs(
            core_outputs)
        if to_abort:
            self.engine_core.abort_requests(to_abort)
            # mark those outputs finished for the client
        now = time.monotonic()
        if now - self._last_stats_t >= 1.0:  # throttle (RPC in MP mode)
            self._cached_stats = self.engine_core.make_stats()
            self._last_stats_t = now
        self.stats.on_step(core_outputs, now - t0, self._cached_stats)
        return outputs

    # -- admin (parity with reference LLM/api admin surface) ------------

    def reset_prefix_cache(self) -> bool:
        return self.engine_core.reset_prefix_cache()

    def shutdown(self) -> None:
        self.engine_core.shutdown()

    def get_stats(self) -> dict:
        return self.engine_core.make_stats()

    def start_profile(self, path: Optional[str] = None) -> None:
        import vllm_pq_tpu.envs as envs
        self.engine_core.profile_start(path or envs.VPQ_PROFILE_DIR
                                       or "/tmp/vpq_profile")

    def stop_profile(self) -> None:
        self.engine_core.profile_stop()
