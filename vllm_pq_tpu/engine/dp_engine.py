"""Data-parallel engine router (role of reference DP: per-replica
engines + env-plumbed ranks, ``examples/offline_inference/
data_parallel.py`` and the ``_DP`` group, ``parallel_state.py:937``).

N independent LLMEngine replicas pinned to disjoint device slices; new
requests go to the least-loaded replica. Unlike GPU vLLM there is no
MoE-lockstep constraint here because replicas own separate meshes (no
shared collectives) — EP-over-DP will reintroduce it later.
"""

from typing import Dict, List, Optional, Union

from vllm_pq_tpu.config import EngineConfig
from vllm_pq_tpu.engine.llm_engine import LLMEngine
from vllm_pq_tpu.logger import init_logger
from vllm_pq_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


class DPLLMEngine:
    """LLMEngine-compatible facade over data-parallel replicas."""

    def __init__(self, config: EngineConfig):
        import copy
        self.config = config
        dp = config.parallel.data_parallel_size
        tp = config.parallel.tensor_parallel_size
        self.engines: List[LLMEngine] = []
        for r in range(dp):
            sub = copy.deepcopy(config)
            sub.parallel.data_parallel_size = 1
            sub.parallel.device_offset = (config.parallel.device_offset
                                          + r * tp)
            self.engines.append(LLMEngine(sub))
        self._replica_of: Dict[str, int] = {}
        logger.info("DP router: %d replicas x tp=%d", dp, tp)

    # -- routing ---------------------------------------------------------

    def _pick_replica(self) -> int:
        loads = [e.engine_core.scheduler.get_num_unfinished_requests()
                 if hasattr(e.engine_core, "scheduler")
                 else int(e.has_unfinished_requests())
                 for e in self.engines]
        return int(min(range(len(loads)), key=loads.__getitem__))

    def add_request(self, request_id: Optional[str],
                    prompt, sampling_params: SamplingParams,
                    lora_request=None) -> str:
        r = self._pick_replica()
        rid = self.engines[r].add_request(request_id, prompt,
                                          sampling_params,
                                          lora_request=lora_request)
        self._replica_of[rid] = r
        return rid

    def abort_request(self, request_ids: Union[str, List[str]]) -> None:
        if isinstance(request_ids, str):
            request_ids = [request_ids]
        for rid in request_ids:
            r = self._replica_of.get(rid)
            if r is not None:
                self.engines[r].abort_request(rid)

    def has_unfinished_requests(self) -> bool:
        return any(e.has_unfinished_requests() for e in self.engines)

    def step(self):
        outputs = []
        for e in self.engines:
            if e.has_unfinished_requests():
                outputs.extend(e.step())
        for o in outputs:
            if o.finished:
                self._replica_of.pop(o.request_id, None)
        return outputs

    # -- facades (admin surface fans out to all replicas) ----------------

    @property
    def processor(self):
        return self.engines[0].processor

    @property
    def engine_core(self):
        return self.engines[0].engine_core

    def get_tokenizer(self):
        return self.engines[0].tokenizer

    @property
    def tokenizer(self):
        return self.engines[0].tokenizer

    def reset_prefix_cache(self) -> bool:
        return all(e.reset_prefix_cache() for e in self.engines)

    def get_stats(self) -> dict:
        stats = [e.engine_core.make_stats() for e in self.engines]
        agg = dict(stats[0])
        for s in stats[1:]:
            for k, v in s.items():
                if isinstance(v, (int, float)):
                    agg[k] = agg.get(k, 0) + v
        agg["num_replicas"] = len(self.engines)
        return agg

    def start_profile(self, path: Optional[str] = None) -> None:
        self.engines[0].start_profile(path)

    def stop_profile(self) -> None:
        self.engines[0].stop_profile()

    def shutdown(self) -> None:
        for e in self.engines:
            e.shutdown()
