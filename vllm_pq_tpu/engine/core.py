"""EngineCore: the schedule -> execute -> update inner loop (role of
reference ``v1/engine/core.py:146``). In-process here; the ZMQ process
wrapper lives in ``engine/core_proc.py``."""

from typing import Dict, List, Optional

from vllm_pq_tpu.config import EngineConfig
from vllm_pq_tpu.core.scheduler import EngineCoreOutput, Scheduler
from vllm_pq_tpu.logger import init_logger
from vllm_pq_tpu.request import Request, RequestStatus
from vllm_pq_tpu.worker.worker import Worker

logger = init_logger(__name__)


class EngineCore:

    def __init__(self, config: EngineConfig):
        self.config = config
        self.worker = Worker(config)
        self.worker.load_model()
        num_blocks = self.worker.determine_num_kv_blocks()
        self.runner = self.worker.init_runner(num_blocks)
        self.scheduler = Scheduler(config.scheduler, config.cache,
                                   num_blocks,
                                   vocab_size=self.runner.model
                                   .cfg.vocab_size)
        # eos metadata for requests not yet sent to the runner
        self._pending_meta: Dict[str, tuple] = {}
        # multi-host: rank-0 broadcasts each step to follower hosts
        self._broadcaster = None
        import os
        ep = os.environ.get("VPQ_STEP_BROADCAST_ENDPOINT")
        try:
            import jax
            multihost = jax.process_count() > 1
        except Exception:  # noqa: BLE001
            multihost = False
        if ep or multihost:
            from vllm_pq_tpu.parallel.host_agent import StepBroadcaster
            self._broadcaster = StepBroadcaster(ep or "tcp://*:5557")
        # speculative decoding: host-side draft proposer
        self.proposer = None
        if config.speculative.enabled:
            from vllm_pq_tpu.spec_decode import NgramProposer
            sc = config.speculative
            self.proposer = NgramProposer(sc.prompt_lookup_min,
                                          sc.prompt_lookup_max,
                                          sc.num_spec_tokens)

    # ------------------------------------------------------------------

    def add_request(self, request: Request) -> None:
        if request.lora_request is not None:
            request.lora_slot = self._ensure_lora(request.lora_request)
        self.scheduler.add_request(request)
        self._pending_meta[request.request_id] = (
            request.eos_token_id, request.sampling_params.ignore_eos)

    def abort_requests(self, request_ids: List[str]) -> None:
        self.scheduler.finish_requests(request_ids,
                                       RequestStatus.FINISHED_ABORTED)
        for rid in request_ids:
            self._pending_meta.pop(rid, None)

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished_requests()

    def step(self) -> List[EngineCoreOutput]:
        scheduler_output = self.scheduler.schedule()
        if self._broadcaster is not None:
            # multi-host lockstep: follower hosts execute the identical
            # payload (parallel/host_agent.py)
            self._broadcaster.publish(scheduler_output,
                                      self._pending_meta)
        runner_output = self.runner.execute_model(scheduler_output,
                                                  self._pending_meta)
        for nr in scheduler_output.scheduled_new_reqs:
            self._pending_meta.pop(nr.req_id, None)
        outputs = self.scheduler.update_from_output(scheduler_output,
                                                    runner_output)
        # requests the scheduler aborted itself (exceed KV capacity)
        if self.scheduler.ignored_req_ids:
            for rid in sorted(self.scheduler.ignored_req_ids):
                outputs.append(EngineCoreOutput(
                    req_id=rid, new_token_ids=[],
                    finish_reason="length", stop_reason="kv_capacity"))
            self.scheduler.ignored_req_ids.clear()
        if self.proposer is not None:
            self._propose_drafts()
        return outputs

    def _propose_drafts(self) -> None:
        """Attach ngram drafts to decode-phase requests for the next step.

        Drafting is restricted to exact-verifiable rows: greedy, no
        logprobs, no penalties, past min_tokens (the verification sampler
        applies none of those transforms to positions > 0)."""
        for req in self.scheduler.running:
            req.spec_token_ids = []
            if req.num_computed_tokens != req.num_tokens - 1:
                continue  # still prefilling
            sp = req.sampling_params
            if (sp.temperature > 0 or sp.logprobs is not None
                    or sp.presence_penalty != 0
                    or sp.frequency_penalty != 0
                    or sp.repetition_penalty != 1.0
                    or req.needs_constraints
                    or req.num_output_tokens < sp.min_tokens):
                continue
            drafts = self.proposer.propose(req.all_token_ids)
            if drafts:
                req.spec_token_ids = drafts

    # -- utility RPCs (role of reference EngineCore utility methods) ----

    def reset_prefix_cache(self) -> bool:
        return self.scheduler.reset_prefix_cache()

    def make_stats(self) -> dict:
        return self.scheduler.make_stats()

    def profile_start(self, path: str) -> None:
        import jax
        jax.profiler.start_trace(path)

    def profile_stop(self) -> None:
        import jax
        jax.profiler.stop_trace()

    def _ensure_lora(self, lora_request) -> int:
        """Resolve a LoRARequest to a device slot, loading the adapter
        from disk on first use (role of reference LRUCacheWorkerLoRA
        manager; no eviction — max_loras is the live cap)."""
        slot = self.runner.lora_slot_of(lora_request.lora_name)
        if slot is not None:
            return slot
        from vllm_pq_tpu.lora.models import LoRAModel
        lora = LoRAModel.from_local_checkpoint(lora_request.lora_path,
                                               lora_request.lora_name)
        return self.runner.add_lora(lora)

    def add_lora(self, lora_model) -> int:
        """Install an in-memory adapter (tests / RLHF weight pushes)."""
        return self.runner.add_lora(lora_model)

    def remove_lora(self, name: str) -> bool:
        return self.runner.remove_lora(name)

    def sleep(self, level: int = 1) -> None:
        """Free device memory (level 1: KV cache; level 2: + weights) —
        role of reference sleep mode (cumem.py:172-224), used for RLHF
        weight refresh and idle pools. Requests must be drained first."""
        assert not self.scheduler.has_unfinished_requests(), \
            "drain requests before sleeping"
        self.runner.sleep(level)

    def wake_up(self) -> None:
        self.runner.wake_up()
        self.scheduler.reset_prefix_cache()

    def shutdown(self) -> None:  # symmetry with MPEngineCoreClient
        pass
