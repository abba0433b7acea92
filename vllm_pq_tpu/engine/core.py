"""EngineCore: the schedule -> execute -> update inner loop (role of
reference ``v1/engine/core.py:146``). In-process here; the ZMQ process
wrapper lives in ``engine/core_proc.py``."""

from typing import Dict, List, Optional

import numpy as np

from vllm_pq_tpu.config import EngineConfig
from vllm_pq_tpu.core.scheduler import EngineCoreOutput, Scheduler
from vllm_pq_tpu.logger import init_logger
from vllm_pq_tpu.request import Request, RequestStatus
from vllm_pq_tpu.executor import create_executor

logger = init_logger(__name__)


class EngineCore:

    def __init__(self, config: EngineConfig):
        self.config = config
        # executor seam (executor/): uniproc by default, pluggable via
        # --distributed-executor-backend external:module:Class
        self.executor = create_executor(config)
        num_blocks = self.executor.init_model()
        self.worker = getattr(self.executor, "worker", None)
        self.runner = self.executor.runner
        self._medusa = False
        if (config.speculative.enabled
                and config.speculative.method == "medusa"):
            # heads must install before step fns compile (warmup)
            if config.speculative.num_spec_tokens <= 0:
                raise ValueError("medusa requires num_speculative_tokens")
            from vllm_pq_tpu.spec_decode.medusa import load_medusa_heads
            import jax.numpy as jnp
            dt = (jnp.bfloat16 if config.model.dtype == "bfloat16"
                  else jnp.float32)
            heads, n_heads = load_medusa_heads(
                config.speculative.model, dt)
            if config.speculative.num_spec_tokens > n_heads:
                raise ValueError(
                    f"num_speculative_tokens "
                    f"{config.speculative.num_spec_tokens} exceeds the "
                    f"checkpoint's {n_heads} medusa heads")
            self.runner.enable_medusa(
                heads[:config.speculative.num_spec_tokens])
            self._medusa = True
        elif (config.speculative.enabled
              and config.speculative.method == "mlp_speculator"):
            # recurrent (hidden, token)-conditioned draft stack riding
            # the medusa in-graph plumbing (reference
            # models/mlp_speculator.py)
            from vllm_pq_tpu.spec_decode.mlp_speculator import \
                load_mlp_speculator
            import jax.numpy as jnp
            dt = (jnp.bfloat16 if config.model.dtype == "bfloat16"
                  else jnp.float32)
            spec, n_heads = load_mlp_speculator(config.speculative.model,
                                                dt)
            if config.speculative.num_spec_tokens > n_heads:
                raise ValueError(
                    f"num_speculative_tokens "
                    f"{config.speculative.num_spec_tokens} exceeds the "
                    f"checkpoint's {n_heads} speculator stages")
            spec = dict(spec,
                        heads=spec["heads"]
                        [:config.speculative.num_spec_tokens])
            self.runner.enable_mlp_speculator(spec)
            self._medusa = True
        if config.compilation.warmup:
            self.runner.warmup()
        # Uniform sliding-window models (every layer windowed): the KV
        # manager reclaims blocks behind the window. Interleaved
        # patterns (Gemma2-style sliding_window_pattern) share one block
        # table across full-attention layers, so they stay mask-only.
        mcfg = self.runner.model.cfg
        sw = getattr(mcfg, "sliding_window", None)
        if (sw is not None and getattr(mcfg, "sliding_window_pattern",
                                       None)):
            sw = None
        import vllm_pq_tpu.envs as envs
        if not envs.VPQ_SLIDING_RECLAIM:
            sw = None
        self.scheduler = Scheduler(config.scheduler, config.cache,
                                   num_blocks,
                                   vocab_size=self.runner.model
                                   .cfg.vocab_size,
                                   sliding_window=sw)
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
        # disaggregated prefill: KV connector (distributed/kv_transfer/)
        self.kv_connector = None
        if config.kv_transfer.kv_role:
            from vllm_pq_tpu.distributed.kv_transfer.connector import \
                make_connector
            self.kv_connector = make_connector(config)
            if config.kv_transfer.kv_role == "kv_producer":
                self.scheduler.on_request_freed = self._send_request_kv
            logger.info("kv_transfer: %s on %s",
                        config.kv_transfer.kv_role,
                        config.kv_transfer.kv_endpoint)
        self._kvt_checked: set = set()

        # speculative decoding: host-side draft proposer
        self.proposer = None
        self.draft_proposer = None
        if config.speculative.enabled:
            sc = config.speculative
            if sc.method == "draft_model":
                from vllm_pq_tpu.spec_decode.draft_proposer import \
                    DraftModelProposer
                self.draft_proposer = DraftModelProposer(
                    config, self.worker.mesh, num_blocks)
            elif sc.method in ("eagle", "deepseek_mtp"):
                from vllm_pq_tpu.spec_decode.eagle import EagleProposer
                self.draft_proposer = EagleProposer(
                    config, self.worker.mesh, num_blocks, self.runner,
                    style="eagle" if sc.method == "eagle" else "mtp")
            elif sc.method == "medusa":
                pass  # in-graph heads installed above; drafts ride
                # runner output (_attach_medusa_drafts)
            else:
                from vllm_pq_tpu.spec_decode import NgramProposer
                self.proposer = NgramProposer(sc.prompt_lookup_min,
                                              sc.prompt_lookup_max,
                                              sc.num_spec_tokens)
        # spec x async: in-graph proposers (medusa / mlp_speculator)
        # compose with lag-1 async scheduling — drafts stay on device
        # as SENTINELS the runner resolves (core/scheduler.py
        # device_spec_k); host proposers (ngram, draft model, eagle)
        # still drain to sync steps
        if (config.scheduler.async_scheduling
                and config.speculative.enabled
                and config.speculative.method in ("medusa",
                                                  "mlp_speculator")):
            self.scheduler.device_spec_k = \
                config.speculative.num_spec_tokens
        # spec x multi-step windows: in-graph proposers draft and
        # verify INSIDE the decode window (runner spec_loop); the
        # scheduler over-allocates n*(k+1) KV slots and advances by
        # the actual emitted count
        if (config.scheduler.num_scheduler_steps > 1
                and config.speculative.enabled
                and config.speculative.method in ("medusa",
                                                  "mlp_speculator")):
            self.scheduler.window_spec_k = \
                config.speculative.num_spec_tokens
        if config.compilation.warmup:
            self._warmup_live_path()

    # ------------------------------------------------------------------

    def _warmup_live_path(self) -> None:
        """One real generation through the live dispatch path. The
        runner warmup compiles every step variant, but the FIRST live
        step still paid a one-time 20-110 s stall on the tunneled
        runtime (helper programs / transfer setup the variant warmup
        never exercises); absorb it at boot instead of on the first
        request."""
        import time as _time
        from vllm_pq_tpu.sampling_params import SamplingParams
        t0 = _time.perf_counter()
        smax = self.config.scheduler.max_num_seqs
        # walk the decode token buckets (1, 12, 48, ... concurrent
        # rows): residual one-time stalls fire on the FIRST live
        # execution of each bucket's variant; absorb them all at boot
        waves = [n for n in (1, 12, 48, 192) if n <= smax] or [1]
        total = 0
        for wave, n_req in enumerate(waves):
            sp = SamplingParams(temperature=0.0, max_tokens=2,
                                ignore_eos=True)
            for i in range(n_req):
                req = Request(f"warmup-live-{wave}-{i}", [1, 2, 3], sp)
                req.eos_token_id = -1
                self.add_request(req)
            guard = 0
            while self.scheduler.has_unfinished_requests() and guard < 64:
                self.step()
                guard += 1
                total += 1
        logger.info("live-path warmup: %d steps in %.1fs", total,
                    _time.perf_counter() - t0)

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
        return (self.scheduler.has_unfinished_requests()
                or getattr(self, "_inflight", None) is not None)

    def step(self) -> List[EngineCoreOutput]:
        if self.config.scheduler.async_scheduling:
            return self._step_async()
        return self._step_sync()

    def _recv_external_kv(self) -> None:
        """Consumer pre-pass: inject transferred prefill KV for newly
        waiting requests into the prefix cache, so schedule() admits
        them as (remote) prefix hits."""
        conn = self.kv_connector
        for request in list(self.scheduler.waiting):
            rid = request.request_id
            if rid in self._kvt_checked:
                continue
            self._kvt_checked.add(rid)
            bs = self.config.cache.block_size
            # keys cover the FULL-BLOCK prefix (what the producer ships)
            full = (len(request.prompt_token_ids) // bs) * bs
            if full <= 0:
                continue
            got = conn.lookup(request.prompt_token_ids[:full])
            if got is None:
                continue
            kv, num_tokens = got

            def write(block_ids, block_offsets):
                self.runner.scatter_kv(block_ids,
                                       kv[:, block_offsets])
            n = self.scheduler.kv_cache_manager.import_prefix(
                request.prompt_token_ids[:num_tokens], write)
            logger.info("kv_transfer: injected %d prefill tokens "
                        "(%d blocks) for %s", n, n // bs, rid)

    def _send_request_kv(self, request: Request) -> None:
        """Producer: ship a finished request's full-block KV pages
        (called by the scheduler just before the blocks are freed)."""
        blocks = self.scheduler.kv_cache_manager.req_to_blocks.get(
            request.request_id)
        if not blocks:
            return
        bs = self.config.cache.block_size
        n_full = min(request.num_computed_tokens,
                     request.num_prompt_tokens) // bs
        if n_full <= 0:
            return
        kv = self.runner.gather_kv([b.block_id for b in blocks[:n_full]])
        self.kv_connector.send_kv(
            request.prompt_token_ids[:n_full * bs], n_full * bs, kv)

    def _step_sync(self) -> List[EngineCoreOutput]:
        if (self.kv_connector is not None
                and self.kv_connector.role == "kv_consumer"):
            self._recv_external_kv()
        scheduler_output = self.scheduler.schedule()
        if self._broadcaster is not None:
            # multi-host lockstep: follower hosts execute the identical
            # payload (parallel/host_agent.py)
            self._broadcaster.publish(scheduler_output,
                                      self._pending_meta)
        runner_output = self.executor.execute_model(scheduler_output,
                                                  self._pending_meta)
        step_meta = (dict(self._pending_meta)
                     if self.draft_proposer is not None else None)
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
        if (self._medusa and not self.scheduler.device_spec_k
                and not self.scheduler.window_spec_k):
            # window mode proposes in-graph; host-attached drafts would
            # block _schedule_multistep's steady-decode gate
            self._attach_medusa_drafts(runner_output)
        if self.draft_proposer is not None:
            self.draft_proposer.on_step(scheduler_output, step_meta,
                                        self.scheduler)
        return outputs

    # ------------------------------------------------------------------
    # async scheduling (lag-1 pipeline): dispatch step i+1 before
    # fetching step i. Placeholder tokens (-1) keep the scheduler's
    # token accounting ahead; the runner resolves them ON DEVICE from
    # the previous step's samples, so the host never blocks on tokens
    # it only needs for stop checks (which lag one step).

    PLACEHOLDER = -1

    def _async_state(self):
        if not hasattr(self, "_inflight"):
            self._inflight = None
            self.scheduler.kv_cache_manager.deferred_free = True
        return self._inflight

    def _step_async(self) -> List[EngineCoreOutput]:
        self._async_state()
        if (self.kv_connector is not None
                and self.kv_connector.role == "kv_consumer"):
            self._recv_external_kv()
        # constrained / spec work needs same-step tokens: drain and
        # fall back to a sync step for this iteration
        needs_sync = any(
            r.needs_constraints
            # host-proposed drafts need same-step tokens; device
            # sentinels (-1, spec x async) ride the pipeline
            or (r.spec_token_ids and r.spec_token_ids[0] != -1)
            or r.sampling_params.logits_processors
            or r.sampling_params.presence_penalty != 0
            or r.sampling_params.frequency_penalty != 0
            or r.sampling_params.repetition_penalty != 1.0
            for r in list(self.scheduler.running) + list(
                self.scheduler.waiting))
        if needs_sync:
            outputs = []
            if self._inflight is not None:
                outputs += self._finalize_async(*self._inflight)
                self._inflight = None
                self.scheduler.kv_cache_manager.flush_deferred()
                self.scheduler.kv_cache_manager.flush_deferred()
            return outputs + self._step_sync()

        scheduler_output = self.scheduler.schedule()
        sampling_rids = self._advance_optimistic(scheduler_output)
        handle = self.executor.dispatch_model(scheduler_output,
                                            self._pending_meta)
        for nr in scheduler_output.scheduled_new_reqs:
            self._pending_meta.pop(nr.req_id, None)

        outputs: List[EngineCoreOutput] = []
        if self._inflight is not None:
            outputs = self._finalize_async(*self._inflight)
        self.scheduler.kv_cache_manager.flush_deferred()
        self._inflight = ((scheduler_output, handle, sampling_rids)
                          if handle is not None else None)
        if self._inflight is None and self.scheduler.ignored_req_ids:
            for rid in sorted(self.scheduler.ignored_req_ids):
                outputs.append(EngineCoreOutput(
                    req_id=rid, new_token_ids=[],
                    finish_reason="length", stop_reason="kv_capacity"))
            self.scheduler.ignored_req_ids.clear()
        return outputs

    def _advance_optimistic(self, so) -> List[str]:
        """Advance num_computed_tokens at schedule time and append a
        placeholder for every token sampled this step (N per row for a
        multi-step window); rows that hit their caps stop being
        scheduled (moved out of running) until their finalize concludes
        them."""
        sched = self.scheduler
        multistep = so.num_scheduler_steps > 1
        sampling = []
        for rid, nt in so.num_scheduled_tokens.items():
            req = sched.requests.get(rid)
            if req is None:
                continue
            n_spec = len(so.scheduled_spec_decode_tokens.get(rid, ()))
            if multistep:
                n_sample = nt  # one sampled token per fused iteration
            elif n_spec:
                # spec x async: assume FULL acceptance (n_spec drafts +
                # bonus); finalize rolls back by what the verifier
                # actually rejected
                n_sample = n_spec + 1
            else:
                n_sample = (1 if req.num_computed_tokens + nt
                            >= req.num_tokens else 0)
            req.num_computed_tokens += nt
            if not n_sample:
                continue
            for _ in range(n_sample):
                req.append_output_token_ids(self.PLACEHOLDER)
            sampling.append(rid)
            if (req.num_output_tokens >= req.max_tokens
                    or req.num_tokens >= sched.max_model_len):
                # in-flight token is the last allowed: park the request
                # so it is not scheduled again before its finalize
                try:
                    sched.running.remove(req)
                except ValueError:
                    pass
        return sampling

    def _finalize_async(self, so, handle,
                        sampling_rids) -> List[EngineCoreOutput]:
        from vllm_pq_tpu.request import RequestStatus
        sched = self.scheduler
        runner_output = self.executor.fetch_model(handle)
        outputs: List[EngineCoreOutput] = []
        sampling = set(sampling_rids)
        for rid in so.num_scheduled_tokens:
            req = sched.requests.get(rid)
            if req is None or rid not in sampling:
                continue
            sampled = runner_output.sampled_token_ids.get(rid)
            if not sampled:
                continue
            toks = req._all_token_ids
            sp = req.sampling_params
            new_toks: List[int] = []
            for tok in sampled:  # one entry, or N for a fused window
                try:
                    idx = toks.index(self.PLACEHOLDER,
                                     req.num_prompt_tokens)
                except ValueError:
                    break
                toks[idx] = tok
                new_toks.append(tok)
                real_out = idx - req.num_prompt_tokens + 1
                if req.guided_fsm is not None:
                    req.guided_fsm.advance(tok)

                finish = None
                if (req.num_prompt_tokens + real_out
                        >= sched.max_model_len
                        or real_out >= req.max_tokens):
                    finish = RequestStatus.FINISHED_LENGTH_CAPPED
                elif real_out >= sp.min_tokens:
                    if (not sp.ignore_eos and req.eos_token_id is not None
                            and tok == req.eos_token_id):
                        finish = RequestStatus.FINISHED_STOPPED
                    elif tok in sp.stop_token_ids:
                        finish = RequestStatus.FINISHED_STOPPED
                        req.stop_reason = tok

                if finish is not None:
                    # discard any newer in-flight placeholders and the
                    # window's remaining (already computed) tokens
                    del toks[idx + 1:]
                    req.num_computed_tokens = min(
                        req.num_computed_tokens, len(toks) - 1)
                    req.status = finish
                    try:
                        sched.running.remove(req)
                    except ValueError:
                        pass
                    sched._free_request(req)
                    break
            n_spec = len(so.scheduled_spec_decode_tokens.get(rid, ()))
            if n_spec:
                # spec x async reconcile: the schedule assumed full
                # acceptance (n_spec + 1 samples); drop the unfilled
                # placeholders, roll the KV accounting back by the
                # rejected count, and un-park rows the optimistic cap
                # check removed from running
                sched.spec_stats_proposed += n_spec
                sched.spec_stats_accepted += max(len(new_toks) - 1, 0)
                if req.status == RequestStatus.RUNNING:
                    leftover = (n_spec + 1) - len(new_toks)
                    removed = 0
                    for _ in range(max(leftover, 0)):
                        try:
                            idx = toks.index(self.PLACEHOLDER,
                                             req.num_prompt_tokens)
                        except ValueError:
                            break
                        del toks[idx]
                        removed += 1
                    if leftover > 0:
                        req.num_computed_tokens -= leftover
                        if req not in sched.running:
                            sched.running.append(req)
            if not new_toks:
                continue
            outputs.append(EngineCoreOutput(
                req_id=rid, new_token_ids=new_toks,
                finish_reason=req.get_finish_reason(),
                stop_reason=req.stop_reason,
                logprobs=runner_output.logprobs.get(rid),
            ))
        return outputs

    def _propose_drafts(self) -> None:
        """Attach ngram drafts to decode-phase requests for the next step.

        Drafting covers greedy rows (exact argmax verification) AND
        sampled rows (stochastic rejection, layers/rejection.py);
        excluded: logprob rows, penalty rows, constrained rows, rows
        before min_tokens (the verifier applies none of those
        transforms to positions > 0)."""
        for req in self.scheduler.running:
            req.spec_token_ids = []
            if req.num_computed_tokens != req.num_tokens - 1:
                continue  # still prefilling
            sp = req.sampling_params
            if (sp.logprobs is not None
                    or sp.logits_processors
                    or sp.presence_penalty != 0
                    or sp.frequency_penalty != 0
                    or sp.repetition_penalty != 1.0
                    or req.needs_constraints
                    or req.num_output_tokens < sp.min_tokens):
                continue
            drafts = self.proposer.propose(req.all_token_ids)
            if drafts:
                req.spec_token_ids = drafts

    def _attach_medusa_drafts(self, runner_output) -> None:
        """Attach the step's in-graph medusa head proposals as next-step
        drafts (same eligibility gating as _propose_drafts)."""
        drafts = runner_output.draft_token_ids
        for req in self.scheduler.running:
            req.spec_token_ids = []
            if req.num_computed_tokens != req.num_tokens - 1:
                continue  # still prefilling
            sp = req.sampling_params
            if (sp.logprobs is not None
                    or sp.logits_processors
                    or sp.presence_penalty != 0
                    or sp.frequency_penalty != 0
                    or sp.repetition_penalty != 1.0
                    or req.needs_constraints
                    or req.num_output_tokens < sp.min_tokens):
                continue
            ds = drafts.get(req.request_id)
            if ds:
                req.spec_token_ids = list(ds)

    # -- utility RPCs (role of reference EngineCore utility methods) ----

    def encode(self, ids_list, pool: Optional[str] = None):
        """Pooled embeddings (works over the MP-engine RPC too — kills
        the round-1 /v1/embeddings 501). Default pooling: "cls" for
        encoder-only models, "last" for decoders."""
        if pool is None:
            pool = ("cls" if getattr(self.runner, "is_encoder_runner",
                                     False) else "last")
        return [np.asarray(a) for a in
                self.runner.encode(ids_list, pool=pool)]

    def classify(self, ids_list, type_ids_list=None):
        """Sequence-classification logits (cross-encoder score/rerank)."""
        return [np.asarray(a) for a in
                self.runner.classify(ids_list, type_ids_list)]

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
