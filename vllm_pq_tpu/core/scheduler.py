"""Token-budget continuous-batching scheduler.

Behavioral parity with the reference V1 scheduler
(``vllm/v1/core/scheduler.py:100-230,475-608``), own implementation:

- single queue, no prefill/decode phase distinction; chunked prefill is
  implicit (a request may receive any token allotment each step);
- preemption is recompute-based: the most recently scheduled running
  request is freed and moved back to the head of the waiting queue;
- prefix-cache hits reduce the tokens actually computed;
- ``update_from_output`` advances ``num_computed_tokens``, appends sampled
  tokens once the whole prompt is computed, and applies stop checks
  (length cap / EOS / stop token ids).
"""

import time
from collections import deque
from typing import Deque, Dict, List, Optional, Set

from vllm_pq_tpu.config import CacheConfig, SchedulerConfig
from vllm_pq_tpu.core.kv_cache_manager import KVCacheManager
from vllm_pq_tpu.core.scheduler_output import (CachedRequestData,
                                               ModelRunnerOutput,
                                               NewRequestData,
                                               SchedulerOutput)
from vllm_pq_tpu.logger import init_logger
from vllm_pq_tpu.request import Request, RequestStatus

logger = init_logger(__name__)


class EngineCoreOutput:
    """Per-request, per-step output emitted by the scheduler."""

    __slots__ = ("req_id", "new_token_ids", "finish_reason", "stop_reason",
                 "logprobs", "prompt_logprobs")

    def __init__(self, req_id: str, new_token_ids: List[int],
                 finish_reason: Optional[str] = None,
                 stop_reason: Optional[object] = None,
                 logprobs: Optional[object] = None,
                 prompt_logprobs: Optional[list] = None):
        self.req_id = req_id
        self.new_token_ids = new_token_ids
        self.finish_reason = finish_reason
        self.stop_reason = stop_reason
        self.logprobs = logprobs
        self.prompt_logprobs = prompt_logprobs


class Scheduler:

    def __init__(self, scheduler_config: SchedulerConfig,
                 cache_config: CacheConfig, num_kv_blocks: int,
                 vocab_size: Optional[int] = None,
                 sliding_window: Optional[int] = None):
        self.config = scheduler_config
        # model vocab (for constraint-mask sizing); None => masks keep
        # their tokenizer-sized length
        self.vocab_size = vocab_size
        self.max_num_seqs = scheduler_config.max_num_seqs
        self.max_num_batched_tokens = scheduler_config.max_num_batched_tokens
        self.max_model_len = scheduler_config.max_model_len

        self.kv_cache_manager = KVCacheManager(
            num_blocks=num_kv_blocks,
            block_size=cache_config.block_size,
            max_model_len=scheduler_config.max_model_len,
            enable_caching=cache_config.enable_prefix_caching,
            num_preallocate_blocks=scheduler_config.num_preallocate_blocks,
            sliding_window=sliding_window,
        )

        from vllm_pq_tpu.core.encoder_cache_manager import \
            EncoderCacheManager
        self.encoder_cache_manager = EncoderCacheManager(
            scheduler_config.encoder_cache_size)

        self.waiting: Deque[Request] = deque()
        self.running: List[Request] = []
        self.requests: Dict[str, Request] = {}
        # finished request ids to relay to the worker for batch cleanup
        self.finished_req_ids: Set[str] = set()
        # requests aborted by the scheduler itself (e.g. exceeding KV
        # capacity); drained by the engine to emit client outputs
        self.ignored_req_ids: Set[str] = set()

        # spec x async (in-graph proposers): when > 0, pure-decode
        # steps ride k SENTINEL (-1) draft tokens per eligible row; the
        # runner resolves them on device from the previous dispatch's
        # proposals (engine/core.py sets this for async scheduling with
        # medusa / mlp_speculator)
        self.device_spec_k = 0
        # spec x multi-step windows (in-graph proposers): drafts are
        # proposed AND verified inside the window program; the host
        # grants n*(k+1) slots and advances by the actual emitted count
        self.window_spec_k = 0

        # stats
        self.num_preemptions = 0
        self.spec_stats_proposed = 0
        self.spec_stats_accepted = 0
        # priority scheduling engages lazily (reference V0 priority
        # mode, core/scheduler.py:952): lower value = more important
        self._has_priority = False

    def _device_spec_ok(self, r) -> bool:
        """Row eligibility for device-resolved drafts — mirrors the
        host proposers' exclusions (engine/core.py _propose_drafts):
        the verifier applies no penalties/constraints/logprobs and
        cannot honor min_tokens mid-emission."""
        sp = r.sampling_params
        return (sp.logprobs is None and not sp.logits_processors
                and sp.presence_penalty == 0
                and sp.frequency_penalty == 0
                and sp.repetition_penalty == 1.0
                and not r.needs_constraints
                and r.num_output_tokens >= sp.min_tokens)

    # ------------------------------------------------------------------
    # request lifecycle

    def add_request(self, request: Request) -> None:
        self.waiting.append(request)
        self.requests[request.request_id] = request
        if request.priority:
            self._has_priority = True

    def finish_requests(self, request_ids, status: RequestStatus) -> None:
        """Externally finish requests (abort, or client-side stop-string
        hit)."""
        if isinstance(request_ids, str):
            request_ids = (request_ids,)
        for req_id in request_ids:
            request = self.requests.get(req_id)
            if request is None or request.is_finished:
                continue
            if request.status == RequestStatus.RUNNING:
                self.running.remove(request)
            else:
                try:
                    self.waiting.remove(request)
                except ValueError:
                    pass
            request.status = status
            self._free_request(request)

    def has_unfinished_requests(self) -> bool:
        return bool(self.waiting or self.running)

    def get_num_unfinished_requests(self) -> int:
        return len(self.waiting) + len(self.running)

    # ------------------------------------------------------------------
    # scheduling

    def schedule(self) -> SchedulerOutput:
        ms = self._schedule_multistep()
        if ms is not None:
            return ms
        output = SchedulerOutput()
        token_budget = self.max_num_batched_tokens

        if self._has_priority and len(self.waiting) > 1:
            self.waiting = deque(sorted(
                self.waiting,
                key=lambda r: (r.priority, r.arrival_time)))
        if self._has_priority and self.waiting:
            self._priority_preempt()

        # spec x async: on pure-decode steps, attach k SENTINEL drafts
        # per eligible row — the runner resolves their values on device
        # from the previous dispatch's in-graph proposals (medusa /
        # mlp_speculator), so speculation rides the async pipeline
        # without the host ever waiting for draft tokens
        if self.device_spec_k:
            # sentinels never outlive one schedule: a mixed (prefill)
            # step must not carry them into the ragged packing
            for r in self.running:
                if r.spec_token_ids and r.spec_token_ids[0] == -1:
                    r.spec_token_ids = []
            if (not self.waiting and self.running
                    and all(r.num_tokens - r.num_computed_tokens == 1
                            for r in self.running)):
                sent = [-1] * self.device_spec_k
                for r in self.running:
                    if not r.spec_token_ids and self._device_spec_ok(r):
                        r.spec_token_ids = list(sent)

        # -- running requests first (decodes + in-flight chunked prefills)
        req_index = 0
        while req_index < len(self.running) and token_budget > 0:
            request = self.running[req_index]
            # spec tokens ride along with the decode token (reference
            # v1/core/scheduler.py:194-203)
            num_real = request.num_tokens - request.num_computed_tokens
            num_new_tokens = num_real + len(request.spec_token_ids)
            num_new_tokens = min(num_new_tokens, token_budget,
                                 self.max_model_len -
                                 request.num_computed_tokens)
            assert num_new_tokens > 0, (
                "running request with nothing to compute")
            if request.mm_inputs:
                num_new_tokens = self._schedule_encoder_inputs(
                    request, num_new_tokens, output)
                if num_new_tokens <= 0:
                    # blocked on encoder budget this step
                    req_index += 1
                    continue
            num_spec = max(0, num_new_tokens - num_real)

            new_blocks = None
            while True:
                new_blocks = self.kv_cache_manager.allocate_slots(
                    request, num_new_tokens)
                if new_blocks is not None:
                    break
                # preempt the lowest-priority (highest value; most
                # recently arrived on ties) running request — only among
                # requests not yet granted tokens this step
                if self._has_priority:
                    preempted = max(
                        self.running[req_index:],
                        key=lambda r: (r.priority, r.arrival_time))
                    self.running.remove(preempted)
                else:
                    preempted = self.running.pop()
                if preempted is request and not self.running:
                    # The request alone exceeds the whole pool: it can
                    # never make progress. Finish it instead of
                    # livelocking on recompute.
                    request.status = RequestStatus.FINISHED_IGNORED
                    self._free_request(request)
                    self.ignored_req_ids.add(request.request_id)
                    logger.warning(
                        "Request %s exceeds KV-cache capacity; aborted",
                        request.request_id)
                    break
                self._preempt(preempted)
                if preempted is request:
                    break
            if new_blocks is None:
                break  # the request itself was preempted or aborted

            output.num_scheduled_tokens[request.request_id] = num_new_tokens
            output.total_num_scheduled_tokens += num_new_tokens
            token_budget -= num_new_tokens
            if num_spec:
                output.scheduled_spec_decode_tokens[request.request_id] = \
                    request.spec_token_ids[:num_spec]
            output.scheduled_cached_reqs.append(
                CachedRequestData(
                    req_id=request.request_id,
                    resumed_from_preemption=False,
                    # drafts are not in all_token_ids; the slice naturally
                    # truncates to the real tokens (drafts travel via
                    # scheduled_spec_decode_tokens)
                    new_token_ids=request.all_token_ids[
                        request.num_computed_tokens:
                        request.num_computed_tokens + num_new_tokens],
                    new_block_ids=[b.block_id for b in new_blocks],
                    num_computed_tokens=request.num_computed_tokens,
                ))
            req_index += 1

        # -- admit waiting requests
        while (self.waiting and token_budget > 0
               and len(self.running) < self.max_num_seqs):
            request = self.waiting[0]

            computed_blocks, num_computed = (
                self.kv_cache_manager.get_computed_blocks(request)
                if request.status == RequestStatus.WAITING
                and not request.mm_inputs else ([], 0))
            # (mm requests skip prefix-cache reuse: block hashes do not
            # yet mix in image content — conservative, like the
            # reference TPU-V1 which disables prefix caching outright)
            # A resumed (preempted) request recomputes from scratch but
            # may still hit the prefix cache via the chain above; its
            # num_computed_tokens was reset at preemption.
            num_new_tokens = request.num_tokens - num_computed
            if not self.config.chunked_prefill and \
                    num_new_tokens > token_budget:
                break
            num_new_tokens = min(num_new_tokens, token_budget)
            if num_new_tokens <= 0:
                break
            if request.mm_inputs:
                request.num_computed_tokens = num_computed
                num_new_tokens = self._schedule_encoder_inputs(
                    request, num_new_tokens, output)
                if num_new_tokens <= 0:
                    break  # head-of-line blocked on encoder budget

            new_blocks = self.kv_cache_manager.allocate_slots(
                request, num_new_tokens, computed_blocks)
            if new_blocks is None:
                break  # pool exhausted; try next step

            self.waiting.popleft()
            resumed = request.status == RequestStatus.PREEMPTED
            request.status = RequestStatus.RUNNING
            request.num_computed_tokens = num_computed
            self.running.append(request)

            output.num_scheduled_tokens[request.request_id] = num_new_tokens
            output.total_num_scheduled_tokens += num_new_tokens
            output.num_cached_tokens += num_computed
            token_budget -= num_new_tokens

            all_block_ids = self.kv_cache_manager.get_block_ids(
                request.request_id)
            if resumed:
                output.scheduled_cached_reqs.append(
                    CachedRequestData(
                        req_id=request.request_id,
                        resumed_from_preemption=True,
                        new_token_ids=request.all_token_ids[
                            num_computed:num_computed + num_new_tokens],
                        new_block_ids=all_block_ids,
                        num_computed_tokens=num_computed,
                    ))
            else:
                output.scheduled_new_reqs.append(
                    NewRequestData(
                        req_id=request.request_id,
                        prompt_token_ids=request.prompt_token_ids,
                        sampling_params=request.sampling_params,
                        block_ids=all_block_ids,
                        num_computed_tokens=num_computed,
                        lora_slot=getattr(request, "lora_slot", 0),
                        mm_inputs=request.mm_inputs,
                    ))

        # constrained decoding payloads for rows that sample this step
        for rid, nt in output.num_scheduled_tokens.items():
            request = self.requests.get(rid)
            if request is None or not request.needs_constraints:
                continue
            if request.num_computed_tokens + nt < request.num_tokens:
                continue  # mid-prefill: no token sampled
            mask = self._constraint_mask(request)
            if mask is not None:
                output.guided_masks[rid] = mask
            if request.sampling_params.logit_bias:
                output.logit_bias[rid] = request.sampling_params.logit_bias

        output.finished_req_ids = self.finished_req_ids
        self.finished_req_ids = set()
        output.free_encoder_input_ids = \
            self.encoder_cache_manager.get_freed_ids()
        return output

    def _schedule_encoder_inputs(self, request: Request,
                                 num_new_tokens: int,
                                 output: SchedulerOutput) -> int:
        """Gate scheduled tokens on encoder-output availability: any
        placeholder span intersecting [start, start+n) must have its
        encoder output cached or allocatable; otherwise truncate the
        chunk just before the span (reference
        v1/core/scheduler.py::_try_schedule_encoder_inputs)."""
        start = request.num_computed_tokens
        ecm = self.encoder_cache_manager
        for idx, mi in enumerate(request.mm_inputs):
            s0, e0 = mi.offset, mi.offset + mi.length
            if e0 <= start:
                continue  # fully computed
            if s0 >= start + num_new_tokens:
                break  # beyond this chunk
            if ecm.has_cache(request, idx):
                continue
            if ecm.can_allocate(request, idx):
                ecm.allocate(request, idx)
                output.scheduled_encoder_inputs.setdefault(
                    request.request_id, []).append(idx)
            else:
                num_new_tokens = s0 - start
                break
        return num_new_tokens

    def _constraint_mask(self, request: Request):
        """AND of guided-FSM / allowed_token_ids masks minus bad-words
        bans (host-side; shipped as a vocab bitmask)."""
        import numpy as np

        def pad(m: np.ndarray, fill: bool) -> np.ndarray:
            v = self.vocab_size
            if v is None or len(m) == v:
                return m
            out = np.full(v, fill, bool)
            out[:min(len(m), v)] = m[:v]
            return out

        mask = None
        if request.guided_fsm is not None:
            m = request.guided_fsm.allowed_mask()
            if m is not None:
                # tokens beyond the tokenizer vocab are undecodable ->
                # never allowed under a grammar
                mask = pad(m.copy(), fill=False)
        if request.allowed_mask is not None:
            am = pad(request.allowed_mask, fill=False)
            mask = am.copy() if mask is None else (mask & am)
        if request.bad_words_ids:
            banned = []
            toks = request.all_token_ids
            for seq in request.bad_words_ids:
                pre = seq[:-1]
                if len(pre) == 0 or (len(toks) >= len(pre)
                                     and toks[-len(pre):] == pre):
                    banned.append(seq[-1])
            if banned:
                if mask is None:
                    size = (self.vocab_size
                            or max(max(s) for s in
                                   request.bad_words_ids) + 1)
                    mask = np.ones(size, bool)
                for b in banned:
                    if b < len(mask):
                        mask[b] = False
        return mask

    def _schedule_multistep(self) -> Optional[SchedulerOutput]:
        """Schedule N decode tokens per request for one fused device
        dispatch (runner runs a lax.scan). Only when the whole batch is
        in steady decode: nothing waiting, every running request has
        exactly one token to compute, none needs logprobs or carries
        drafts, and all have N tokens of model-length headroom."""
        n = self.config.num_scheduler_steps
        if n <= 1 or self.waiting or not self.running:
            return None
        # speculative windows (in-graph proposers composed with
        # multi-step, runner spec_loop): every iteration may emit up to
        # k+1 tokens, so KV slots are granted for the worst case
        n_alloc = n * (1 + self.window_spec_k)
        # the device executes the window one iteration at a time, so the
        # per-dispatch width is len(running) tokens — N does not inflate
        # the compiled batch (the N x S accounting is host-side only)
        if len(self.running) > self.max_num_batched_tokens:
            return None
        for r in self.running:
            sp = r.sampling_params
            if (r.num_computed_tokens != r.num_tokens - 1
                    or r.spec_token_ids
                    or sp.logprobs is not None
                    or sp.logits_processors
                    or r.needs_constraints
                    or getattr(r, "lora_slot", 0)
                    or sp.presence_penalty != 0
                    or sp.frequency_penalty != 0
                    or sp.repetition_penalty != 1.0
                    or r.num_tokens + n_alloc > self.max_model_len
                    # a request that would finish early in the window
                    # wastes most of it (and a near-empty batch would
                    # compile a whole window variant for a handful of
                    # tokens); moderate overshoot is fine — the window
                    # finalizer truncates past max_tokens
                    or r.max_tokens - r.num_output_tokens < max(1, n // 2)):
                return None

        output = SchedulerOutput()
        output.num_scheduler_steps = n
        output.spec_window_k = self.window_spec_k
        for request in list(self.running):
            new_blocks = self.kv_cache_manager.allocate_slots(request,
                                                              n_alloc)
            if new_blocks is None:
                # pool pressure: fall back to the regular path (which can
                # preempt); blocks allocated so far are consistent state
                return None
            output.num_scheduled_tokens[request.request_id] = n_alloc
            output.total_num_scheduled_tokens += n_alloc
            output.scheduled_cached_reqs.append(
                CachedRequestData(
                    req_id=request.request_id,
                    resumed_from_preemption=False,
                    new_token_ids=request.all_token_ids[
                        request.num_computed_tokens:],
                    new_block_ids=[b.block_id for b in new_blocks],
                    num_computed_tokens=request.num_computed_tokens,
                ))
        output.finished_req_ids = self.finished_req_ids
        self.finished_req_ids = set()
        return output

    def _priority_preempt(self) -> None:
        """Force-preempt running work for a blocked higher-priority
        waiting request (role of reference V0
        _schedule_priority_preemption, core/scheduler.py:952): while a
        priority inversion exists — the head-of-waiting outranks the
        worst running request — and the head cannot be admitted (seq
        slots full or KV pool too tight), evict the worst-priority
        running request back to waiting."""
        head = self.waiting[0]
        hk = (head.priority, head.arrival_time)
        bs = self.kv_cache_manager.block_size
        chunk = min(head.num_tokens, self.max_num_batched_tokens)
        blocks_needed = (chunk + bs - 1) // bs
        while self.running:
            victim = max(self.running,
                         key=lambda r: (r.priority, r.arrival_time))
            if (victim.priority, victim.arrival_time) <= hk:
                return  # no inversion: nothing outranked by the head
            can_admit = (
                len(self.running) < self.max_num_seqs
                and (self.kv_cache_manager.block_pool
                     .get_num_free_blocks() >= blocks_needed))
            if can_admit:
                return
            self.running.remove(victim)
            self._preempt(victim)
            # _preempt put the victim at the FRONT of waiting; keep the
            # high-priority head first
            self.waiting.remove(victim)
            self.waiting.append(victim)

    def _preempt(self, request: Request) -> None:
        if request.mm_inputs:
            # recompute-from-scratch preemption re-encodes too
            self.encoder_cache_manager.free(request)
        self.kv_cache_manager.free(request)
        request.status = RequestStatus.PREEMPTED
        request.num_computed_tokens = 0
        request.num_preemptions += 1
        self.num_preemptions += 1
        self.waiting.appendleft(request)

    # ------------------------------------------------------------------
    # post-execution update

    def update_from_output(
            self, scheduler_output: SchedulerOutput,
            runner_output: ModelRunnerOutput) -> List[EngineCoreOutput]:
        outputs: List[EngineCoreOutput] = []
        new_running: List[Request] = []
        for request in self.running:
            req_id = request.request_id
            num_scheduled = scheduler_output.num_scheduled_tokens.get(req_id)
            if num_scheduled is None:
                new_running.append(request)
                continue
            num_draft = len(scheduler_output.scheduled_spec_decode_tokens
                            .get(req_id, ()))
            if scheduler_output.num_scheduler_steps > 1:
                # windows advance by what the device actually emitted
                # (== num_scheduled for plain windows; 1..k+1 per
                # iteration for speculative windows)
                num_generated = len(
                    runner_output.sampled_token_ids.get(req_id, ()))
                request.num_computed_tokens += num_generated
                if scheduler_output.spec_window_k:
                    self.spec_stats_proposed += (
                        scheduler_output.num_scheduler_steps
                        * scheduler_output.spec_window_k)
                    self.spec_stats_accepted += (
                        num_generated
                        - scheduler_output.num_scheduler_steps)
            elif num_draft:
                # rejected drafts were computed but their KV is invalid:
                # roll num_computed back by (num_draft + 1 - num_generated)
                # (reference v1/core/scheduler.py:517-523)
                num_generated = len(
                    runner_output.sampled_token_ids.get(req_id, ()))
                request.num_computed_tokens += (
                    num_scheduled - (num_draft + 1 - num_generated))
                self.spec_stats_proposed += num_draft
                self.spec_stats_accepted += num_generated - 1
            else:
                request.num_computed_tokens += num_scheduled
            request.spec_token_ids = []
            if request.mm_inputs:
                # free encoder outputs whose span is now fully computed
                for idx, mi in enumerate(request.mm_inputs):
                    if (mi.offset + mi.length
                            <= request.num_computed_tokens):
                        self.encoder_cache_manager.free_encoder_input(
                            request, idx)

            plp = runner_output.prompt_logprobs.get(req_id)
            if plp is not None:
                self._accumulate_prompt_logprobs(request, plp)

            if request.num_computed_tokens < request.num_tokens:
                # partial prefill: sampled token is not valid yet
                new_running.append(request)
                continue

            sampled = runner_output.sampled_token_ids.get(req_id, [])
            raw = runner_output.raw_logits.get(req_id)
            if raw is not None and sampled:
                # per-request logits processors: apply the callables to
                # the full logits row on host and re-sample, overriding
                # the in-graph token (reference sampling_params
                # logits_processors; V0 sampler host application). Sync
                # single-step composition guarantees the next step's
                # input token comes from this host state.
                from vllm_pq_tpu.layers.host_sample import (
                    apply_logits_processors, host_sample)
                logits = apply_logits_processors(
                    request.sampling_params.logits_processors,
                    request.prompt_token_ids,
                    list(request.output_token_ids), raw)
                sampled = [host_sample(logits, request)]
            new_token_ids: List[int] = []
            finish = None
            for tok in sampled:
                request.append_output_token_ids(tok)
                new_token_ids.append(tok)
                if request.guided_fsm is not None:
                    request.guided_fsm.advance(tok)
                    if request.guided_fsm.is_terminated:
                        request.status = RequestStatus.FINISHED_STOPPED
                        finish = request.status
                finish = finish or self._check_stop(request, tok)
                if finish is not None:
                    break
            if request.logprobs is not None:
                lp = runner_output.logprobs.get(req_id)
                if lp is not None:
                    request.logprobs.append(lp)

            send_plp = None
            acc = getattr(request, "prompt_logprobs_acc", None)
            if acc is not None and not getattr(request, "_plp_sent",
                                               False):
                send_plp = acc
                request._plp_sent = True
            outputs.append(
                EngineCoreOutput(
                    req_id=req_id,
                    new_token_ids=new_token_ids,
                    finish_reason=request.get_finish_reason(),
                    stop_reason=request.stop_reason,
                    logprobs=runner_output.logprobs.get(req_id),
                    prompt_logprobs=send_plp,
                ))
            if finish is not None:
                self._free_request(request)
            else:
                new_running.append(request)
        self.running = new_running
        return outputs

    def _accumulate_prompt_logprobs(self, request: Request, plp) -> None:
        """Assemble per-position {token_id: Logprob} dicts from the
        runner's prompt-logprob chunk (reference prompt_logprobs
        semantics: entry i is the logprob of prompt token i given tokens
        < i; position 0 is None)."""
        from vllm_pq_tpu.outputs import Logprob
        start, ids, vals, tgt = plp
        acc = getattr(request, "prompt_logprobs_acc", None)
        if acc is None:
            acc = request.prompt_logprobs_acc = []
        if start == 0 and not acc:
            acc.append(None)
        prompt = request.prompt_token_ids
        for i in range(ids.shape[0]):
            pos = start + i
            if pos + 1 >= request.num_prompt_tokens:
                break
            d = {int(prompt[pos + 1]): Logprob(float(tgt[i]))}
            for j in range(ids.shape[1]):
                d.setdefault(int(ids[i, j]), Logprob(float(vals[i, j])))
            acc.append(d)

    def _check_stop(self, request: Request,
                    last_token: int) -> Optional[RequestStatus]:
        sp = request.sampling_params
        if (request.num_tokens >= self.max_model_len
                or request.num_output_tokens >= request.max_tokens):
            request.status = RequestStatus.FINISHED_LENGTH_CAPPED
            return request.status
        if request.num_output_tokens < sp.min_tokens:
            return None
        if (not sp.ignore_eos and request.eos_token_id is not None
                and last_token == request.eos_token_id):
            request.status = RequestStatus.FINISHED_STOPPED
            return request.status
        if last_token in sp.stop_token_ids:
            request.status = RequestStatus.FINISHED_STOPPED
            request.stop_reason = last_token
            return request.status
        return None

    def _free_request(self, request: Request) -> None:
        # disaggregated prefill: the producer ships this request's KV
        # pages before they are freed (engine/core.py _send_request_kv)
        hook = getattr(self, "on_request_freed", None)
        if hook is not None:
            hook(request)
        if request.mm_inputs:
            self.encoder_cache_manager.free(request)
        self.kv_cache_manager.free(request)
        self.kv_cache_manager.free_block_hashes(request)
        self.finished_req_ids.add(request.request_id)
        self.requests.pop(request.request_id, None)

    # ------------------------------------------------------------------

    def reset_prefix_cache(self) -> bool:
        return self.kv_cache_manager.reset_prefix_cache()

    def make_stats(self) -> dict:
        pool = self.kv_cache_manager.block_pool
        return {
            "num_running": len(self.running),
            "num_waiting": len(self.waiting),
            "kv_cache_usage": pool.get_usage(),
            "prefix_cache_queries": pool.query_count,
            "prefix_cache_hits": pool.hit_count,
            "num_preemptions": self.num_preemptions,
            "spec_tokens_proposed": self.spec_stats_proposed,
            "spec_tokens_accepted": self.spec_stats_accepted,
        }
