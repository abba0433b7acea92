"""Draft-model speculative decoding proposer.

Role of the reference's draft-model spec-decode framework
(``spec_decode/spec_decode_worker.py:456`` + ``multi_step_worker.py`` +
``top1_proposer.py:44``): a small causal LM with the same vocabulary
proposes K greedy tokens per decode row; the target model verifies them
in one fused step through the existing rejection sampler
(``layers/rejection.py`` — greedy-exact verification).

TPU-native design: the draft is a second, independent ModelRunner on the
same mesh with its OWN paged KV pool of the SAME block count — the
target scheduler's block ids index both pools, so no separate draft
block accounting exists:

- mirror pass: every real SchedulerOutput is replayed into the draft
  runner, which writes draft KV for exactly the tokens the target
  computed (prefill chunks, accepted tokens, and speculative positions;
  rejected positions are recomputed by the next step's replay, so the
  draft cache self-heals);
- proposal pass: K synthetic single-token steps roll the draft forward
  greedily from each row's last accepted token. KV slots beyond the
  allocated block table land on the null page — a late-position draft
  may then attend to a null page (slightly worse drafts near page
  boundaries), never an incorrect accepted token (verification is
  exact regardless of draft quality).
"""

import copy
from typing import Dict, List

from vllm_pq_tpu.core.scheduler_output import (CachedRequestData,
                                               SchedulerOutput)
from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)


class DraftModelProposer:

    def __init__(self, config, mesh, num_kv_blocks: int):
        from vllm_pq_tpu.model_loader.loader import load_model_params
        from vllm_pq_tpu.models.registry import build_model
        from vllm_pq_tpu.quantization import get_linear_method
        from vllm_pq_tpu.worker.runner import ModelRunner

        cfg2 = copy.deepcopy(config)
        cfg2.model.model = config.speculative.model
        cfg2.model.tokenizer = config.speculative.model
        cfg2.speculative.method = None
        cfg2.speculative.num_spec_tokens = 0
        cfg2.scheduler.async_scheduling = False
        cfg2.scheduler.num_scheduler_steps = 1
        cfg2.lora.enable_lora = False
        cfg2.compilation.warmup = False
        self.k = config.speculative.num_spec_tokens

        linear_method = get_linear_method(cfg2.model.quantization)
        model, linear_method = build_model(cfg2, linear_method)
        params = load_model_params(model, mesh, cfg2, linear_method)
        from vllm_pq_tpu.quantization.resident import maybe_make_resident
        resident = maybe_make_resident(model, params, mesh, cfg2)
        if resident is not None:
            params = resident
        self.runner = ModelRunner(cfg2, mesh, model, params,
                                  num_kv_blocks)
        logger.info("draft model loaded: %s (K=%d)",
                    cfg2.model.model, self.k)

    # ------------------------------------------------------------------

    def on_step(self, so: SchedulerOutput, request_meta: Dict,
                scheduler) -> None:
        """Replay the real step into the draft, then propose K tokens
        for every eligible decode row (attached as spec_token_ids)."""
        if so.total_num_scheduled_tokens:
            self.runner.execute_model(so, request_meta)

        eligible = []
        for req in scheduler.running:
            req.spec_token_ids = []
            if req.num_computed_tokens != req.num_tokens - 1:
                continue  # still prefilling
            sp = req.sampling_params
            if (sp.logprobs is not None
                    or sp.presence_penalty != 0
                    or sp.frequency_penalty != 0
                    or sp.repetition_penalty != 1.0
                    or req.needs_constraints
                    or getattr(req, "lora_slot", 0)
                    or req.num_output_tokens < sp.min_tokens
                    or req.num_tokens + self.k + 1
                    >= scheduler.max_model_len):
                continue
            if req.request_id not in self.runner.input_batch \
                    .req_id_to_index:
                continue
            eligible.append(req)
        if not eligible:
            return

        drafts: Dict[str, List[int]] = {r.request_id: [] for r in eligible}
        # roll the draft forward K times with synthetic one-token steps
        last = {r.request_id: r.all_token_ids[-1] for r in eligible}
        ncomp = {r.request_id: r.num_tokens - 1 for r in eligible}
        for _ in range(self.k):
            so2 = SchedulerOutput()
            for r in eligible:
                rid = r.request_id
                so2.scheduled_cached_reqs.append(CachedRequestData(
                    req_id=rid, resumed_from_preemption=False,
                    new_token_ids=[last[rid]], new_block_ids=[],
                    num_computed_tokens=ncomp[rid]))
                so2.num_scheduled_tokens[rid] = 1
                so2.total_num_scheduled_tokens += 1
            out = self.runner.execute_model(so2, None)
            for r in eligible:
                rid = r.request_id
                sampled = out.sampled_token_ids.get(rid)
                if not sampled:
                    continue
                tok = int(sampled[0])
                drafts[rid].append(tok)
                last[rid] = tok
                ncomp[rid] += 1

        for r in eligible:
            ds = drafts[r.request_id]
            if ds:
                r.spec_token_ids = ds
