"""EAGLE / DeepSeek-MTP speculative proposers.

Role of the reference's EAGLE draft worker and DeepSeek multi-token
predictor (``vllm/model_executor/models/eagle.py:44``,
``deepseek_mtp.py``; proposer framework ``vllm/spec_decode/``): a
hidden-state-conditioned 1-layer decoder (models/eagle_draft.py)
proposes K tokens per decode row; the target verifies them through the
existing rejection path (``layers/rejection.py``).

Orchestration follows the TPU-native mirror design of
``spec_decode/draft_proposer.py`` — the draft is a second ModelRunner
on the same mesh with its own paged pool indexed by the TARGET's block
ids — with two EAGLE-specific twists:

- **token shift**: draft position p consumes target token ``x_{p+1}``
  and target hidden ``f_p`` (EAGLE predicts one feature step ahead), so
  the mirror replays each scheduled range with tokens shifted one
  forward (always known post-update) while hidden states ride the
  target's exported flat layout;
- **hidden plumbing stays on device**: the target runner exports
  ``last_hidden`` ([t_bucket, H]) and the per-row ``last_sel_hidden``
  as device handles; the draft's dispatch gathers the slots it needs
  (runner.dispatch_model hidden_cond tuple form). Roll steps feed the
  draft's own previous hidden back — the f_{t+1} := g_t chain of the
  EAGLE paper.
"""

import copy
import json
import os
from typing import Dict, List, Optional

import numpy as np

from vllm_pq_tpu.core.scheduler_output import (CachedRequestData,
                                               NewRequestData,
                                               SchedulerOutput)
from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)


def load_eagle_draft(path: str, dtype, style: str = "eagle"):
    """Load an EAGLE(-vllm-compat) or MTP draft checkpoint directory.

    Returns (EagleDraftModel, params). Key layout (torch [out, in]
    linears are transposed): ``fc.weight``/``eh_proj.weight``,
    ``(model.)layers.N.*``, ``(model.)embed_tokens.weight``, optional
    ``lm_head.weight`` (else injected from the target by the proposer),
    MTP extras ``enorm/hnorm/shared_head.norm``.
    """
    import jax.numpy as jnp
    from safetensors import safe_open

    from vllm_pq_tpu.models.eagle_draft import EagleDraftModel
    from vllm_pq_tpu.models.llama import LlamaConfig, _linear_defs
    from vllm_pq_tpu.quantization.methods import UnquantizedLinearMethod

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    hf.setdefault("architectures", ["LlamaForCausalLM"])
    cfg = LlamaConfig.from_hf_config(type("HF", (), hf))
    cfg.dtype = dtype
    cfg.tie_word_embeddings = False

    tensors: Dict[str, np.ndarray] = {}
    for fn in sorted(os.listdir(path)):
        if fn.endswith(".safetensors"):
            with safe_open(os.path.join(path, fn), framework="np") as f:
                for k in f.keys():
                    kk = k
                    for pre in ("model.", "mtp.", "speculator."):
                        if kk.startswith(pre):
                            kk = kk[len(pre):]
                    tensors[kk] = f.get_tensor(k)

    fc_key = "eh_proj.weight" if "eh_proj.weight" in tensors else \
        "fc.weight"
    fc_bias = "fc.bias" in tensors
    model = EagleDraftModel(cfg, UnquantizedLinearMethod(), style=style,
                            fc_bias=fc_bias)

    def t2j(a, transpose=False):
        a = np.asarray(a)
        if transpose:
            a = a.T
        return jnp.asarray(a, cfg.dtype)

    layers = []
    for li in range(cfg.num_hidden_layers):
        lp = {}
        hfmap = {"q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
                 "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
                 "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
                 "down_proj": "mlp.down_proj"}
        for name, _i, _o, _k in _linear_defs(cfg):
            w = tensors[f"layers.{li}.{hfmap[name]}.weight"]
            lp[name] = {"weight": t2j(w, transpose=True)}
        for nn, hk in (("input_layernorm", "input_layernorm"),
                       ("post_attention_layernorm",
                        "post_attention_layernorm")):
            key = f"layers.{li}.{hk}.weight"
            w = tensors.get(key)
            if w is None:  # EAGLE layer-0 input norm is bypassed anyway
                w = np.ones(cfg.hidden_size, np.float32)
            lp[nn] = {"weight": t2j(w)}
        layers.append(lp)

    params = {
        "embed_tokens": {"weight": t2j(tensors["embed_tokens.weight"])},
        "layers": layers,
        "norm": {"weight": t2j(tensors.get(
            "norm.weight", np.ones(cfg.hidden_size, np.float32)))},
        "fc": {"weight": t2j(tensors[fc_key], transpose=True)},
    }
    if fc_bias:
        params["fc"]["bias"] = t2j(tensors["fc.bias"])
    if "lm_head.weight" in tensors:
        params["lm_head"] = {
            "weight": t2j(tensors["lm_head.weight"], transpose=True)}
    if style == "mtp":
        params["enorm"] = {"weight": t2j(tensors["enorm.weight"])}
        params["hnorm"] = {"weight": t2j(tensors["hnorm.weight"])}
        params["head_norm"] = {"weight": t2j(
            tensors.get("shared_head.norm.weight",
                        tensors.get("head_norm.weight")))}
    return model, params


class EagleProposer:
    """Mirror + roll proposer for EAGLE / MTP draft heads."""

    def __init__(self, config, mesh, num_kv_blocks: int, target_runner,
                 style: str = "eagle"):
        from vllm_pq_tpu.worker.runner import ModelRunner

        cfg2 = copy.deepcopy(config)
        cfg2.model.model = config.speculative.model
        cfg2.speculative.method = None
        cfg2.speculative.num_spec_tokens = 0
        cfg2.scheduler.async_scheduling = False
        cfg2.scheduler.num_scheduler_steps = 1
        cfg2.lora.enable_lora = False
        cfg2.compilation.warmup = False
        self.k = config.speculative.num_spec_tokens
        self.target = target_runner

        model, params = load_eagle_draft(
            config.speculative.model, cfg2.model.dtype, style=style)
        if "lm_head" not in params:
            # yuhuili-style EAGLE checkpoints ship no lm_head: share the
            # target's (reference eagle.py load_weights fallback)
            tp = target_runner.params
            lm = tp.get("lm_head") or tp.get("embed_tokens")
            params["lm_head"] = ({"weight": lm["weight"].T}
                                 if "lm_head" not in tp else dict(lm))
        self.runner = ModelRunner(cfg2, mesh, model, params,
                                  num_kv_blocks)
        logger.info("%s draft loaded: %s (K=%d, %d layer(s))",
                    style, config.speculative.model, self.k,
                    model.cfg.num_hidden_layers)

    # ------------------------------------------------------------------

    def _eligible(self, scheduler):
        out = []
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
            out.append(req)
        return out

    def on_step(self, so: SchedulerOutput, request_meta: Optional[Dict],
                scheduler) -> None:
        import jax.numpy as jnp

        # ---- mirror pass: replay the ACCEPTED ranges, tokens shifted
        # one forward, hidden states gathered from the target's export
        src_offs = dict(getattr(self.target, "last_flat_offsets", {}))
        so2 = SchedulerOutput()
        ib2 = self.runner.input_batch
        for nr in so.scheduled_new_reqs:
            req = scheduler.requests.get(nr.req_id)
            if req is None or nr.req_id not in src_offs:
                continue
            nt = req.num_computed_tokens - nr.num_computed_tokens
            if nt <= 0:
                continue
            toks = req._all_token_ids[
                nr.num_computed_tokens + 1:req.num_computed_tokens + 1]
            so2.scheduled_new_reqs.append(NewRequestData(
                req_id=nr.req_id, prompt_token_ids=list(toks),
                sampling_params=nr.sampling_params,
                block_ids=list(nr.block_ids),
                num_computed_tokens=nr.num_computed_tokens))
            so2.num_scheduled_tokens[nr.req_id] = nt
            so2.total_num_scheduled_tokens += nt
            src_offs[nr.req_id] = (src_offs[nr.req_id][0],
                                   min(src_offs[nr.req_id][1], nt))
        for cr in so.scheduled_cached_reqs:
            req = scheduler.requests.get(cr.req_id)
            if (req is None or cr.req_id not in src_offs
                    or cr.req_id not in ib2.req_id_to_index):
                continue
            c0 = cr.num_computed_tokens
            nt = req.num_computed_tokens - c0
            if nt <= 0:
                continue
            toks = req._all_token_ids[c0 + 1:req.num_computed_tokens + 1]
            so2.scheduled_cached_reqs.append(CachedRequestData(
                req_id=cr.req_id,
                resumed_from_preemption=cr.resumed_from_preemption,
                new_token_ids=list(toks),
                new_block_ids=list(cr.new_block_ids),
                num_computed_tokens=c0))
            so2.num_scheduled_tokens[cr.req_id] = nt
            so2.total_num_scheduled_tokens += nt
            src_offs[cr.req_id] = (src_offs[cr.req_id][0],
                                   min(src_offs[cr.req_id][1], nt))
        # mirror request lifecycle (adds above; frees ride along so the
        # draft batch doesn't leak finished rows)
        so2.finished_req_ids = set(so.finished_req_ids)
        if so2.total_num_scheduled_tokens or so2.finished_req_ids:
            self.runner._next_hidden_cond = (self.target.last_hidden,
                                             src_offs)
            self.runner.execute_model(so2, None)

        # ---- roll passes: K single-token steps, feeding the draft's
        # own hidden back (f_{t+1} := g_t)
        eligible = self._eligible(scheduler)
        if not eligible:
            return
        drafts: Dict[str, List[int]] = {r.request_id: []
                                        for r in eligible}
        last = {r.request_id: r.all_token_ids[-1] for r in eligible}
        ncomp = {r.request_id: r.num_tokens - 1 for r in eligible}
        cond = self.runner.last_sel_hidden  # [S, H] row-aligned
        for _ in range(self.k):
            so3 = SchedulerOutput()
            for r in eligible:
                rid = r.request_id
                so3.scheduled_cached_reqs.append(CachedRequestData(
                    req_id=rid, resumed_from_preemption=False,
                    new_token_ids=[last[rid]], new_block_ids=[],
                    num_computed_tokens=ncomp[rid]))
                so3.num_scheduled_tokens[rid] = 1
                so3.total_num_scheduled_tokens += 1
            self.runner._next_hidden_cond = jnp.asarray(cond)
            out = self.runner.execute_model(so3, None)
            cond = self.runner.last_sel_hidden
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
