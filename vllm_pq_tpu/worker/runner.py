"""Model runner: persistent batch + bucketed fused step functions.

Role of the reference's ``v1/worker/tpu_model_runner.py`` redesigned for
JAX:
- static-shape discipline: the flat token axis is padded to a bucket
  (pow-2 ladder, reference pads to x16 at ``:419-440``); the sequence
  axis is fixed at ``max_num_seqs`` so only one axis varies;
- ONE jitted function per bucket runs model forward + logits + sampling
  (+ draft verification) — the V0-TPU precedent of sampling inside the
  compiled graph (``worker/tpu_model_runner.py:676-684``) taken further;
- ALL per-step host metadata travels in ONE packed int32 buffer (floats
  bitcast), so a step costs exactly one host->device transfer and one
  small device->host fetch of the sampled tokens. Per-transfer latency
  dominates decode on tunneled/remote TPUs (measured ~3ms h2d / ~20ms
  d2h here), and is non-trivial even locally — the same reason the
  reference's TPU backend caches multi-step outputs
  (``worker/tpu_model_runner.py:603-632``);
- host side is numpy-first (reference ``_prepare_inputs``,
  ``gpu_model_runner.py:447``): the scheduler<->runner protocol never
  touches device memory.
"""

import functools
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.config import EngineConfig
from vllm_pq_tpu.core.scheduler_output import (ModelRunnerOutput,
                                               SchedulerOutput)
from vllm_pq_tpu.layers.sampler import (SamplingState, compute_logprobs,
                                        sample)
from vllm_pq_tpu.logger import init_logger
from vllm_pq_tpu.utils import cdiv
from vllm_pq_tpu.worker.input_batch import InputBatch

logger = init_logger(__name__)


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


class _PackedLayout:
    """Offsets of the per-step metadata fields inside the single int32
    transfer buffer. Float fields are bitcast to int32."""

    I32_FIELDS = ("token_ids", "positions", "slot_mapping", "kv_lens",
                  "cu_q_lens", "num_seqs", "logits_indices", "page_indices",
                  "drafts", "num_drafts", "prev_assumed",
                  "top_k", "seed", "has_seed",
                  "eos_token_id", "min_tokens", "output_len",
                  "logits_mask", "bias_rows", "bias_toks",
                  "lora_sorted_tok", "lora_groups", "prev_rows",
                  "plp_targets", "token_hist", "num_prompt",
                  "mrope_pos", "rope_delta")
    F32_FIELDS = ("temperature", "top_p", "min_p", "presence_penalty",
                  "frequency_penalty", "repetition_penalty", "bias_vals")

    MAX_BIAS = 256  # total logit-bias entries per step

    def __init__(self, t_bucket: int, s: int, k1: int, max_blocks: int,
                 spec_k: int, mask_words: int = 0, lora_slots: int = 0,
                 hist_len: int = 0, mrope: bool = False):
        self.mask_words = mask_words
        self.lora_slots = lora_slots
        self.hist_len = hist_len
        self.mrope = mrope
        sizes = {
            "lora_sorted_tok": t_bucket if lora_slots else 0,
            "lora_groups": lora_slots,
            # Qwen2-VL 3D rope: per-token (t, h, w) plan + per-row
            # decode delta (models/qwen2_vl.py)
            "mrope_pos": 3 * t_bucket if mrope else 0,
            "rope_delta": s if mrope else 0,
        }
        sizes |= {
            "token_ids": t_bucket, "positions": t_bucket,
            "slot_mapping": t_bucket,
            "kv_lens": s, "cu_q_lens": s + 1, "num_seqs": 1,
            "logits_indices": s * k1, "page_indices": s * max_blocks,
            "drafts": s * spec_k, "num_drafts": s,
            # spec x async: the previous dispatch's ASSUMED sample
            # count for this row's prev_rows source (0 = no position
            # correction); the device subtracts its actual gens
            "prev_assumed": s if spec_k else 0,
            "top_k": s, "seed": s, "has_seed": s, "eos_token_id": s,
            "min_tokens": s, "output_len": s,
            # constrained-decoding payloads (zero-sized when disabled)
            "logits_mask": s * mask_words,
            "bias_rows": self.MAX_BIAS if mask_words else 0,
            "bias_toks": self.MAX_BIAS if mask_words else 0,
            # async scheduling: flat-token -> previous-step row whose
            # sampled token is this token's value (-1 = host-provided)
            "prev_rows": t_bucket,
            # prompt logprobs: next-token target per flat position
            "plp_targets": t_bucket,
            # penalties: full token history (only when a penalized
            # request is in the batch)
            "token_hist": s * hist_len,
            "num_prompt": s if hist_len else 0,
        }
        sizes.update({f: s for f in self.F32_FIELDS})
        sizes["bias_vals"] = self.MAX_BIAS if mask_words else 0
        self.offsets: Dict[str, Tuple[int, int]] = {}
        off = 0
        for f in self.I32_FIELDS + self.F32_FIELDS:
            self.offsets[f] = (off, sizes[f])
            off += sizes[f]
        self.total = off

    def view(self, buf: np.ndarray, field: str) -> np.ndarray:
        off, n = self.offsets[field]
        return buf[off:off + n]

    def fview(self, buf: np.ndarray, field: str) -> np.ndarray:
        return self.view(buf, field).view(np.float32)

    def unpack(self, packed: jax.Array) -> Dict[str, jax.Array]:
        """In-graph unpack (static offsets -> free slices)."""
        out = {}
        for f in self.I32_FIELDS:
            off, n = self.offsets[f]
            out[f] = packed[off:off + n]
        for f in self.F32_FIELDS:
            off, n = self.offsets[f]
            out[f] = jax.lax.bitcast_convert_type(packed[off:off + n],
                                                  jnp.float32)
        return out


class ModelRunner:

    def __init__(self, config: EngineConfig, mesh: Mesh, model,
                 params: Any, num_kv_blocks: int):
        self.config = config
        self.mesh = mesh
        self.model = model
        self.params = params
        self.num_kv_blocks = num_kv_blocks

        sch = config.scheduler
        self.block_size = config.cache.block_size
        self.max_num_reqs = sch.max_num_seqs
        self.max_model_len = sch.max_model_len
        # pages per request padded to a whole kv block of the attention
        # kernel (null-page padding, see ops/rpa_kernel.py)
        mbr = cdiv(sch.max_model_len, self.block_size)
        self.max_blocks_per_req = cdiv(mbr, 8) * 8
        self.token_buckets = sorted(config.compilation.token_buckets)

        self.input_batch = InputBatch(self.max_num_reqs, self.max_model_len,
                                      self.max_blocks_per_req,
                                      model.cfg.vocab_size)

        self.tp_size = config.parallel.tensor_parallel_size
        # speculative decoding: verify K drafts + 1 bonus token per row
        self.spec_k = (config.speculative.num_spec_tokens
                       if config.speculative.enabled else 0)
        # medusa heads (spec_decode/medusa.py): evaluated in-graph at
        # the step tail; set via enable_medusa() before step fns build
        self.medusa_heads = None
        # EAGLE / MTP (spec_decode/eagle.py): the target runner exports
        # per-step hidden states (device handles, never fetched to
        # host); the DRAFT runner consumes a hidden_cond step input
        self.needs_hidden_cond = getattr(model, "needs_hidden_cond",
                                         False)
        self.export_hidden = (self.needs_hidden_cond or
                              (config.speculative.enabled and
                               config.speculative.method in
                               ("eagle", "deepseek_mtp")))
        self._next_hidden_cond = None
        self.last_hidden = None
        self.last_sel_hidden = None
        # device state
        self.rope_cache = jax.device_put(
            model.rope_cache(),
            NamedSharding(mesh, P(None, None)))
        # logical (unsharded) kv shape; sharded on the kv-head axis.
        # SSM models (mamba) carry per-row recurrent f32 states instead
        # of a paged pool.
        self.is_ssm = getattr(model, "is_ssm", False)
        # hybrid attention/SSM models (Jamba): per-layer cache kinds
        self.cache_kinds = getattr(model, "cache_kinds", None)
        if self.is_ssm:
            kv_shape = model.state_shape(self.max_num_reqs)
            kv_dtype = jnp.float32
        else:
            kv_shape = model.kv_cache_shape(num_kv_blocks,
                                            self.block_size, tp_size=1)
            kv_dtype = (jnp.bfloat16 if config.model.dtype == "bfloat16"
                        else jnp.float32)
        self._kv_alloc = (kv_shape, kv_dtype)
        self.kv_spec = model.kv_cache_spec()
        if self.cache_kinds:
            self._ssm_alloc = model.state_shape(self.max_num_reqs)
            self._ssm_spec = model.ssm_state_spec()
        self.pp = config.parallel.pipeline_parallel_size
        # int8 KV cache (role of reference cache_dtype=fp8,
        # config.py:1057): int8 pages + per-(token, head) f32 scales,
        # dequant fused into the XLA attention gathers. Standard 4D MHA
        # caches only (not SSM/MLA/enc-dec/PP).
        self.kv_quant = (config.cache.cache_dtype == "int8"
                         and not self.is_ssm and len(kv_shape) == 4
                         and not getattr(model, "is_encoder_decoder",
                                         False)
                         and self.cache_kinds is None
                         and self.pp == 1)
        if config.cache.cache_dtype == "int8" and not self.kv_quant:
            logger.warning("kv-cache-dtype int8 unsupported for this "
                           "model/parallel layout; using %s", kv_dtype)
        if self.kv_quant:
            kv_axes = tuple(self.kv_spec) + (None,) * (
                4 - len(tuple(self.kv_spec)))
            self._kv_scale_spec = P(*kv_axes[:3])
            from vllm_pq_tpu.ops.attention import QuantKV
            self.kv_layer_spec = QuantKV(self.kv_spec,
                                         self._kv_scale_spec)
        else:
            self.kv_layer_spec = self.kv_spec
        if self.pp > 1:
            self._init_pp(kv_shape, kv_dtype)
        else:
            self.kv_caches = [self._alloc_kv_layer(li)
                              for li in range(model.cfg.num_hidden_layers)]
        bytes_per = (1 + 4 / kv_shape[-1] if self.kv_quant
                     else (2 if kv_dtype == jnp.bfloat16 else 4))
        logger.info("KV cache: %d pages x %s x %d layers (%s, %.2f GiB "
                    "total)", num_kv_blocks, kv_shape[1:],
                    model.cfg.num_hidden_layers,
                    "int8+scales" if self.kv_quant else str(kv_dtype),
                    np.prod(kv_shape) * model.cfg.num_hidden_layers *
                    bytes_per / 2**30)

        self._step_fns: Dict[tuple, Any] = {}
        self._layouts: Dict[tuple, _PackedLayout] = {}
        self._packed_bufs: Dict[tuple, np.ndarray] = {}
        self._step_count = 0
        self._rng_key = jax.random.PRNGKey(config.model.seed)

        # multimodal: per-request placeholder spans + encoder outputs
        # (host np, [span_len, hidden]); populated for models exposing
        # encode_images (LLaVA family)
        self._mm_spans: Dict[str, list] = {}
        self._mm_cache: Dict[Tuple[str, int], np.ndarray] = {}
        self._mm_step = None
        # MRoPE (Qwen2-VL): per-request 3D position plan + decode delta
        self._mrope_pos3: Dict[str, np.ndarray] = {}
        self._mrope_delta: Dict[str, int] = {}
        # encoder-decoder (Whisper): per-request encoder states cached
        # host-side, kept device-resident per batch row
        self._enc_np: Dict[str, np.ndarray] = {}
        # per-request encoder-input position (Mllama: the image token's
        # prompt offset; whisper: 0)
        self._enc_pos: Dict[str, int] = {}
        self._enc_dirty = True
        self._enc_dev = None

        # multi-LoRA stacks (role of reference LoRAModelManager + Punica)
        self.lora_stacks = None
        if config.lora.enable_lora:
            from vllm_pq_tpu.lora.models import LoRAStacks
            self.lora_stacks = LoRAStacks(
                model.cfg, model.lora_linear_defs(),
                config.lora.max_loras, config.lora.max_lora_rank,
                kv_dtype)

    # ------------------------------------------------------------------
    # pipeline-parallel serving mode (reference PP layer-range
    # partitioning + send/recv, here the GPipe SPMD program of
    # parallel/pipeline.py wired into the engine loop)

    def _init_pp(self, kv_shape, kv_dtype) -> None:
        from vllm_pq_tpu.parallel import pipeline as pl
        cfg = self.config
        model = self.model
        n_layers = model.cfg.num_hidden_layers
        if n_layers % self.pp:
            raise ValueError(f"num layers {n_layers} not divisible by "
                             f"pipeline_parallel_size {self.pp}")
        for feat, on in (("speculative decoding",
                          cfg.speculative.enabled),
                         ("LoRA", cfg.lora.enable_lora),
                         ("multi-step decoding",
                          cfg.scheduler.num_scheduler_steps > 1),
                         ("async scheduling",
                          cfg.scheduler.async_scheduling)):
            if on:
                raise ValueError(
                    f"{feat} is not supported with pipeline parallelism")
        # restack per-layer params with the pipe-sharded layout and drop
        # the per-layer originals (load-time streaming per stage is
        # follow-up work; the transient peak is one replicated copy)
        stacked = pl.stack_layer_params(self.params)
        self._pp_param_specs = pl.stacked_param_specs(model)
        self.params = jax.tree.map(
            lambda a, sp: jax.device_put(
                a, NamedSharding(self.mesh, sp)),
            stacked, self._pp_param_specs,
            is_leaf=lambda v: isinstance(v, jax.Array))
        self.kv_spec = pl.stacked_kv_spec(model)
        self.kv_stacked = jax.device_put(
            jnp.zeros((n_layers,) + kv_shape, kv_dtype),
            NamedSharding(self.mesh, self.kv_spec))
        self.kv_caches = []  # unused in PP mode

    def _get_pp_step(self, tm: int, n_mb: int, t_bucket: int,
                     greedy: bool, num_logprobs: int, constrained: bool,
                     penalized: bool):
        key = ("pp", tm, n_mb, t_bucket, greedy, num_logprobs,
               constrained, penalized)
        fn = self._step_fns.get(key)
        if fn is None:
            fn = self._build_pp_step(tm, n_mb, t_bucket, greedy,
                                     num_logprobs, constrained, penalized)
            self._step_fns[key] = fn
        return fn

    def _build_pp_step(self, tm: int, n_mb: int, t_bucket: int,
                       greedy: bool, num_logprobs: int, constrained: bool,
                       penalized: bool):
        from vllm_pq_tpu.parallel.pipeline import pipelined_forward
        model = self.model
        lay = self._layout(t_bucket, constrained, penalized)
        pp = self.pp
        bs = self.block_size

        def fwd(params, kv, rope, mb_inputs, logits_indices):
            hidden, new_kv = pipelined_forward(
                model, params, mb_inputs, kv, rope, pp=pp, block_size=bs)
            hid = hidden.reshape(n_mb * tm, -1).astype(model.cfg.dtype)
            sel = hid[logits_indices]
            logits = model.compute_logits(params, sel)
            return logits, new_kv

        sharded = _shard_map(
            fwd, self.mesh,
            in_specs=(self._pp_param_specs, self.kv_spec, P(None, None),
                      P(), P()),
            out_specs=(P(), self.kv_spec),
        )

        def step(params, kv, rope, packed, mb_inputs, step_key):
            f = lay.unpack(packed)
            logits, new_kv = sharded(params, kv, rope, mb_inputs,
                                     f["logits_indices"])
            toks, gens, lp, _ = self._sample_tail(
                f, logits, step_key, greedy=greedy,
                num_logprobs=num_logprobs, constrained=constrained,
                penalized=penalized, spec_k=0,
                mask_words=lay.mask_words)
            return toks, gens, lp, new_kv

        return jax.jit(step, donate_argnums=(1,))

    def _dispatch_pp(self, so: SchedulerOutput,
                     request_meta: Optional[Dict[str, Any]] = None):
        self.update_states(so, request_meta)
        if so.total_num_scheduled_tokens == 0:
            return None
        ib = self.input_batch
        if ib.prompt_logprobs_reqs:
            raise ValueError("prompt_logprobs is not supported with "
                             "pipeline parallelism")
        t_bucket, buf, row_req_ids, constrained, penalized = \
            self.prepare_inputs(so)
        s = self.max_num_reqs
        n_mb = self.pp  # M = S keeps the wavefront full enough; the
        # bubble fraction is (S-1)/(M+S-1)

        # balance rows over microbatches by token count (longest first)
        items = []
        for row in range(ib.num_reqs):
            nt = so.num_scheduled_tokens.get(ib.req_ids[row], 0)
            if nt:
                items.append((row, nt))
        groups: List[set] = [set() for _ in range(n_mb)]
        loads = [0] * n_mb
        for row, nt in sorted(items, key=lambda x: -x[1]):
            g = loads.index(min(loads))
            groups[g].add(row)
            loads[g] += nt
        tm = self._pick_bucket(max(max(loads), 1))

        mb_tok = np.zeros((n_mb, tm), np.int32)
        mb_pos = np.zeros((n_mb, tm), np.int32)
        mb_slot = np.zeros((n_mb, tm), np.int32)
        mb_kv = np.zeros((n_mb, s), np.int32)
        mb_cu = np.zeros((n_mb, s + 1), np.int32)
        mb_ns = np.full((n_mb, 1), ib.num_reqs, np.int32)
        lay = self._layout(t_bucket, constrained, penalized)
        li_view = lay.view(buf, "logits_indices")
        li_view[:] = 0
        for g in range(n_mb):
            off = 0
            for row in range(ib.num_reqs):
                rid = ib.req_ids[row]
                nt = (so.num_scheduled_tokens.get(rid, 0)
                      if row in groups[g] else 0)
                mb_cu[g, row + 1] = mb_cu[g, row] + nt
                if nt == 0:
                    continue
                start = int(ib.num_computed_tokens[row])
                end = start + nt
                mb_tok[g, off:off + nt] = ib.token_ids[row, start:end]
                mb_pos[g, off:off + nt] = np.arange(start, end,
                                                    dtype=np.int32)
                idx = np.arange(start, end, dtype=np.int32)
                blk = ib.block_table[row, idx // self.block_size]
                mb_slot[g, off:off + nt] = (blk * self.block_size
                                            + idx % self.block_size)
                mb_kv[g, row] = end
                li_view[row] = g * tm + off + nt - 1
                off += nt
            mb_cu[g, ib.num_reqs + 1:] = mb_cu[g, ib.num_reqs]

        # numpy (uncommitted) inputs: in multi-host mode every process
        # calls the same jit with identical host values — jit treats
        # them as replicated over the global mesh, whereas jnp.asarray
        # would commit them to a process-local device
        mb_inputs = {
            "token_ids": mb_tok,
            "positions": mb_pos,
            "slot_mapping": mb_slot,
            "kv_lens": mb_kv,
            "page_indices": np.broadcast_to(
                ib.block_table[:, :self.max_blocks_per_req],
                (n_mb, s, self.max_blocks_per_req)).copy(),
            "cu_q_lens": mb_cu,
            "num_seqs": mb_ns,
        }
        num_logprobs = ib.max_num_logprobs
        fn = self._get_pp_step(tm, n_mb, t_bucket, ib.all_greedy,
                               num_logprobs, constrained, penalized)
        self._step_count += 1
        step_key = np.asarray(jax.random.fold_in(self._rng_key,
                                                 self._step_count))
        packed = buf.copy()
        toks, gens, lp, self.kv_stacked = fn(
            self.params, self.kv_stacked, self.rope_cache, packed,
            mb_inputs, step_key)
        for a in (toks,) + (tuple(lp) if lp else ()):
            if a is not None:
                try:
                    a.copy_to_host_async()
                except Exception:
                    pass
        return ("step", toks, gens, lp, row_req_ids, num_logprobs,
                None, {}, None, None, {})

    # ------------------------------------------------------------------
    # packed-buffer plumbing

    def _layout(self, t_bucket: int, constrained: bool = False,
                penalized: bool = False) -> _PackedLayout:
        key = (t_bucket, constrained, penalized)
        lay = self._layouts.get(key)
        if lay is None:
            mask_words = cdiv(self.model.cfg.vocab_size, 32) \
                if constrained else 0
            lora_slots = (self.config.lora.max_loras + 1
                          if self.lora_stacks is not None else 0)
            lay = _PackedLayout(t_bucket, self.max_num_reqs,
                                self.spec_k + 1, self.max_blocks_per_req,
                                self.spec_k, mask_words, lora_slots,
                                self.max_model_len if penalized else 0,
                                mrope=bool(getattr(self.model.cfg,
                                                   "mrope_section",
                                                   None)))
            self._layouts[key] = lay
            self._packed_bufs[key] = np.zeros(lay.total, np.int32)
        return lay

    # ------------------------------------------------------------------
    # LoRA plumbing

    def _lora_specs(self):
        """PartitionSpec tree for the stacked adapters: column-parallel
        projs shard B's out dim; row-parallel shard A's in dim (delta
        added before the caller's psum)."""
        from vllm_pq_tpu.quantization.methods import TP_AXIS
        per_layer = {}
        for name, _i, _o, kind in self.model.lora_linear_defs():
            if kind == "column":
                per_layer[name] = {"a": P(None, None, None),
                                   "b": P(None, None, TP_AXIS)}
            else:
                per_layer[name] = {"a": P(None, TP_AXIS, None),
                                   "b": P(None, None, None)}
        return {"layers": [dict(per_layer)
                           for _ in range(self.model.cfg.num_hidden_layers)],
                "sorted_tok": P(), "group_sizes": P()}

    def _lora_weights(self):
        st = self.lora_stacks
        return {"layers": [
            {name: {"a": st.a[(li, name)], "b": st.b[(li, name)]}
             for name in st.defs}
            for li in range(st.num_layers)]}

    def add_lora(self, lora_model) -> int:
        assert self.lora_stacks is not None, "enable_lora=False"
        return self.lora_stacks.add(lora_model)

    def remove_lora(self, name: str) -> bool:
        assert self.lora_stacks is not None, "enable_lora=False"
        return self.lora_stacks.remove(name)

    def lora_slot_of(self, name: str):
        return (self.lora_stacks.slot_of(name)
                if self.lora_stacks is not None else None)

    # ------------------------------------------------------------------
    # fused step function: forward + logits + sample, one dispatch

    def _build_step(self, t_bucket: int, greedy: bool, num_logprobs: int,
                    constrained: bool = False, decode_only: bool = False,
                    plp_k: int = 0, penalized: bool = False,
                    decode_pages: int = 0, mm: bool = False,
                    raw_n: int = 0):
        model = self.model
        mesh = self.mesh
        lay = self._layout(t_bucket, constrained, penalized)
        vocab = model.cfg.vocab_size
        mask_words = lay.mask_words
        param_specs = model.param_specs()
        n_layers = model.cfg.num_hidden_layers
        s = self.max_num_reqs
        spec_k = self.spec_k
        k1 = spec_k + 1
        lora_on = self.lora_stacks is not None
        attn_keys = ("token_ids", "positions", "slot_mapping", "kv_lens",
                     "page_indices", "cu_q_lens", "num_seqs",
                     "logits_indices")
        if getattr(model.cfg, "mrope_section", None):
            attn_keys = attn_keys + ("mrope_pos",)
        encdec = getattr(model, "is_encoder_decoder", False)
        if encdec:
            # whisper/mllama cross attention: per-row encoder states
            attn_keys = attn_keys + ("enc_states", "enc_lens",
                                     "enc_pos")
        spec_keys = attn_keys + (("plp_targets",) if plp_k else ())
        if mm:
            spec_keys = spec_keys + ("mm_mask", "mm_embeds")
        needs_cond = self.needs_hidden_cond
        export_hidden = self.export_hidden
        if needs_cond:
            spec_keys = spec_keys + ("hidden_cond",)
        input_specs = {k: P() for k in spec_keys}

        medusa = self.medusa_heads is not None
        mlp_spec = getattr(self, "_mlp_spec_mode", False)

        def fwd(params, kv_caches, rope, inputs, lora):
            # mm kwarg only exists on the llama-family signature; other
            # models never see an mm step variant
            mm_kw = ({"mm": (inputs["mm_mask"], inputs["mm_embeds"])}
                     if mm else {})
            hidden, new_caches = model(
                params, inputs["token_ids"], inputs["positions"],
                kv_caches, inputs, rope, lora=lora,
                decode_mode=decode_only,
                decode_pages=decode_pages or None, **mm_kw)
            sel = hidden[inputs["logits_indices"]]
            logits = model.compute_logits(params, sel)
            if plp_k:
                # prompt logprobs: log-softmax at EVERY flat position
                # (prefill steps only; reference computes these from the
                # full prefill logits as well)
                full = model.compute_logits(params, hidden)
                logp = jax.nn.log_softmax(full, axis=-1)
                pv, pi = jax.lax.top_k(logp, plp_k)
                tgt = inputs["plp_targets"]
                rowsix = jnp.arange(hidden.shape[0])
                tgt_lp = logp[rowsix, jnp.maximum(tgt, 0)]
                plp = (pi.astype(jnp.int32), pv, tgt_lp)
            else:
                plp = None
            exp = (hidden, sel) if export_hidden else None
            return logits, new_caches, plp, (sel if medusa else None), exp

        sharded = _shard_map(
            fwd, mesh,
            in_specs=(param_specs, self._layer_specs(n_layers), P(None, None),
                      input_specs,
                      self._lora_specs() if lora_on else None),
            out_specs=(P(), self._layer_specs(n_layers),
                       (P(), P(), P()) if plp_k else None,
                       P() if medusa else None,
                       (P(), P()) if export_hidden else None),
        )

        packed_keys = tuple(k for k in attn_keys
                            if k not in ("enc_states", "enc_lens",
                                         "enc_pos"))

        def step(params, kv_caches, rope, packed, step_key, lora_w,
                 prev_toks, *mm_arrays):
            prev_drafts = prev_gens = None
            if spec_k:  # spec x async device state rides first
                prev_drafts, prev_gens, *mm_arrays = mm_arrays
            hidden_cond = None
            if needs_cond:  # draft-model conditioning rides first
                hidden_cond, *mm_arrays = mm_arrays
            if medusa:  # head weights ride as the leading extra array
                medusa_w, *mm_arrays = mm_arrays
            raw_rows = None
            if raw_n:   # host-logits rows ride after the medusa weights
                raw_rows, *mm_arrays = mm_arrays
            f = lay.unpack(packed)
            inputs = {k: f[k] for k in packed_keys}
            if needs_cond:
                inputs["hidden_cond"] = hidden_cond
            if plp_k:
                inputs["plp_targets"] = f["plp_targets"]
            if encdec:
                (inputs["enc_states"], inputs["enc_lens"],
                 inputs["enc_pos"]) = mm_arrays[-3:]
                mm_arrays = mm_arrays[:-3]
            if mm:
                inputs["mm_mask"], inputs["mm_embeds"] = mm_arrays
            # async scheduling: tokens marked prev_rows >= 0 take their
            # value from the previous step's on-device samples (the host
            # never waited for them)
            pr = f["prev_rows"]
            inputs["token_ids"] = jnp.where(
                pr >= 0, prev_toks[jnp.maximum(pr, 0)],
                inputs["token_ids"])
            inputs["page_indices"] = f["page_indices"].reshape(
                s, self.max_blocks_per_req)
            if spec_k and os.environ.get("VPQ_SPEC_CORR", "1") != "0":
                # spec x async: resolve sentinel (-1) drafts from the
                # previous dispatch's on-device proposals, and correct
                # the host's OPTIMISTIC positions/kv_lens/slots by how
                # many tokens the previous dispatch actually emitted
                # (prev_assumed - prev_gens); sync dispatches pack
                # prev_assumed = 0 and real drafts, making this a no-op
                bs_ = self.block_size
                t_ = inputs["token_ids"].shape[0]
                rows_s = jnp.arange(s)
                pr_row = pr[jnp.minimum(rows_s * k1, t_ - 1)]
                pa = f["prev_assumed"]
                gens_prev = prev_gens[jnp.maximum(pr_row, 0)]
                corr = jnp.where((pa > 0) & (pr_row >= 0),
                                 jnp.clip(pa - gens_prev, 0, spec_k), 0)
                d2 = f["drafts"].reshape(s, spec_k)
                pd = prev_drafts[jnp.maximum(pr_row, 0)]
                d2 = jnp.where((d2 < 0) & (pr_row >= 0)[:, None], pd,
                               d2)
                f["drafts"] = d2.reshape(-1)
                # the resolved drafts are also the MODEL INPUTS of the
                # draft q rows (aligned layout: row r at flat r*k1)
                rows_fit = min(t_ // k1, s)
                if rows_fit:
                    tk = inputs["token_ids"]
                    t3 = tk[:rows_fit * k1].reshape(rows_fit, k1)
                    t3 = jnp.concatenate(
                        [t3[:, :1],
                         jnp.where(t3[:, 1:] == -1, d2[:rows_fit],
                                   t3[:, 1:])], axis=1)
                    inputs["token_ids"] = tk.at[:rows_fit * k1].set(
                        t3.reshape(-1))
                row_of = jnp.minimum(jnp.arange(t_) // k1, s - 1)
                cflat = corr[row_of]
                posc = jnp.maximum(inputs["positions"] - cflat, 0)
                inputs["positions"] = posc
                inputs["kv_lens"] = jnp.maximum(
                    inputs["kv_lens"] - corr, 0)
                slot_new = (inputs["page_indices"][row_of, posc // bs_]
                            * bs_ + posc % bs_)
                inputs["slot_mapping"] = jnp.where(
                    cflat > 0, slot_new, inputs["slot_mapping"])
            lora = None
            if lora_on:
                lora = dict(lora_w)
                lora["sorted_tok"] = f["lora_sorted_tok"]
                lora["group_sizes"] = f["lora_groups"]
            logits, new_caches, plp, sel, exp = sharded(
                params, kv_caches, rope, inputs, lora)
            toks, gens, lp, raw = self._sample_tail(
                f, logits, step_key, greedy=greedy,
                num_logprobs=num_logprobs, constrained=constrained,
                penalized=penalized, spec_k=spec_k,
                mask_words=mask_words, raw_rows=raw_rows)
            drafts = None
            if medusa:
                # condition each head on the hidden state at the LAST
                # emitted token of every row (position num_generated-1)
                from vllm_pq_tpu.spec_decode.medusa import medusa_drafts
                hsel = sel.reshape(s, k1, -1)
                pick = (jnp.clip(gens - 1, 0, k1 - 1)
                        if gens is not None
                        else jnp.zeros((s,), jnp.int32))
                h_last = hsel[jnp.arange(s), pick]
                if mlp_spec:
                    from vllm_pq_tpu.spec_decode.mlp_speculator import \
                        mlp_spec_drafts
                    scale_in, alpha = self._mlp_static
                    t3 = toks.reshape(s, k1) if spec_k else \
                        toks.reshape(s, 1)
                    tok_last = t3[jnp.arange(s),
                                  jnp.minimum(pick, t3.shape[1] - 1)]
                    drafts = mlp_spec_drafts(medusa_w, h_last, tok_last,
                                             scale_input=scale_in,
                                             alpha=alpha)
                else:
                    drafts = medusa_drafts(medusa_w, h_last)
            return toks, gens, lp, plp, drafts, raw, exp, new_caches

        return jax.jit(step, donate_argnums=(1,))

    def _sample_tail(self, f, logits, step_key, *, greedy: bool,
                     num_logprobs: int, constrained: bool,
                     penalized: bool, spec_k: int, mask_words: int,
                     raw_rows=None):
        """Constraint masking + sampling state + (spec-verify or)
        sampling + logprobs — traced inside a step jit; shared by the
        dense and pipeline-parallel step functions."""
        s = self.max_num_reqs
        k1 = spec_k + 1
        vocab = self.model.cfg.vocab_size
        if constrained:
            # allowed-token bitmask + additive logit bias (guided
            # decoding / allowed_token_ids / bad_words / logit_bias)
            bits = f["logits_mask"].astype(jnp.uint32).reshape(
                s, mask_words)
            mask = ((bits[:, :, None] >>
                     jnp.arange(32, dtype=jnp.uint32)) & 1)
            mask = mask.reshape(s, mask_words * 32)[:, :vocab] == 1
            bias = jnp.zeros((s, vocab), jnp.float32).at[
                f["bias_rows"], f["bias_toks"]].add(f["bias_vals"])
            l3 = logits.reshape(s, k1, vocab)
            l3 = jnp.where(mask[:, None, :], l3, -1e30)
            l3 = l3 + bias[:, None, :]
            logits = l3.reshape(s * k1, vocab) if spec_k else l3[:, 0]

        state = SamplingState(
            temperature=f["temperature"], top_k=f["top_k"],
            top_p=f["top_p"], min_p=f["min_p"],
            presence_penalty=f["presence_penalty"],
            frequency_penalty=f["frequency_penalty"],
            repetition_penalty=f["repetition_penalty"],
            seed=f["seed"].astype(jnp.uint32),
            has_seed=f["has_seed"].astype(bool),
            eos_token_id=f["eos_token_id"],
            min_tokens=f["min_tokens"], output_len=f["output_len"])

        counts = prompt_mask = None
        if penalized:
            # token-occurrence counts + prompt-token mask for
            # presence/frequency/repetition penalties (reference
            # v1 sampler penalty path)
            hist = f["token_hist"].reshape(s, self.max_model_len)
            npromt = f["num_prompt"][:, None]
            ntot = npromt + state.output_len[:, None]
            lpos = jnp.arange(self.max_model_len,
                              dtype=jnp.int32)[None, :]
            rows_b = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32)[:, None], hist.shape)
            is_out = (lpos >= npromt) & (lpos < ntot)
            is_prompt = lpos < npromt
            hs = jnp.maximum(hist, 0)
            counts = jnp.zeros((s, vocab), jnp.float32).at[
                rows_b, hs].add(is_out.astype(jnp.float32))
            prompt_mask = jnp.zeros((s, vocab), bool).at[
                rows_b, hs].max(is_prompt)

        if spec_k:
            from vllm_pq_tpu.layers.rejection import verify_and_sample
            l3 = logits.reshape(s, k1, -1)
            sc = self.config.speculative
            toks, gens = verify_and_sample(
                l3, f["drafts"].reshape(s, spec_k), f["num_drafts"],
                state, step_key, all_greedy=greedy, counts=counts,
                prompt_mask=prompt_mask,
                acceptance_method=sc.acceptance_method,
                posterior_threshold=sc.posterior_threshold,
                posterior_alpha=sc.posterior_alpha)
            lp_src, lp_tok = l3[:, 0], toks[:, 0]
        else:
            toks = sample(logits, state, step_key, all_greedy=greedy,
                          counts=counts, prompt_mask=prompt_mask)
            gens = None
            lp_src, lp_tok = logits, toks
        if num_logprobs > 0:
            lp = compute_logprobs(lp_src, lp_tok, num_logprobs)
        else:
            lp = None
        raw = None
        if raw_rows is not None:
            # full post-constraint logits for host-side per-request
            # logits processors (reference sampling_params
            # logits_processors semantics; the host re-samples and
            # overrides the in-graph token)
            base = (logits.reshape(s, k1, vocab)[:, 0] if spec_k
                    else logits)
            raw = base[raw_rows].astype(jnp.float32)
        return toks, gens, lp, raw

    def debug_forward(self, inputs: Dict[str, jax.Array]):
        """Non-donating forward returning logits — tests/debug only."""
        model = self.model
        n_layers = model.cfg.num_hidden_layers
        attn_keys = ("token_ids", "positions", "slot_mapping", "kv_lens",
                     "page_indices", "cu_q_lens", "num_seqs",
                     "logits_indices")

        def fwd(params, kv_caches, rope, inputs):
            hidden, new_caches = model(
                params, inputs["token_ids"], inputs["positions"],
                kv_caches, inputs, rope)
            sel = hidden[inputs["logits_indices"]]
            return model.compute_logits(params, sel)

        sharded = _shard_map(
            fwd, self.mesh,
            in_specs=(model.param_specs(), self._layer_specs(n_layers),
                      P(None, None), {k: P() for k in attn_keys}),
            out_specs=P(),
        )
        return jax.jit(sharded)(self.params, self.kv_caches,
                                self.rope_cache,
                                {k: inputs[k] for k in attn_keys})

    def _get_step(self, t_bucket: int, greedy: bool, num_logprobs: int,
                  constrained: bool = False, decode_only: bool = False,
                  plp_k: int = 0, penalized: bool = False,
                  decode_pages: int = 0, mm: bool = False,
                  raw_n: int = 0):
        key = (t_bucket, greedy, num_logprobs, constrained, decode_only,
               plp_k, penalized, decode_pages, mm, raw_n)
        fn = self._step_fns.get(key)
        if fn is None:
            logger.info("compiling step variant (t=%d greedy=%s lp=%d "
                        "constrained=%s decode=%s plp=%d pen=%s pages=%d "
                        "mm=%s raw=%d)", t_bucket, greedy, num_logprobs,
                        constrained, decode_only, plp_k, penalized,
                        decode_pages, mm, raw_n)
            fn = self._build_step(t_bucket, greedy, num_logprobs,
                                  constrained, decode_only, plp_k,
                                  penalized, decode_pages, mm, raw_n)
            self._step_fns[key] = fn
        return fn

    # ------------------------------------------------------------------
    # multi-step decode: N forward+sample iterations in one dispatch

    def _pq_dense_walk(self, node, spec_node, dtype):
        """Recursively map a params tree (and its PartitionSpec tree) to
        the window-dequant form: PQ linear dicts become dense
        ``{"weight": ...}``; everything else passes through."""
        from jax.sharding import PartitionSpec
        if isinstance(node, dict):
            if "codes" in node and "codebooks" in node:
                if node is spec_node or not isinstance(spec_node, dict):
                    spec_node = {}
                cs = spec_node.get("codes", PartitionSpec())
                axes = tuple(cs) + (None,) * (3 - len(tuple(cs)))
                if axes[2] is not None:      # column-parallel: out sharded
                    wspec = PartitionSpec(None, axes[2])
                elif axes[1] is not None:    # row-parallel: in sharded
                    wspec = PartitionSpec(axes[1], None)
                else:
                    wspec = PartitionSpec(None, None)
                return ("pq", wspec)
            out = {}
            for k, v in node.items():
                out[k] = self._pq_dense_walk(
                    v, spec_node.get(k) if isinstance(spec_node, dict)
                    else None, dtype)
            return out
        if isinstance(node, (list, tuple)):
            sub = (spec_node if isinstance(spec_node, (list, tuple))
                   and not isinstance(spec_node, PartitionSpec)
                   else [None] * len(node))
            return [self._pq_dense_walk(v, sp, dtype)
                    for v, sp in zip(node, sub)]
        return None  # leaf marker: pass through

    def _window_dequant_plan(self):
        """Returns (dense_specs, transform) when window dequant is
        enabled and the dense weights fit the budget, else None.

        Rationale (round-2 microbench): fused per-step PQ dequant is
        VPU-gather-bound (~20 ms/step for the TinyLlama stack) while a
        dense bf16 matmul streams the layers at the HBM roofline
        (~2.4 ms); paying the dequant ONCE per N-step window amortizes
        it to ~dequant/N. Mirrors the reference's dequant+F.linear
        crossover for batched shapes (aqlm.py:352-364)."""
        import vllm_pq_tpu.envs as envs
        mode = envs.VPQ_WINDOW_DEQUANT
        if mode == "0":
            return None
        from vllm_pq_tpu.quantization.methods import PQLinearMethod
        method = self.model.linear_method
        if not isinstance(method, PQLinearMethod):
            return None
        specs = self.model.param_specs()
        shape_tree = self._pq_dense_walk(self.params, specs, None)

        dense_bytes = [0]

        def count(node, marker):
            if isinstance(marker, tuple) and marker and marker[0] == "pq":
                m, j, o = node["codes"].shape
                g = node["codebooks"].shape[2]
                dense_bytes[0] += j * g * o * 2
                return
            if isinstance(marker, dict):
                for k in marker:
                    count(node[k], marker[k])
            elif isinstance(marker, list):
                for v, mk in zip(node, marker):
                    count(v, mk)

        count(self.params, shape_tree)
        budget = envs.VPQ_WINDOW_DEQUANT_MAX_GB * 2**30
        if mode != "1" and dense_bytes[0] > budget:
            logger.info("window dequant disabled: dense weights %.2f GiB "
                        "exceed budget %.1f GiB", dense_bytes[0] / 2**30,
                        budget / 2**30)
            return None
        kv_dtype = (jnp.bfloat16 if self.config.model.dtype == "bfloat16"
                    else jnp.float32)

        def build_specs(node, spec, marker):
            if isinstance(marker, tuple) and marker and marker[0] == "pq":
                return {"weight": marker[1]}
            if isinstance(marker, dict):
                return {k: build_specs(node[k],
                                       spec[k] if isinstance(spec, dict)
                                       else None, marker[k])
                        for k in marker}
            if isinstance(marker, list):
                subs = (spec if isinstance(spec, list)
                        else [None] * len(marker))
                return [build_specs(v, sp, mk)
                        for v, sp, mk in zip(node, subs, marker)]
            return spec

        dense_specs = build_specs(self.params, specs, shape_tree)

        def transform(params):
            def walk(node, marker):
                if isinstance(marker, tuple) and marker \
                        and marker[0] == "pq":
                    return {"weight": method.dequantize(node, kv_dtype)}
                if isinstance(marker, dict):
                    return {k: walk(node[k], marker[k]) for k in marker}
                if isinstance(marker, list):
                    return [walk(v, mk) for v, mk in zip(node, marker)]
                return node
            return walk(params, shape_tree)

        logger.info("window dequant enabled: %.2f GiB dense weights "
                    "per decode window", dense_bytes[0] / 2**30)
        return dense_specs, transform

    def _window_arena_enabled(self, n_pages: int) -> bool:
        """Decode windows use the dense-arena attention (see
        ops/window_attention.py) when the model has a standard 4D paged
        cache and the arena fits the budget."""
        import vllm_pq_tpu.envs as envs
        mode = envs.VPQ_WINDOW_ARENA
        if mode == "0" or self.cache_kinds:
            return False
        if getattr(self.model.cfg, "blocksparse", None) is not None:
            return False  # Phi-3-Small masks live in the paged paths
        kv_shape = self.model.kv_cache_shape(1, self.block_size, tp_size=1)
        if len(kv_shape) != 4:
            return False  # MLA latent caches: paged path
        kvh = kv_shape[2] // 2
        d = kv_shape[3]
        # int8 pools build int8 arenas (scales are 1/128 the data)
        itemsize = 1 if self.kv_quant else 2
        arena = (self.model.cfg.num_hidden_layers * self.max_num_reqs *
                 n_pages * self.block_size * kvh * d * itemsize * 2)
        budget = envs.VPQ_WINDOW_ARENA_MAX_GB * 2**30
        if mode != "1" and arena > budget:
            logger.info("window arena disabled: %.2f GiB exceeds budget",
                        arena / 2**30)
            return False
        return True

    def _build_multistep(self, n_steps: int, greedy: bool, t_bucket: int,
                         ctx_pages: int, shared_pages: int = 0):
        """N decode iterations in one dispatch. Token/position/slot
        metadata for iterations > 0 is DERIVED ON DEVICE from the paged
        layout (pos+1; slot from the block table), so the host transfers
        one packed buffer and fetches one [N, S] token matrix per N
        generated tokens. Composes with async scheduling: iteration 0's
        input tokens may be -1 placeholders resolved on device from the
        previous dispatch's samples (prev_rows routing, like
        _build_step).

        When the window arena is enabled, the paged caches are READ
        ONLY: the live KV prefix is gathered into immutable dense
        arenas, new K/V accumulates in per-layer rings, and a separate
        fold dispatch (``_get_fold``) scatters the rings back — the
        structure that avoids XLA's pallas-alias protective copies
        (ops/window_attention.py)."""
        from vllm_pq_tpu.ops.window_attention import (WindowCache,
                                                      build_window_cache)
        model = self.model
        mesh = self.mesh
        s = self.max_num_reqs
        lay = self._layout(t_bucket)
        param_specs = model.param_specs()
        n_layers = model.cfg.num_hidden_layers
        bs = self.block_size
        attn_keys = ("token_ids", "positions", "slot_mapping", "kv_lens",
                     "page_indices", "cu_q_lens", "num_seqs",
                     "logits_indices")
        use_mrope = bool(getattr(model.cfg, "mrope_section", None))
        if use_mrope:
            attn_keys = attn_keys + ("mrope_pos",)
        input_specs = {k: P() for k in attn_keys}

        plan = self._window_dequant_plan()
        fwd_param_specs = plan[0] if plan is not None else param_specs
        use_arena = self._window_arena_enabled(ctx_pages)

        if use_arena:
            from jax.sharding import PartitionSpec as PS
            kv_axes = tuple(self.kv_spec) + (None,) * (
                4 - len(tuple(self.kv_spec)))
            head_ax = kv_axes[2]
            wc_spec = WindowCache(
                aK=PS(None, head_ax, None, None),
                aV=PS(None, head_ax, None, None),
                aKs=PS(None, head_ax, None),
                aVs=PS(None, head_ax, None),
                sK=PS(None, head_ax, None),
                sV=PS(None, head_ax, None),
                sKs=PS(None, head_ax),
                sVs=PS(None, head_ax),
                ringK=PS(None, None, head_ax, None),
                ringV=PS(None, None, head_ax, None),
                step=PS())
            cache_specs = [wc_spec] * n_layers

            def build_all(kv_caches, page_indices):
                return [build_window_cache(
                    c, page_indices, ctx_pages - shared_pages,
                    n_steps * k1, shared_pages=shared_pages)
                    for c in kv_caches]

            build_sharded = _shard_map(
                build_all, mesh,
                in_specs=(self._layer_specs(n_layers), P()),
                out_specs=cache_specs)
        else:
            cache_specs = self._layer_specs(n_layers)
            build_sharded = None

        # speculative decode windows (VERDICT r4 #5 / reference
        # v1/core/sched/scheduler.py spec-token scheduling): in-graph
        # proposers (medusa / mlp_speculator) draft K tokens per
        # iteration, the target verifies all K+1 in ONE forward, and
        # the window advances 1..K+1 positions per iteration. Arena
        # windows only (the multi-query masks live in
        # window_attention_spec); mrope/alibi models keep plain windows.
        spec_k = (self.spec_k
                  if (self.spec_k and self.medusa_heads is not None
                      and use_arena and not use_mrope
                      and not getattr(model.cfg, "alibi", False))
                  else 0)
        k1 = spec_k + 1

        def fwd(params, kv_caches, rope, inputs):
            hidden, new_caches = model(
                params, inputs["token_ids"], inputs["positions"],
                kv_caches, inputs, rope, decode_mode=True,
                decode_pages=ctx_pages)
            sel = hidden[inputs["logits_indices"]]
            logits = model.compute_logits(params, sel)
            if use_arena:
                # return ONLY the per-iteration state (rings + step):
                # passing the immutable arenas through the shard_map
                # output forced XLA to copy ~3 GiB per iteration
                # (profiler-verified, 3.4 ms/iter)
                new_caches = [(wc.ringK, wc.ringV, wc.step)
                              for wc in new_caches]
            return logits, new_caches

        if use_arena:
            out_cache_specs = [(wc_spec.ringK, wc_spec.ringV,
                                wc_spec.step)] * n_layers
        else:
            out_cache_specs = cache_specs
        sharded = _shard_map(
            fwd, mesh,
            in_specs=(fwd_param_specs, cache_specs, P(None, None),
                      input_specs),
            out_specs=(P(), out_cache_specs),
        )

        dequant = None
        if plan is not None:
            dense_specs, transform = plan
            dequant = _shard_map(transform, mesh,
                                 in_specs=(param_specs,),
                                 out_specs=dense_specs)

        def spec_loop(params, kv_caches, f, page_indices, active,
                      base_state, last0, pos0, rope, step_key,
                      medusa_w, prev_drafts):
            """Speculative window: each iteration verifies K drafts + 1
            token in one multi-query forward, then proposes the next K
            in-graph (medusa / mlp_speculator heads). Per-row advance is
            1..K+1 tokens — ring entry positions and validity are
            carried so stale rejected entries never score
            (window_attention_spec) and the fold scatters only live
            entries (device-computed slots, _get_fold_spec)."""
            from vllm_pq_tpu.layers.rejection import verify_and_sample
            t_spec = s * k1
            n_ring = n_steps * k1
            rows = jnp.arange(s)
            base_lens = jnp.where(active, pos0, 0)
            sc_cfg = self.config.speculative
            mlp_spec = getattr(self, "_mlp_spec_mode", False)

            def sbody(carry, i):
                (kv_caches, last, drafts, pos, out_len, ring_pos,
                 ring_valid) = carry
                tok3 = jnp.concatenate(
                    [last[:, None], jnp.maximum(drafts, 0)], axis=1)
                qpos = (pos[:, None]
                        + jnp.arange(k1, dtype=jnp.int32)[None])
                qpos = jnp.minimum(qpos, self.max_model_len - 1)
                ring_pos = jax.lax.dynamic_update_slice(
                    ring_pos, qpos, (0, i * k1))
                ring_valid = jax.lax.dynamic_update_slice(
                    ring_valid,
                    jnp.broadcast_to(active[:, None], (s, k1)),
                    (0, i * k1))
                inputs = {
                    "token_ids": tok3.reshape(-1),
                    "positions": qpos.reshape(-1),
                    "slot_mapping": jnp.zeros(t_spec, jnp.int32),
                    "kv_lens": jnp.where(active, qpos[:, -1] + 1, 0),
                    "page_indices": page_indices,
                    "cu_q_lens": jnp.arange(s + 1, dtype=jnp.int32) * k1,
                    "num_seqs": f["num_seqs"],
                    "logits_indices": jnp.arange(t_spec,
                                                 dtype=jnp.int32),
                    "spec_window": {
                        "q_pos": qpos, "ring_pos": ring_pos,
                        "ring_valid": ring_valid,
                        "base_lens": base_lens},
                }
                hidden, kv_caches = model(
                    params, inputs["token_ids"], inputs["positions"],
                    kv_caches, inputs, rope, decode_mode=True,
                    decode_pages=ctx_pages)
                logits = model.compute_logits(params, hidden)
                l3 = logits.reshape(s, k1, -1).astype(jnp.float32)
                state = base_state._replace(output_len=out_len)
                toks, gens = verify_and_sample(
                    l3, drafts,
                    jnp.where(drafts[:, 0] >= 0, spec_k, 0), state,
                    jax.random.fold_in(step_key, i), all_greedy=greedy,
                    acceptance_method=sc_cfg.acceptance_method,
                    posterior_threshold=sc_cfg.posterior_threshold,
                    posterior_alpha=sc_cfg.posterior_alpha)
                gens = jnp.where(active, gens, 1)
                # entries past the accepted prefix are stale from now on
                newv = ((jnp.arange(k1, dtype=jnp.int32)[None]
                         < gens[:, None]) & active[:, None])
                ring_valid = jax.lax.dynamic_update_slice(
                    ring_valid, newv, (0, i * k1))
                pick = jnp.clip(gens - 1, 0, k1 - 1)
                last = toks[rows, pick]
                h_last = hidden.reshape(s, k1, -1)[rows, pick]
                if mlp_spec:
                    from vllm_pq_tpu.spec_decode.mlp_speculator import \
                        mlp_spec_drafts
                    scale_in, alpha = self._mlp_static
                    drafts_next = mlp_spec_drafts(
                        medusa_w, h_last, last, scale_input=scale_in,
                        alpha=alpha)
                else:
                    from vllm_pq_tpu.spec_decode.medusa import \
                        medusa_drafts
                    drafts_next = medusa_drafts(medusa_w, h_last)
                drafts_next = drafts_next[:, :spec_k]
                pos = jnp.where(active, pos + gens, pos)
                out_len = out_len + jnp.where(active, gens, 0)
                return ((kv_caches, last, drafts_next, pos, out_len,
                         ring_pos, ring_valid), (toks, gens))

            carry = (kv_caches, last0, prev_drafts, pos0,
                     f["output_len"], jnp.zeros((s, n_ring), jnp.int32),
                     jnp.zeros((s, n_ring), bool))
            toks_list, gens_list = [], []
            for i in range(n_steps):
                carry, (toks, gens) = sbody(carry, i)
                toks_list.append(toks)
                gens_list.append(gens)
            (kv_caches, last, drafts, _, _, ring_pos,
             ring_valid) = carry
            toks_all = jnp.stack(toks_list)   # [N, S, K+1]
            gens_all = jnp.stack(gens_list)   # [N, S]
            ringsK = jnp.stack([wc.ringK for wc in kv_caches])
            ringsV = jnp.stack([wc.ringV for wc in kv_caches])
            return (toks_all, gens_all, last, drafts,
                    (ringsK, ringsV, ring_pos, ring_valid))

        def window_core(params, kv_caches, rope, packed, step_key,
                        prev_toks, medusa_w=None, prev_drafts=None,
                        *, per_shard: bool):
            """The N-iteration decode window. ``per_shard=True`` runs
            the WHOLE loop inside one shard_map (arena mode): rings and
            scores never cross a shard_map boundary, which the profiler
            showed cost ~3 ms/step in materialization copies (8k ring
            copies per 3 windows) when each iteration was its own
            shard_map call."""
            f = lay.unpack(packed)
            page_indices = f["page_indices"].reshape(
                s, self.max_blocks_per_req)
            active = f["kv_lens"] > 0  # padded rows have kv_len 0
            base_state = SamplingState(
                temperature=f["temperature"], top_k=f["top_k"],
                top_p=f["top_p"], min_p=f["min_p"],
                presence_penalty=f["presence_penalty"],
                frequency_penalty=f["frequency_penalty"],
                repetition_penalty=f["repetition_penalty"],
                seed=f["seed"].astype(jnp.uint32),
                has_seed=f["has_seed"].astype(bool),
                eos_token_id=f["eos_token_id"],
                min_tokens=f["min_tokens"], output_len=f["output_len"])

            # async scheduling: -1 placeholder inputs take their value
            # from the previous dispatch's on-device samples
            pr = f["prev_rows"]
            tok_in = jnp.where(pr >= 0, prev_toks[jnp.maximum(pr, 0)],
                               f["token_ids"])
            m0 = min(s, t_bucket)
            last0 = jnp.zeros(s, jnp.int32).at[:m0].set(tok_in[:m0])
            pos0 = jnp.maximum(f["kv_lens"] - 1, 0)

            m = min(s, t_bucket)  # rows in flight never exceed the bucket

            if spec_k:
                builder = (build_all if per_shard else build_sharded)
                kv_caches = builder(kv_caches,
                                    f["page_indices"].reshape(
                                        s, self.max_blocks_per_req))
                return spec_loop(params, kv_caches, f, page_indices,
                                 active, base_state, last0, pos0,
                                 rope, step_key, medusa_w, prev_drafts)

            def body(carry, i):
                kv_caches, last, pos, out_len = carry
                slot = (jnp.take_along_axis(
                    page_indices, (pos // bs)[:, None], axis=1)[:, 0] * bs
                    + pos % bs)
                slot = jnp.where(active, slot, 0)
                tok_flat = jnp.zeros(t_bucket, jnp.int32).at[:m].set(
                    last[:m])
                pos_flat = jnp.zeros(t_bucket, jnp.int32).at[:m].set(
                    jnp.where(active, pos, 0)[:m])
                slot_flat = jnp.zeros(t_bucket, jnp.int32).at[:m].set(
                    slot[:m])
                inputs = {
                    "token_ids": tok_flat,
                    "positions": pos_flat,
                    "slot_mapping": slot_flat,
                    "kv_lens": jnp.where(active, pos + 1, 0),
                    "page_indices": page_indices,
                    "cu_q_lens": f["cu_q_lens"],
                    "num_seqs": f["num_seqs"],
                    "logits_indices": f["logits_indices"],
                }
                if use_mrope:
                    # decode rows: t == h == w == pos + per-row delta
                    eff = jnp.where(active, pos + f["rope_delta"], 0)
                    ef = jnp.zeros(t_bucket, jnp.int32).at[:m].set(
                        eff[:m])
                    inputs["mrope_pos"] = jnp.tile(ef, 3)
                if per_shard:
                    hidden, kv_caches = model(
                        params, inputs["token_ids"], inputs["positions"],
                        kv_caches, inputs, rope, decode_mode=True,
                        decode_pages=ctx_pages)
                    sel = hidden[inputs["logits_indices"]]
                    logits = model.compute_logits(params, sel)
                else:
                    logits, kv_caches = sharded(params, kv_caches, rope,
                                                inputs)
                state = base_state._replace(output_len=out_len)
                toks = sample(logits, state, jax.random.fold_in(step_key, i),
                              all_greedy=greedy)
                return (kv_caches, toks, pos + 1, out_len + 1), toks

            if use_arena:
                builder = (build_all if per_shard else build_sharded)
                kv_caches = builder(kv_caches,
                                    f["page_indices"].reshape(
                                        s, self.max_blocks_per_req))

            # Unrolled rather than lax.scan: the graph is identical per
            # iteration, XLA can overlap across iterations, and the
            # current TPU runtime miscompiles the pallas-in-scan carry
            # (observed INTERNAL backend errors).
            carry = (kv_caches, last0, pos0, f["output_len"])
            toks_list = []
            for i in range(n_steps):
                carry, toks = body(carry, i)
                toks_list.append(toks)
            kv_caches = carry[0]
            toks_all = jnp.stack(toks_list)  # [N, S]
            if use_arena:
                # rings only: the paged fold runs in its own dispatch
                ringsK = jnp.stack([wc.ringK for wc in kv_caches])
                ringsV = jnp.stack([wc.ringV for wc in kv_caches])
                return toks_all, (ringsK, ringsV)
            return toks_all, kv_caches

        if use_arena:
            ring_stack_spec = PS(None, None, None, head_ax, None)
            # inputs are the PAGED caches: the arena build happens
            # inside this same program
            if spec_k:
                whole = _shard_map(
                    functools.partial(window_core, per_shard=True),
                    mesh,
                    in_specs=(fwd_param_specs,
                              self._layer_specs(n_layers),
                              P(None, None), P(), P(), P(), P(), P()),
                    out_specs=(P(), P(), P(), P(),
                               (ring_stack_spec, ring_stack_spec,
                                P(), P())))

                def run_spec(params, kv_caches, rope, packed, step_key,
                             prev_toks, medusa_w, prev_drafts):
                    if dequant is not None:
                        params = dequant(params)
                    return whole(params, kv_caches, rope, packed,
                                 step_key, prev_toks, medusa_w,
                                 prev_drafts)
                return jax.jit(run_spec), True, spec_k

            whole = _shard_map(
                functools.partial(window_core, per_shard=True), mesh,
                in_specs=(fwd_param_specs, self._layer_specs(n_layers),
                          P(None, None), P(), P(), P()),
                out_specs=(P(), (ring_stack_spec, ring_stack_spec)))

            def run(params, kv_caches, rope, packed, step_key,
                    prev_toks):
                if dequant is not None:
                    params = dequant(params)
                return whole(params, kv_caches, rope, packed, step_key,
                             prev_toks)
            return jax.jit(run), True, 0

        def run(params, kv_caches, rope, packed, step_key, prev_toks):
            if dequant is not None:
                params = dequant(params)
            return window_core(params, kv_caches, rope, packed, step_key,
                               prev_toks, per_shard=False)
        return jax.jit(run, donate_argnums=(1,)), False, 0

    def _get_fold(self, n_steps: int):
        """Fold dispatch: scatter a window's rings into the paged
        caches (the ONLY writer of the caches in its graph — donation
        aliases cleanly, no protective copies)."""
        key = ("fold", n_steps)
        fn = self._step_fns.get(key)
        if fn is not None:
            return fn
        from vllm_pq_tpu.ops.attention import write_kv_cache
        n_layers = self.model.cfg.num_hidden_layers
        mesh = self.mesh
        kv_axes = tuple(self.kv_spec) + (None,) * (
            4 - len(tuple(self.kv_spec)))
        ring_spec = P(None, None, None, kv_axes[2], None)

        def fold(kv_caches, ringsK, ringsV, slots):
            out = []
            for li, c in enumerate(kv_caches):
                n, s2 = ringsK.shape[1], ringsK.shape[2]
                k = ringsK[li].reshape(n * s2, *ringsK.shape[3:])
                v = ringsV[li].reshape(n * s2, *ringsV.shape[3:])
                out.append(write_kv_cache(c, k, v, slots))
            return out

        sharded = _shard_map(
            fold, mesh,
            in_specs=(self._layer_specs(n_layers), ring_spec, ring_spec,
                      P()),
            out_specs=self._layer_specs(n_layers))
        # Donating the pool into the fold while the WINDOW execution
        # still holds a read on it makes PJRT protectively copy every
        # layer's cache at ~450 us each (20-38 ms/window, r4 profile).
        # Default: no donation — the in-program functional scatter
        # copies the pool ONCE at HBM stream speed (~2.3 ms/window),
        # an order of magnitude cheaper than the runtime's conservative
        # copies. VPQ_FOLD_DONATE=1 restores donation for A/B.
        if os.environ.get("VPQ_FOLD_DONATE", "0") == "1":
            fn = jax.jit(sharded, donate_argnums=(0,))
        else:
            fn = jax.jit(sharded)
        self._step_fns[key] = fn
        return fn

    def _get_fold_spec(self):
        """Speculative-window fold: ring entry positions are
        data-dependent (each row advanced by its accepted count), so
        the slot mapping is computed IN-GRAPH from the carried entry
        positions + the block table; stale (rejected) entries scatter
        to the null page 0."""
        key = "fold_spec"
        fn = self._step_fns.get(key)
        if fn is not None:
            return fn
        from vllm_pq_tpu.ops.attention import write_kv_cache
        n_layers = self.model.cfg.num_hidden_layers
        mesh = self.mesh
        bs = self.block_size
        kv_axes = tuple(self.kv_spec) + (None,) * (
            4 - len(tuple(self.kv_spec)))
        ring_spec = P(None, None, None, kv_axes[2], None)

        def fold(kv_caches, ringsK, ringsV, ring_pos, ring_valid,
                 page_indices):
            pos_c = jnp.minimum(ring_pos, self.max_model_len - 1)
            blk = jnp.take_along_axis(page_indices, pos_c // bs, axis=1)
            slots = jnp.where(ring_valid, blk * bs + pos_c % bs, 0)
            # ring layout is entry-major [n, s]; match it
            slots_flat = slots.T.reshape(-1)
            out = []
            for li, c in enumerate(kv_caches):
                n, s2 = ringsK.shape[1], ringsK.shape[2]
                k = ringsK[li].reshape(n * s2, *ringsK.shape[3:])
                v = ringsV[li].reshape(n * s2, *ringsV.shape[3:])
                out.append(write_kv_cache(c, k, v, slots_flat))
            return out

        sharded = _shard_map(
            fold, mesh,
            in_specs=(self._layer_specs(n_layers), ring_spec, ring_spec,
                      P(), P(), P()),
            out_specs=self._layer_specs(n_layers))
        # same donation policy as _get_fold: donating under an
        # in-flight window read makes PJRT protectively copy the pool
        if os.environ.get("VPQ_FOLD_DONATE", "0") == "1":
            fn = jax.jit(sharded, donate_argnums=(0,))
        else:
            fn = jax.jit(sharded)
        self._step_fns[key] = fn
        return fn

    def _get_multistep(self, n_steps: int, greedy: bool, t_bucket: int,
                       ctx_pages: int, shared_pages: int = 0):
        key = ("ms", n_steps, greedy, t_bucket, ctx_pages, shared_pages)
        fn = self._step_fns.get(key)
        if fn is None:
            fn = self._build_multistep(n_steps, greedy, t_bucket,
                                       ctx_pages, shared_pages)
            self._step_fns[key] = fn
        return fn

    def _shared_prefix_pages(self, row_mask: np.ndarray) -> int:
        """Pow2-floored count of leading block-table columns identical
        across all active rows (cascade detection; role of reference
        num_common_prefix_blocks, v1/core/scheduler_output.py:89)."""
        n = self.input_batch.num_reqs
        act = np.nonzero(row_mask[:n])[0]
        if act.size < 2:
            return 0
        bt = self.input_batch.block_table[act][:, :self.max_blocks_per_req]
        eq = np.all(bt == bt[0:1], axis=0) & (bt[0] != 0)
        run = 0
        for v in eq:
            if not v:
                break
            run += 1
        if run < 2:
            return 0
        b = 2
        while b * 2 <= run:
            b *= 2
        return b

    # ------------------------------------------------------------------
    # per-step host logic

    def update_states(self, so: SchedulerOutput,
                      request_meta: Optional[Dict[str, Any]] = None) -> None:
        """Apply the scheduler's diff protocol to the persistent batch.
        ``request_meta`` maps req_id -> (eos_token_id, ignore_eos) for new
        requests (sent once by the engine)."""
        ib = self.input_batch
        for rid in so.finished_req_ids:
            ib.remove_request(rid)
            self._mrope_pos3.pop(rid, None)
            self._mrope_delta.pop(rid, None)
            if self._enc_np.pop(rid, None) is not None:
                self._enc_pos.pop(rid, None)
                self._enc_dirty = True
            if rid in self._mm_spans:
                spans = self._mm_spans.pop(rid)
                for idx in range(len(spans)):
                    self._mm_cache.pop((rid, idx), None)
        moves = ib.condense()
        if moves and self.kv_caches and (getattr(self, "is_ssm", False)
                                         or self.cache_kinds):
            # SSM recurrent states are ROW-indexed: mirror the
            # persistent batch's compaction moves on device (hybrid
            # models: only the ssm-kind layers)
            srcs = np.asarray([m[0] for m in moves], np.int32)
            dsts = np.asarray([m[1] for m in moves], np.int32)
            self.kv_caches = [
                c.at[dsts].set(c[srcs])
                if (self.is_ssm or self.cache_kinds[li] == "ssm") else c
                for li, c in enumerate(self.kv_caches)]
        if getattr(self.model, "is_encoder_decoder", False) and \
                (so.finished_req_ids or so.scheduled_new_reqs):
            self._enc_dirty = True  # row layout changed
        mrope = getattr(self.model.cfg, "mrope_section", None)
        for nr in so.scheduled_new_reqs:
            ib.add_request(nr)
            if request_meta and nr.req_id in request_meta:
                eos, ignore = request_meta[nr.req_id]
                ib.set_eos(nr.req_id, eos, ignore)
            if getattr(nr, "mm_inputs", None) and \
                    getattr(self.model, "is_encoder_decoder", False):
                # enc-dec models (whisper audio, mllama vision): run
                # the encoder once, cache its states per request
                mi = nr.mm_inputs[0]
                self._enc_np[nr.req_id] = self._encode_encdec(
                    mi.pixel_values)
                self._enc_pos[nr.req_id] = int(mi.offset)
                self._enc_dirty = True
            elif getattr(nr, "mm_inputs", None):
                self._mm_spans[nr.req_id] = nr.mm_inputs
                if mrope:
                    from vllm_pq_tpu.models.qwen2_vl import \
                        mrope_positions_for_prompt
                    pos3, delta = mrope_positions_for_prompt(
                        nr.prompt_token_ids, nr.mm_inputs,
                        self.model.image_token_index)
                    self._mrope_pos3[nr.req_id] = pos3
                    self._mrope_delta[nr.req_id] = delta
        for cr in so.scheduled_cached_reqs:
            ib.update_cached(cr)
        for rid, idx in getattr(so, "free_encoder_input_ids", ()):
            self._mm_cache.pop((rid, idx), None)

    # ------------------------------------------------------------------
    # multimodal encoder execution (role of reference
    # gpu_model_runner._execute_encoder + encoder cache)

    def _run_encoders(self, so: SchedulerOutput) -> None:
        for rid, idxs in getattr(so, "scheduled_encoder_inputs",
                                 {}).items():
            spans = self._mm_spans.get(rid)
            if not spans:
                continue
            for idx in idxs:
                if (rid, idx) in self._mm_cache:
                    continue
                mi = spans[idx]
                if getattr(mi, "grid_thw", None) is not None:
                    # Qwen2-VL: pre-patched pixels + grid (static per
                    # compiled variant)
                    fn = self._get_encode_images_fn(
                        mi.pixel_values.shape, mi.grid_thw)
                    feats = fn(self.params["vision"],
                               jnp.asarray(mi.pixel_values))
                    self._mm_cache[(rid, idx)] = np.asarray(
                        jax.device_get(feats)).astype(np.float32)
                else:
                    fn = self._get_encode_images_fn(mi.pixel_values.shape)
                    feats = fn(self.params["vision"],
                               jnp.asarray(mi.pixel_values[None]))
                    self._mm_cache[(rid, idx)] = np.asarray(
                        jax.device_get(feats))[0].astype(np.float32)

    def _get_encode_images_fn(self, pixel_shape, grid=None):
        key = ("mm_enc", pixel_shape, grid)
        fn = self._step_fns.get(key)
        if fn is None:
            if grid is not None:
                import functools
                fn = jax.jit(functools.partial(self.model.encode_images,
                                               grid_thw=grid))
            else:
                fn = jax.jit(self.model.encode_images)
            self._step_fns[key] = fn
        return fn

    def _mm_pending(self, so: SchedulerOutput) -> bool:
        """True when any scheduled token this step is an image
        placeholder needing an embedding splice."""
        if not self._mm_spans:
            return False
        ib = self.input_batch
        for rid, nt in so.num_scheduled_tokens.items():
            spans = self._mm_spans.get(rid)
            if not spans:
                continue
            row = ib.req_id_to_index.get(rid)
            if row is None:
                continue
            start = int(ib.num_computed_tokens[row])
            for mi in spans:
                if mi.offset + mi.length > start and \
                        mi.offset < start + nt:
                    return True
        return False

    def _pack_mm_rows(self, rid: str, start: int, end: int, off: int,
                      t_bucket: int):
        """Fill mm mask/embeds rows for flat positions [off, off+end-
        start) covering prompt positions [start, end)."""
        spans = self._mm_spans.get(rid)
        if not spans:
            return
        for idx, mi in enumerate(spans):
            s0, e0 = mi.offset, mi.offset + mi.length
            lo, hi = max(s0, start), min(e0, end)
            if lo >= hi:
                continue
            feats = self._mm_cache.get((rid, idx))
            if feats is None:
                raise RuntimeError(
                    f"encoder output missing for {rid}[{idx}] "
                    f"(span {s0}:{e0}, step range {start}:{end})")
            if self._mm_step is None:
                h = self.model.cfg.hidden_size
                self._mm_step = (np.zeros(t_bucket, np.int32),
                                 np.zeros((t_bucket, h), np.float32))
            mask, embeds = self._mm_step
            fo = off + lo - start
            mask[fo:fo + hi - lo] = 1
            embeds[fo:fo + hi - lo] = feats[lo - s0:hi - s0]

    def _encode_encdec(self, arr) -> np.ndarray:
        if isinstance(arr, tuple):
            # multimodal encoder prompt (Florence-2): (encoder token
            # ids, pixel values) — the encoder consumes image features
            # + text embeddings in one sequence
            ids, px = arr
            key = ("encdec_enc_mm", ids.shape, px.shape)
            fn = self._step_fns.get(key)
            if fn is None:
                fn = jax.jit(self.model.encode_encoder_input)
                self._step_fns[key] = fn
            return np.asarray(jax.device_get(
                fn(self.params, jnp.asarray(ids),
                   jnp.asarray(px)))).astype(np.float32)
        key = ("encdec_enc", arr.shape)
        fn = self._step_fns.get(key)
        if fn is None:
            fn = jax.jit(self.model.encode_encoder_input)
            self._step_fns[key] = fn
        return np.asarray(jax.device_get(
            fn(self.params, jnp.asarray(arr)))).astype(np.float32)

    def _encdec_buffers(self):
        """(enc_states [S, L_enc, d], enc_lens [S], enc_pos [S]) device
        arrays, rebuilt when batch membership changed (cross-attention
        KV role, reference whisper/mllama enc-dec runners); enc_pos is
        each row's encoder-input prompt offset (mllama cross-attention
        visibility)."""
        if self._enc_dirty or self._enc_dev is None:
            ib = self.input_batch
            s = self.max_num_reqs
            lens = np.zeros(s, np.int32)
            pos = np.zeros(s, np.int32)
            max_len = 8
            for r in range(ib.num_reqs):
                e = self._enc_np.get(ib.req_ids[r])
                if e is not None:
                    max_len = max(max_len, e.shape[0])
            # pow2 bucket keeps the compiled variant count bounded
            b = 8
            while b < max_len:
                b *= 2
            d = self.model.cfg.d_model
            states = np.zeros((s, b, d), np.float32)
            for r in range(ib.num_reqs):
                e = self._enc_np.get(ib.req_ids[r])
                if e is not None:
                    states[r, :e.shape[0]] = e
                    lens[r] = e.shape[0]
                    pos[r] = self._enc_pos.get(ib.req_ids[r], 0)
            dt = (jnp.bfloat16 if self.config.model.dtype == "bfloat16"
                  else jnp.float32)
            self._enc_dev = (jnp.asarray(states, dt), jnp.asarray(lens),
                             jnp.asarray(pos))
            self._enc_dirty = False
        return self._enc_dev

    def _pick_bucket(self, t: int) -> int:
        for b in self.token_buckets:
            if t <= b:
                return b
        raise ValueError(f"{t} tokens exceed the largest bucket "
                         f"{self.token_buckets[-1]}")

    def prepare_inputs(self, so: SchedulerOutput, one_per_row: bool = False):
        """Flatten the scheduled work into the packed transfer buffer.

        ``one_per_row``: multi-step mode — pack only the first (last real)
        token of each scheduled row; the scan derives the rest on device.
        """
        ib = self.input_batch
        s = self.max_num_reqs
        if one_per_row:
            total = sum(1 for v in so.num_scheduled_tokens.values() if v)
        else:
            total = so.total_num_scheduled_tokens
        # row-aligned decode packing (q row i == seq row i) covers pure
        # decode EVEN WITH GAPS (rows parked by async scheduling or
        # already finished): unscheduled rows become kv_len-0 masked
        # rows, which keeps the step on the compiled decode variant
        # instead of recompiling general variants at the batch tail
        n = ib.num_reqs
        self._mm_step = None
        fast = bool(n and not so.scheduled_spec_decode_tokens
                    and (one_per_row
                         or all(v == 1
                                for v in so.num_scheduled_tokens.values()))
                    and not self._mm_pending(so))
        k1 = self.spec_k + 1
        dr_map = so.scheduled_spec_decode_tokens
        fast_spec = bool(
            n and self.spec_k and dr_map and not one_per_row
            and not self._mm_pending(so)
            and os.environ.get("VPQ_SPEC_ALIGNED", "1") != "0"
            and all(v in (1, k1)
                    for v in so.num_scheduled_tokens.values())
            and all(len(d) == self.spec_k for d in dr_map.values())
            # uniform-span kv_lens must stay in bounds for every row
            and int(ib.num_computed_tokens[:n].max(initial=0)) + k1
            <= self.max_model_len)
        if fast_spec:
            total = max(total, n * k1)  # row r at flat slots [r*k1, ..)
        sched_mask = None
        if fast:
            sched_mask = np.fromiter(
                (ib.req_ids[r] in so.num_scheduled_tokens
                 for r in range(n)), bool, count=n)
            if not sched_mask.all():
                # row-aligned packing with kv_len-0 gaps covers both the
                # single-step decode variant and the multi-step scan
                # (async scheduling can park rows at their caps)
                total = max(total, n)  # row i lives at flat slot i
        t_bucket = self._pick_bucket(max(total, 1))
        constrained = bool(so.guided_masks or so.logit_bias)
        penalized = not ib.no_penalties
        lay = self._layout(t_bucket, constrained, penalized)
        buf = self._packed_bufs[(t_bucket, constrained, penalized)]
        buf[:] = 0

        tok = lay.view(buf, "token_ids")
        pos = lay.view(buf, "positions")
        slots = lay.view(buf, "slot_mapping")
        kv_lens = lay.view(buf, "kv_lens")
        cu = lay.view(buf, "cu_q_lens")
        logits_idx = lay.view(buf, "logits_indices")
        k1 = self.spec_k + 1
        drafts_v = lay.view(buf, "drafts").reshape(s, max(self.spec_k, 1)) \
            if self.spec_k else None
        num_drafts = lay.view(buf, "num_drafts")
        row_req_ids: List[Optional[str]] = [None] * s
        lora_on = self.lora_stacks is not None
        tok_slot = np.zeros(t_bucket, np.int32) if lora_on else None
        prev_rows = lay.view(buf, "prev_rows")
        prev_rows[:] = -1
        prev_row_of = getattr(self, "_prev_row_of", None)

        # vectorized fast path: pure decode (1 token per active row, no
        # drafts) — the per-row python loop costs ~5ms at batch 256
        if fast:
            rows = np.arange(n)
            m = sched_mask
            start = ib.num_computed_tokens[:n]
            # clamp for indexing only: unscheduled rows may sit at the
            # model-length cap and their values are masked anyway
            start = np.where(m, start,
                             np.minimum(start, self.max_model_len - 1))
            tok[:n] = np.where(m, ib.token_ids[rows, start], 0)
            pos[:n] = np.where(m, start, 0)
            blk = ib.block_table[rows, start // self.block_size]
            # unscheduled rows park their (garbage) KV write on null
            # page 0 and are masked out of attention via kv_len 0
            slots[:n] = np.where(
                m, blk * self.block_size + start % self.block_size, 0)
            kv_lens[:n] = np.where(m, start + 1, 0)
            self._last_max_kv_len = (int((start + 1)[m].max())
                                     if m.any() else 1)
            cu[1:n + 1] = np.arange(1, n + 1)
            cu[n + 1:] = n
            if self.spec_k:
                logits_idx.reshape(s, k1)[:n, :] = rows[:, None]
            else:
                logits_idx[:n] = rows
            if lora_on:
                tok_slot[:n] = np.where(m, ib.lora_slot[:n], 0)
            if prev_row_of is not None:
                ph = np.nonzero(tok[:n] == -1)[0]
                for p_i in ph:
                    prev_rows[p_i] = prev_row_of.get(
                        ib.req_ids[int(p_i)], -1)
            if lay.mrope:
                deltas = np.fromiter(
                    (self._mrope_delta.get(ib.req_ids[r], 0)
                     for r in range(n)), np.int32, count=n)
                mp = lay.view(buf, "mrope_pos").reshape(3, t_bucket)
                mp[:, :n] = np.where(m, start + deltas, 0)[None, :]
            for r in range(n):
                if m[r]:
                    row_req_ids[r] = ib.req_ids[r]
            if self.export_hidden or self.needs_hidden_cond:
                self.last_flat_offsets = {
                    ib.req_ids[r]: (r, 1) for r in range(n) if m[r]}
            if self.spec_k:
                # spec x async bookkeeping: plain decode rows sample 1
                self._assumed_np = np.zeros(s, np.int32)
                self._assumed_np[:n] = np.where(m, 1, 0)
            self._decode_aligned = True  # q row i == seq row i
            self._finish_packing(so, lay, buf, ib, constrained,
                                 tok_slot)
            return t_bucket, buf, row_req_ids, constrained, penalized

        if fast_spec:
            # aligned spec packing: EVERY row occupies k1 flat slots at
            # r*k1 (rows without drafts repeat their single token; the
            # verifier keeps only position 0 via num_drafts = 0). This
            # is the layout the spec x async device correction assumes
            # (row of flat i == i // k1).
            rows = np.arange(n)
            m = np.fromiter((ib.req_ids[r] in so.num_scheduled_tokens
                             for r in range(n)), bool, count=n)
            start = ib.num_computed_tokens[:n]
            start = np.where(m, start,
                             np.minimum(start, self.max_model_len - 1))
            j = np.arange(k1)
            posr = np.minimum(start[:, None] + j[None, :],
                              self.max_model_len - 1)       # [n, k1]
            dn = np.zeros(n, np.int32)
            tok2 = np.zeros((n, k1), np.int32)
            tok2[:, 0] = np.where(m, ib.token_ids[rows, start], 0)
            for r in range(n):
                dr = dr_map.get(ib.req_ids[r])
                if dr and m[r]:
                    dn[r] = len(dr)
                    tok2[r, 1:1 + len(dr)] = dr
                    drafts_v[r, :len(dr)] = dr
            spec_rows = m & (dn > 0)
            blk = ib.block_table[rows[:, None],
                                 np.minimum(posr // self.block_size,
                                            ib.block_table.shape[1] - 1)]
            slot2 = np.where(spec_rows[:, None],
                             blk * self.block_size
                             + posr % self.block_size, 0)
            slot2[:, 0] = np.where(
                m, ib.block_table[rows, start // self.block_size]
                * self.block_size + start % self.block_size, 0)
            tok[:n * k1] = tok2.reshape(-1)
            pos[:n * k1] = np.where(m[:, None], posr, 0).reshape(-1)
            slots[:n * k1] = slot2.reshape(-1)
            # kv_len = start + k1 for EVERY scheduled row (draft-less
            # rows included): the ragged attention infers q positions
            # as kv_len - span + j, so with the uniform k1 span row 0
            # must infer exactly `start` — a draft-less row's true
            # kv_len (start + 1) would shift it to start - k + 1 and
            # corrupt its mask. Padding rows beyond a row's real length
            # read garbage their discarded outputs never propagate.
            kv_lens[:n] = np.where(m, start + k1, 0)
            self._last_max_kv_len = (int(kv_lens[:n].max())
                                     if m.any() else 1)
            cu[1:n + 1] = np.arange(1, n + 1) * k1
            cu[n + 1:] = n * k1
            logits_idx.reshape(s, k1)[:n] = (rows[:, None] * k1
                                             + np.minimum(j, dn[:, None]))
            num_drafts[:n] = np.where(m, dn, 0)
            # async: placeholder first tokens + sentinel drafts resolve
            # on device; prev_assumed carries the source row's assumed
            # sample count for the position correction
            if prev_row_of is not None:
                pa_v = lay.view(buf, "prev_assumed")
                assumed_prev = getattr(self, "_assumed_np", None)
                for r in range(n):
                    if not m[r]:
                        continue
                    pr_src = prev_row_of.get(ib.req_ids[r], -1)
                    if tok2[r, 0] == -1 and pr_src >= 0:
                        prev_rows[r * k1] = pr_src
                        if assumed_prev is not None:
                            pa_v[r] = assumed_prev[pr_src]
            for r in range(n):
                if m[r]:
                    row_req_ids[r] = ib.req_ids[r]
            if lora_on:
                tok_slot[:n * k1] = np.repeat(
                    np.where(m, ib.lora_slot[:n], 0), k1)
            # this dispatch's assumed sample count per row (consumed by
            # the NEXT dispatch's prev_assumed)
            self._assumed_np = np.zeros(s, np.int32)
            self._assumed_np[:n] = np.where(m, np.where(dn > 0, k1, 1),
                                            0)
            if self.export_hidden or self.needs_hidden_cond:
                self.last_flat_offsets = {
                    ib.req_ids[r]: (r * k1, k1) for r in range(n)
                    if m[r]}
            self._decode_aligned = False  # k1 q rows per seq
            self._finish_packing(so, lay, buf, ib, constrained,
                                 tok_slot)
            return t_bucket, buf, row_req_ids, constrained, penalized

        self._decode_aligned = False
        off = 0
        for row in range(ib.num_reqs):
            rid = ib.req_ids[row]
            nt = so.num_scheduled_tokens.get(rid, 0)
            if one_per_row and nt:
                nt = 1
            cu[row + 1] = cu[row] + nt
            if nt == 0:
                continue
            row_req_ids[row] = rid
            start = ib.num_computed_tokens[row]
            end = start + nt
            dr = so.scheduled_spec_decode_tokens.get(rid, ())
            dn = len(dr)
            n_real = nt - dn
            tok[off:off + n_real] = ib.token_ids[row, start:start + n_real]
            if dn:
                # draft tokens are not in the persistent batch; they are
                # appended to the query and verified against the target
                tok[off + n_real:off + nt] = dr
            pos[off:off + nt] = np.arange(start, end, dtype=np.int32)
            if lay.mrope:
                pr = np.arange(start, end, dtype=np.int32)
                delta = self._mrope_delta.get(rid, 0)
                table = self._mrope_pos3.get(rid)
                mp = lay.view(buf, "mrope_pos").reshape(3, t_bucket)
                if table is not None:
                    npr = table.shape[1]
                    inp = pr < npr
                    vals = np.where(
                        inp[None, :],
                        table[:, np.clip(pr, 0, npr - 1)],
                        (pr + delta)[None, :])
                else:
                    vals = np.broadcast_to(pr + delta, (3, nt))
                mp[:, off:off + nt] = vals
            # slot mapping from the block table
            blk = ib.block_table[row, start // self.block_size:
                                 (end - 1) // self.block_size + 1]
            idx = np.arange(start, end, dtype=np.int32)
            slots[off:off + nt] = (blk[(idx - start + start % self.block_size)
                                       // self.block_size]
                                   * self.block_size + idx % self.block_size)
            kv_lens[row] = end
            if self.spec_k:
                # position 0 = last real token's logits; j>dn padded to it
                base = off + nt - 1 - dn
                j = np.arange(k1)
                logits_idx[row * k1:(row + 1) * k1] = \
                    base + np.minimum(j, dn)
                drafts_v[row, :dn] = dr
                num_drafts[row] = dn
            else:
                logits_idx[row] = off + nt - 1
            if lora_on:
                tok_slot[off:off + nt] = ib.lora_slot[row]
            if rid in self._mm_spans:
                self._pack_mm_rows(rid, start, start + n_real, off,
                                   t_bucket)
            # async scheduling: -1 placeholder tokens resolve on device
            # from the previous step's samples
            if prev_row_of is not None:
                ph = np.nonzero(tok[off:off + n_real] == -1)[0]
                if ph.size:
                    pr = prev_row_of.get(rid, -1)
                    prev_rows[off + ph] = pr
            off += nt
        cu[ib.num_reqs + 1:] = cu[ib.num_reqs]
        if self.spec_k:
            # spec x async bookkeeping: any row scheduled by a slow
            # (prefill/mixed) dispatch samples at most 1 token
            self._assumed_np = np.zeros(s, np.int32)
            for row in range(ib.num_reqs):
                if so.num_scheduled_tokens.get(ib.req_ids[row], 0):
                    self._assumed_np[row] = 1
        self._last_max_kv_len = int(kv_lens.max()) if ib.num_reqs else 1
        if self.export_hidden or self.needs_hidden_cond:
            offs, o2 = {}, 0
            for row in range(ib.num_reqs):
                nt2 = so.num_scheduled_tokens.get(ib.req_ids[row], 0)
                if one_per_row and nt2:
                    nt2 = 1
                if nt2:
                    offs[ib.req_ids[row]] = (o2, nt2)
                o2 += nt2
            self.last_flat_offsets = offs
        self._finish_packing(so, lay, buf, ib, constrained, tok_slot)
        return t_bucket, buf, row_req_ids, constrained, penalized

    def _pages_bucket(self, max_kv_len: int) -> int:
        """Static page-table width for the XLA decode-attention gather:
        pow-2 bucketed pages covering the longest sequence this step
        (each bucket is one compiled step variant)."""
        from vllm_pq_tpu.utils import cdiv
        import vllm_pq_tpu.envs as envs
        if envs.VPQ_PAGES_FIXED:
            return self.max_blocks_per_req
        need = max(1, cdiv(max_kv_len, self.block_size))
        b = 8
        while b < need:
            b *= 2
        return min(b, self.max_blocks_per_req)

    def _finish_packing(self, so, lay, buf, ib, constrained, tok_slot):
        """Batch-invariant packed fields: sampling vectors, page tables,
        lora grouping, constraint masks (shared by the vectorized decode
        fast path and the general ragged path)."""
        s = self.max_num_reqs
        if tok_slot is not None:
            order = np.argsort(tok_slot, kind="stable").astype(np.int32)
            lay.view(buf, "lora_sorted_tok")[:] = order
            lay.view(buf, "lora_groups")[:] = np.bincount(
                tok_slot, minlength=lay.lora_slots)[:lay.lora_slots]
        lay.view(buf, "num_seqs")[0] = ib.num_reqs
        lay.view(buf, "page_indices").reshape(s, -1)[:, :] = \
            ib.block_table[:, :self.max_blocks_per_req]

        # sampling vectors (part of the same single transfer)
        n = ib.num_reqs
        lay.view(buf, "top_k")[:n] = ib.top_k[:n]
        lay.view(buf, "seed")[:n] = ib.seed[:n].view(np.int32)
        lay.view(buf, "has_seed")[:n] = ib.has_seed[:n]
        lay.view(buf, "eos_token_id")[:] = -1
        lay.view(buf, "eos_token_id")[:n] = ib.eos_token_id[:n]
        lay.view(buf, "min_tokens")[:n] = ib.min_tokens[:n]
        lay.view(buf, "output_len")[:n] = (ib.num_tokens[:n] -
                                           ib.num_prompt_tokens[:n])
        lay.fview(buf, "temperature")[:n] = ib.temperature[:n]
        lay.fview(buf, "top_p")[:] = 1.0
        lay.fview(buf, "top_p")[:n] = ib.top_p[:n]
        lay.fview(buf, "min_p")[:n] = ib.min_p[:n]
        lay.fview(buf, "presence_penalty")[:n] = ib.presence_penalty[:n]
        lay.fview(buf, "frequency_penalty")[:n] = ib.frequency_penalty[:n]
        lay.fview(buf, "repetition_penalty")[:] = 1.0
        lay.fview(buf, "repetition_penalty")[:n] = ib.repetition_penalty[:n]

        if lay.hist_len:
            lay.view(buf, "token_hist").reshape(
                s, lay.hist_len)[:n] = ib.token_ids[:n, :lay.hist_len]
            lay.view(buf, "num_prompt")[:n] = ib.num_prompt_tokens[:n]

        if lay.mrope:
            lay.view(buf, "rope_delta")[:n] = np.fromiter(
                (self._mrope_delta.get(ib.req_ids[r], 0)
                 for r in range(n)), np.int32, count=n)

        if constrained:
            w = lay.mask_words
            mask_v = lay.view(buf, "logits_mask").view(np.uint32) \
                .reshape(s, w)
            mask_v[:, :] = 0xFFFFFFFF  # default: all tokens allowed
            shifts = (1 << np.arange(32, dtype=np.uint64)).astype(
                np.uint32)
            for rid, m in so.guided_masks.items():
                row = ib.req_id_to_index.get(rid)
                if row is None:
                    continue
                mb = np.zeros(w * 32, bool)
                mb[:min(len(m), w * 32)] = m[:w * 32]
                mask_v[row] = (mb.reshape(w, 32) * shifts).sum(
                    axis=1, dtype=np.uint64).astype(np.uint32)
            bi = 0
            br = lay.view(buf, "bias_rows")
            bt = lay.view(buf, "bias_toks")
            bv = lay.fview(buf, "bias_vals")
            for rid, biases in so.logit_bias.items():
                row = ib.req_id_to_index.get(rid)
                if row is None:
                    continue
                for tok_id, val in biases.items():
                    if bi >= lay.MAX_BIAS:
                        logger.warning("logit_bias entries truncated at "
                                       "%d", lay.MAX_BIAS)
                        break
                    br[bi] = row
                    bt[bi] = int(tok_id)
                    bv[bi] = float(val)
                    bi += 1

    def execute_model(self, so: SchedulerOutput,
                      request_meta: Optional[Dict] = None
                      ) -> ModelRunnerOutput:
        handle = self.dispatch_model(so, request_meta)
        return self.fetch_model(handle)

    def dispatch_model(self, so: SchedulerOutput,
                       request_meta: Optional[Dict] = None):
        """Enqueue the device step WITHOUT waiting for results. Returns
        an opaque handle for fetch_model (async scheduling splits the
        two around the next step's scheduling work)."""
        if self.pp > 1:
            return self._dispatch_pp(so, request_meta)
        self.update_states(so, request_meta)
        if so.total_num_scheduled_tokens == 0:
            return None
        if so.num_scheduler_steps > 1:
            return ("ms", self._dispatch_multistep(so))
        self._run_encoders(so)

        t_bucket, buf, row_req_ids, constrained, penalized = \
            self.prepare_inputs(so)
        ib = self.input_batch
        num_logprobs = ib.max_num_logprobs
        # pure-decode steps (1 token per row for EVERY row, packed by
        # the aligned fast path so q row i == seq row i) use the
        # gather-based decode attention
        decode_only = getattr(self, "_decode_aligned", False)
        # prompt logprobs: only on steps that compute prompt positions
        plp_k = 0
        plp_rows = {}
        if ib.prompt_logprobs_reqs and not decode_only:
            plp_k, plp_rows = self._pack_plp_targets(
                so, buf, t_bucket, constrained, penalized)
        decode_pages = (self._pages_bucket(
            getattr(self, "_last_max_kv_len", 1)) if decode_only else 0)
        mm_step = self._mm_step
        # rows whose full logits ship to host (per-request logits
        # processors): pad the row list to a small power-of-2 bucket so
        # the variant count stays bounded
        raw_map = {}
        raw_n = 0
        if ib.logits_procs_reqs:
            rows = [row for row, rid in enumerate(row_req_ids)
                    if rid is not None and rid in ib.logits_procs_reqs]
            if rows:
                raw_n = 4
                while raw_n < len(rows):
                    raw_n *= 2
                raw_map = {row_req_ids[r]: i for i, r in enumerate(rows)}
        fn = self._get_step(t_bucket, ib.all_greedy, num_logprobs,
                            constrained, decode_only, plp_k, penalized,
                            decode_pages, mm=mm_step is not None,
                            raw_n=raw_n)
        self._step_count += 1
        step_key = jax.random.fold_in(self._rng_key, self._step_count)

        # .copy(): jnp.asarray may alias the numpy scratch buffer
        # zero-copy, and with async scheduling the next step's
        # prepare_inputs would overwrite it while this step is
        # still in flight
        packed = jnp.asarray(buf.copy())  # ONE host->device transfer
        lora_w = (self._lora_weights() if self.lora_stacks is not None
                  else None)
        mm_args = ((jnp.asarray(mm_step[0]), jnp.asarray(mm_step[1]))
                   if mm_step is not None else ())
        if getattr(self.model, "is_encoder_decoder", False):
            mm_args = mm_args + self._encdec_buffers()
        if raw_n:
            rows_arr = np.zeros(raw_n, np.int32)
            for rid, i in raw_map.items():
                rows_arr[i] = row_req_ids.index(rid)
            mm_args = (jnp.asarray(rows_arr),) + mm_args
        if self.medusa_heads is not None:
            mm_args = (self.medusa_heads,) + mm_args
        if self.needs_hidden_cond:
            hc = self._next_hidden_cond
            self._next_hidden_cond = None
            if isinstance(hc, tuple):
                # (source hidden [T_src, H], {rid: (src_off, src_nt)}):
                # gather source slots into THIS step's packed layout
                src, src_offs = hc
                idx = np.zeros(t_bucket, np.int32)
                for rid, (off, nt) in self.last_flat_offsets.items():
                    so_ = src_offs.get(rid)
                    if so_ is None:
                        continue
                    k = min(nt, so_[1])
                    idx[off:off + k] = np.arange(so_[0], so_[0] + k)
                hc = jnp.take(src, jnp.asarray(idx), axis=0,
                              mode="clip")
            if hc is None:
                hc = jnp.zeros(
                    (t_bucket, self.model.cfg.hidden_size),
                    jnp.bfloat16 if self.model.cfg.dtype == "bfloat16"
                    else jnp.float32)
            elif hc.shape[0] != t_bucket:
                hc = (hc[:t_bucket] if hc.shape[0] > t_bucket else
                      jnp.pad(hc, ((0, t_bucket - hc.shape[0]), (0, 0))))
            mm_args = (hc,) + mm_args
        if self.spec_k:
            mm_args = self._prev_spec_or_zeros() + mm_args
        toks, gens, lp, plp, drafts, raw, exp, self.kv_caches = fn(
            self.params, self.kv_caches, self.rope_cache, packed, step_key,
            lora_w, self._prev_toks_or_zeros(), *mm_args)
        if exp is not None:
            # device handles only — the proposer consumes them on device
            self.last_hidden, self.last_sel_hidden = exp

        # device state for async prev-token routing; spec steps route
        # the LAST emitted token (position gens-1), and stash the
        # in-graph drafts + emitted counts for the next dispatch's
        # sentinel resolution / position correction
        if self.spec_k:
            k1 = self.spec_k + 1
            s = self.max_num_reqs
            last = jnp.clip((gens if gens is not None else 1) - 1,
                            0, k1 - 1)
            self._prev_toks = toks[jnp.arange(s), last]
            if drafts is not None:
                self._prev_drafts = drafts
            if gens is not None:
                self._prev_gens = gens
        else:
            self._prev_toks = toks
        self._prev_row_of = {rid: row
                             for row, rid in enumerate(row_req_ids)
                             if rid is not None}

        # start the device->host copies before doing host-side work
        for a in (toks, gens, drafts, raw) + (tuple(lp) if lp else ()):
            if a is not None:
                try:
                    a.copy_to_host_async()
                except Exception:
                    pass
        return ("step", toks, gens, lp, row_req_ids, num_logprobs,
                plp, plp_rows, drafts, raw, raw_map)

    def _pack_plp_targets(self, so, buf, t_bucket, constrained,
                          penalized=False):
        """Fill plp_targets (next prompt token per flat position) and
        return (k, {rid: (off, nt, start, k_req)}) for rows wanting
        prompt logprobs that are mid-prefill this step."""
        ib = self.input_batch
        lay = self._layout(t_bucket, constrained, penalized)
        tgt = lay.view(buf, "plp_targets")
        tgt[:] = -1
        plp_rows = {}
        k = 0
        self._decode_aligned = False
        off = 0
        for row in range(ib.num_reqs):
            rid = ib.req_ids[row]
            nt = so.num_scheduled_tokens.get(rid, 0)
            if nt == 0:
                continue
            start = ib.num_computed_tokens[row]
            want = ib.prompt_logprobs_reqs.get(rid)
            if want and start < ib.num_prompt_tokens[row]:
                n_prompt = int(ib.num_prompt_tokens[row])
                for i in range(nt):
                    p = start + i
                    if p + 1 < n_prompt:
                        tgt[off + i] = ib.token_ids[row, p + 1]
                plp_rows[rid] = (off, nt, int(start), int(want))
                k = max(k, int(want))
            off += nt
        return (min(k, 16) + 1 if plp_rows else 0), plp_rows

    def _prev_toks_or_zeros(self):
        pt = getattr(self, "_prev_toks", None)
        if pt is None:
            pt = jnp.zeros(self.max_num_reqs, jnp.int32)
        return pt

    def _prev_spec_or_zeros(self):
        """(prev_drafts [S, k], prev_gens [S]) device state for the
        spec x async sentinel resolution; zeros/ones before the first
        spec step (prev_assumed = 0 gates the correction off)."""
        pd = getattr(self, "_prev_drafts", None)
        if pd is None:
            pd = jnp.zeros((self.max_num_reqs, self.spec_k), jnp.int32)
        pg = getattr(self, "_prev_gens", None)
        if pg is None:
            pg = jnp.ones(self.max_num_reqs, jnp.int32)
        return (pd, pg)

    def fetch_model(self, handle) -> ModelRunnerOutput:
        out = ModelRunnerOutput()
        if handle is None:
            return out
        if handle[0] == "ms":
            return self._fetch_multistep(handle[1])
        (_, toks, gens, lp, row_req_ids, num_logprobs, plp, plp_rows,
         drafts, raw, raw_map) = handle
        ib = self.input_batch
        if plp is not None and plp_rows:
            pi = np.asarray(jax.device_get(plp[0]))
            pv = np.asarray(jax.device_get(plp[1]))
            pt = np.asarray(jax.device_get(plp[2]))
            for rid, (off, nt, start, k) in plp_rows.items():
                out.prompt_logprobs[rid] = (
                    start, pi[off:off + nt, :k], pv[off:off + nt, :k],
                    pt[off:off + nt])

        toks_np = np.asarray(jax.device_get(toks))
        gens_np = (np.asarray(jax.device_get(gens))
                   if gens is not None else None)
        drafts_np = (np.asarray(jax.device_get(drafts))
                     if drafts is not None else None)
        if lp is not None:
            lp_ids = np.asarray(jax.device_get(lp[0]))
            lp_vals = np.asarray(jax.device_get(lp[1]))
            lp_rank = np.asarray(jax.device_get(lp[2]))

        for row, rid in enumerate(row_req_ids):
            if rid is None:
                continue
            out.req_ids.append(rid)
            if self.spec_k:
                g = int(gens_np[row])
                out.sampled_token_ids[rid] = \
                    [int(t) for t in toks_np[row, :g]]
            else:
                out.sampled_token_ids[rid] = [int(toks_np[row])]
            if num_logprobs > 0 and rid in ib.logprobs_reqs:
                out.logprobs[rid] = (lp_ids[row], lp_vals[row],
                                     int(lp_rank[row]))
            if drafts_np is not None:
                out.draft_token_ids[rid] = [int(t)
                                            for t in drafts_np[row]]
        if raw is not None and raw_map:
            raw_np = np.asarray(jax.device_get(raw))
            for rid, i in raw_map.items():
                out.raw_logits[rid] = raw_np[i]
        return out

    def enable_medusa(self, heads) -> None:
        """Install medusa head params (list of {"res", "lm"} trees);
        must run before step functions compile (engine init order)."""
        self.medusa_heads = heads
        self._step_fns = {}

    def enable_mlp_speculator(self, spec) -> None:
        """Install MLP-speculator params (spec_decode/mlp_speculator);
        rides the medusa in-graph draft plumbing with a recurrent
        (hidden, token)-conditioned head stack."""
        # only ARRAYS ride the jit boundary; the scalars are static
        self.medusa_heads = {"heads": spec["heads"]}
        self._mlp_spec_mode = True
        self._mlp_static = (bool(spec["scale_input"]),
                            float(spec["emb_w"]) / float(spec["state_w"]))
        self._step_fns = {}

    # ------------------------------------------------------------------
    # warmup: compile every (bucket, decode-variant) step function up
    # front so serving never hits a multi-second compile mid-request
    # (role of reference V0-TPU warmup_model, tpu_model_runner.py:281)

    def warmup(self, greedy_only: bool = True) -> None:
        import time
        t0 = time.perf_counter()
        n = 0
        if getattr(self.model, "is_encoder_decoder", False):
            return  # variants depend on the encoder-length bucket
        if self.pp > 1:
            # PP variants are keyed by (microbatch width, packing
            # bucket); compile on demand
            return
        # bootstrap pass: the first call's outputs give kv_caches and
        # _prev_toks their steady-state (committed Auto) shardings, so
        # every variant compiled below keys EXACTLY like serving calls
        # (see the feed-back note at the bottom of the loop)
        bootstrap = [True, False]
        for is_boot in bootstrap:
            buckets = (self.token_buckets[:1] if is_boot
                       else self.token_buckets)
            for b in buckets:
              for decode_only in ((False,) if is_boot else (False, True)):
                lay = self._layout(b, False)
                buf = self._packed_bufs[(b, False, False)]
                buf[:] = 0
                # one fake sequence on the null page
                lay.view(buf, "token_ids")[0] = 1
                lay.view(buf, "kv_lens")[0] = 1
                lay.view(buf, "cu_q_lens")[1:] = 1
                lay.view(buf, "num_seqs")[0] = 1
                lay.view(buf, "prev_rows")[:] = -1
                lay.view(buf, "eos_token_id")[:] = -1
                lay.fview(buf, "top_p")[:] = 1.0
                lay.fview(buf, "repetition_penalty")[:] = 1.0
                modes = (True,) if greedy_only else (True, False)
                # decode variants are additionally keyed by the pages
                # bucket of the gather-based decode attention; compile
                # the short-context bucket and the worst case
                if decode_only:
                    # the WHOLE pages-bucket ladder: an uncompiled
                    # bucket appearing mid-serving costs a multi-minute
                    # remote compile stall (round-3 QPS-sweep lesson)
                    top = self._pages_bucket(
                        self.max_blocks_per_req * self.block_size)
                    pages, b = [], 8
                    while b < top:
                        pages.append(self._pages_bucket(
                            b * self.block_size))
                        b *= 2
                    pages.append(top)
                    pages = tuple(pages)
                else:
                    pages = (0,)
                for greedy in modes:
                    for dp in dict.fromkeys(pages):
                        fn = self._get_step(b, greedy, 0, False,
                                            decode_only,
                                            decode_pages=dp)
                        lora_w = (self._lora_weights()
                                  if self.lora_stacks is not None
                                  else None)
                        extra = ((self.medusa_heads,)
                                 if self.medusa_heads is not None else ())
                        if self.needs_hidden_cond:
                            extra = (jnp.zeros(
                                (b, self.model.cfg.hidden_size),
                                jnp.bfloat16
                                if self.model.cfg.dtype == "bfloat16"
                                else jnp.float32),) + extra
                        out = fn(self.params, self.kv_caches,
                                 self.rope_cache, jnp.asarray(buf.copy()),
                                 jax.random.PRNGKey(0), lora_w,
                                 self._prev_toks_or_zeros(), *extra)
                        self.kv_caches = out[-1]
                        # feed the sampled tokens back as prev_toks:
                        # serving passes the PREVIOUS step's output here,
                        # which carries a committed (Auto) sharding. A
                        # fresh zeros array keys a DIFFERENT trace, so
                        # every variant silently recompiled (25-200 s
                        # through the remote compiler) on its first live
                        # call — warmup was priming the wrong cache keys.
                        toks0 = out[0]
                        self._prev_toks = (toks0[:, 0] if toks0.ndim == 2
                                           else toks0)
                        jax.block_until_ready(out[0])
                        n += 1
        # helper programs dispatched OUTSIDE the step jits (per-step key
        # folding etc.): their first execution pays the same remote
        # compile/load round trip as a full variant (~20 s observed), so
        # run them here rather than on the first live request
        jax.block_until_ready(
            jax.random.fold_in(self._rng_key, self._step_count))
        logger.info("warmup: compiled %d step variants in %.1fs", n,
                    time.perf_counter() - t0)

    # ------------------------------------------------------------------
    # pooling / embeddings (role of reference pooling models + encode())

    def encode(self, token_ids_list: List[List[int]],
               pool: str = "last") -> np.ndarray:
        """Pooled hidden states for whole prompts (offline embedding
        path; uses a lazily-allocated scratch KV cache so serving state
        is untouched)."""
        model = self.model
        h = model.cfg.hidden_size
        results = []
        for ids in token_ids_list:
            t = len(ids)
            t_bucket = self._pick_bucket(t)
            n_pages = cdiv(t_bucket, self.block_size) + 1
            if getattr(self, "_enc_kv", None) is None or \
                    self._enc_kv[0].shape[0] < n_pages + 1:
                # page 0 is the padding page; data lives in 1..n_pages
                kv_shape = model.kv_cache_shape(n_pages + 1,
                                                self.block_size,
                                                tp_size=1)
                enc_dt = self._kv_alloc[1]
                self._enc_kv = [
                    jax.device_put(
                        jnp.zeros(kv_shape, enc_dt),
                        NamedSharding(self.mesh, self.kv_spec))
                    for _ in range(model.cfg.num_hidden_layers)]
            fn = self._get_encode_fn(t_bucket, pool)
            tok = np.zeros(t_bucket, np.int32)
            tok[:t] = ids
            pos = np.zeros(t_bucket, np.int32)
            pos[:t] = np.arange(t)
            slots = np.arange(self.block_size,
                              self.block_size + t_bucket, dtype=np.int32)
            pooled = fn(self.params, self._enc_kv, self.rope_cache,
                        jnp.asarray(tok), jnp.asarray(pos),
                        jnp.asarray(slots), jnp.asarray([t], np.int32))
            results.append(np.asarray(jax.device_get(pooled)))
        return np.stack(results)

    def classify(self, token_ids_list: List[List[int]],
                 type_ids_list=None) -> np.ndarray:
        """Sequence-classification / reward logits for decoder LMs with
        a score head (role of reference as_seqcls_model pooling +
        qwen2_rm.py score stack). Pooling is last-token, matching HF's
        *ForSequenceClassification last non-pad position."""
        if not getattr(self.model.cfg, "num_labels", 0):
            raise ValueError(
                "model has no classification head (num_labels == 0)")
        if type_ids_list is not None and any(
                t is not None for t in type_ids_list):
            logger.warning("token_type_ids are ignored by decoder "
                           "classification models")
        return self.encode(token_ids_list, pool="last_score")

    def _get_encode_fn(self, t_bucket: int, pool: str):
        key = ("enc", t_bucket, pool)
        fn = self._step_fns.get(key)
        if fn is not None:
            return fn
        model = self.model
        n_layers = model.cfg.num_hidden_layers
        n_pages = cdiv(t_bucket, self.block_size) + 1
        pages = np.arange(1, n_pages + 1, dtype=np.int32)

        def fwd(params, kv_caches, rope, tok, pos, slots, n):
            md = {
                "slot_mapping": slots,
                "kv_lens": jnp.concatenate(
                    [n.astype(jnp.int32),
                     jnp.zeros(0, jnp.int32)]),
                "page_indices": jnp.asarray(pages)[None, :],
                "cu_q_lens": jnp.stack(
                    [jnp.zeros((), jnp.int32),
                     n[0].astype(jnp.int32)]),
                "num_seqs": jnp.ones(1, jnp.int32),
            }
            hidden, _ = model(params, tok, pos, kv_caches, md, rope)
            if pool == "mean":
                mask = (jnp.arange(t_bucket) < n[0])[:, None]
                pooled = jnp.sum(jnp.where(mask, hidden, 0), axis=0) \
                    / jnp.maximum(n[0], 1)
            else:  # last token
                pooled = hidden[n[0] - 1]
            if pool == "last_score":
                return model.classify_pooled(params, pooled)
            return pooled.astype(jnp.float32)

        sharded = _shard_map(
            fwd, self.mesh,
            # encode scratch caches are plain arrays even under int8 KV
            in_specs=(model.param_specs(), [self.kv_spec] * n_layers,
                      P(None, None), P(), P(), P(), P()),
            out_specs=P(),
        )
        fn = jax.jit(sharded)
        self._step_fns[key] = fn
        return fn

    # ------------------------------------------------------------------
    # sleep mode (role of reference CuMemAllocator.sleep/wake_up)

    def _layer_specs(self, n_layers: int):
        """Per-layer cache spec list (hybrid models mix kinds)."""
        if self.cache_kinds:
            return [self.kv_layer_spec if k == "kv" else self._ssm_spec
                    for k in self.cache_kinds[:n_layers]]
        return [self.kv_layer_spec] * n_layers

    def _alloc_kv_layer(self, li: int = 0):
        """One layer's device KV allocation (plain array, QuantKV, or
        an SSM recurrent state for hybrid layers)."""
        if self.cache_kinds and self.cache_kinds[li] == "ssm":
            return jax.device_put(
                jnp.zeros(self._ssm_alloc, jnp.float32),
                NamedSharding(self.mesh, self._ssm_spec))
        kv_shape, kv_dtype = self._kv_alloc
        if self.kv_quant:
            from vllm_pq_tpu.ops.attention import QuantKV
            return QuantKV(
                jax.device_put(jnp.zeros(kv_shape, jnp.int8),
                               NamedSharding(self.mesh, self.kv_spec)),
                jax.device_put(jnp.zeros(kv_shape[:-1], jnp.float32),
                               NamedSharding(self.mesh,
                                             self._kv_scale_spec)))
        return jax.device_put(jnp.zeros(kv_shape, kv_dtype),
                              NamedSharding(self.mesh, self.kv_spec))

    def sleep(self, level: int = 1) -> None:
        """Delete device buffers: KV (level>=1) and weights (level>=2).
        The KV content is discarded (callers reset the prefix cache);
        weights are stashed on host and restored on wake."""
        for c in self.kv_caches:
            for leaf in jax.tree.leaves(c):
                leaf.delete()
        self.kv_caches = []
        if self.pp > 1 and getattr(self, "kv_stacked", None) is not None:
            self.kv_stacked.delete()
            self.kv_stacked = None
        self._asleep_level = level
        if level >= 2:
            self._host_params = jax.tree.map(
                lambda a: np.asarray(jax.device_get(a)), self.params)
            jax.tree.map(lambda a: a.delete(), self.params)
            self.params = None
        logger.info("runner asleep (level %d)", level)

    def wake_up(self) -> None:
        kv_shape, kv_dtype = self._kv_alloc
        if self.pp > 1:
            n_layers = self.model.cfg.num_hidden_layers
            self.kv_stacked = jax.device_put(
                jnp.zeros((n_layers,) + kv_shape, kv_dtype),
                NamedSharding(self.mesh, self.kv_spec))
        else:
            self.kv_caches = [self._alloc_kv_layer(li)
                              for li in range(
                                  self.model.cfg.num_hidden_layers)]
        if getattr(self, "_asleep_level", 1) >= 2 and self.params is None:
            specs = self.model.param_specs()
            self.params = jax.tree.map(
                lambda a, sp: jax.device_put(
                    a, NamedSharding(self.mesh,
                                     sp if isinstance(sp, P) else P())),
                self._host_params, specs)
            self._host_params = None
        self._asleep_level = 0
        logger.info("runner awake")

    # ------------------------------------------------------------------
    # KV transfer (disaggregated prefill, distributed/kv_transfer/)

    def gather_kv(self, block_ids: List[int]) -> np.ndarray:
        """Pull the given pages off the device for transfer:
        [L, n_blocks, page_size, 2*KVH, D] (host numpy). Int8 caches
        transfer dequantized bf16 pages (the wire format stays dtype-
        agnostic across producer/consumer cache dtypes)."""
        from vllm_pq_tpu.ops.attention import _gather_pages
        ids = jnp.asarray(np.asarray(block_ids, np.int32))
        stacked = jnp.stack([_gather_pages(c, ids)
                             for c in self.kv_caches])
        return np.asarray(jax.device_get(stacked))

    def scatter_kv(self, block_ids: List[int], kv: np.ndarray) -> None:
        """Write transferred pages into this worker's cache at the given
        block ids (consumer side of the KV connector)."""
        from vllm_pq_tpu.ops.attention import QuantKV, quantize_kv_rows
        ids = jnp.asarray(np.asarray(block_ids, np.int32))
        new = []
        for li, c in enumerate(self.kv_caches):
            if isinstance(c, QuantKV):
                pages = jnp.asarray(kv[li], jnp.float32)
                nb, ps, ckv, d = pages.shape
                q, sc = quantize_kv_rows(pages.reshape(nb * ps, ckv, d))
                new.append(QuantKV(
                    c.data.at[ids].set(q.reshape(nb, ps, ckv, d)),
                    c.scale.at[ids].set(sc.reshape(nb, ps, ckv))))
            else:
                new.append(c.at[ids].set(jnp.asarray(kv[li], c.dtype)))
        self.kv_caches = new

    def _dispatch_multistep(self, so: SchedulerOutput):
        n = so.num_scheduler_steps
        t_bucket, buf, row_req_ids, _, _ = self.prepare_inputs(
            so, one_per_row=True)  # scheduler excludes constrained rows
        # the scan derives per-iteration metadata assuming q row i ==
        # seq row i; prepare_inputs' fast path guarantees it (gaps
        # become kv_len-0 masked rows)
        assert getattr(self, "_decode_aligned", False), \
            "multi-step dispatch requires row-aligned decode packing"
        ib = self.input_batch
        ctx_pages = self._pages_bucket(
            getattr(self, "_last_max_kv_len", 1) + n)
        row_mask = np.fromiter(
            (rid is not None for rid in row_req_ids), bool,
            count=len(row_req_ids))
        shared_pages = min(self._shared_prefix_pages(row_mask),
                           max(ctx_pages - 1, 0))
        fn, use_arena, win_spec = self._get_multistep(
            n, ib.all_greedy, t_bucket, ctx_pages, shared_pages)
        self._step_count += 1
        step_key = jax.random.fold_in(self._rng_key, self._step_count)
        packed = jnp.asarray(buf.copy())
        if win_spec:
            return self._dispatch_multistep_spec(
                fn, win_spec, n, packed, step_key, row_req_ids)
        dump = os.environ.get("VPQ_DUMP_STEP_HLO")
        if dump and not getattr(self, "_hlo_dumped", False):
            # dev tool: write the OPTIMIZED multistep HLO for op-level
            # perf forensics (profiler traces only give op names)
            self._hlo_dumped = True
            txt = fn.lower(self.params, self.kv_caches, self.rope_cache,
                           packed, step_key,
                           self._prev_toks_or_zeros()).compile().as_text()
            with open(dump, "w") as fh:
                fh.write(txt)
            logger.info("multistep HLO (%d chars) -> %s", len(txt), dump)
        all_toks, aux = fn(self.params, self.kv_caches,
                           self.rope_cache, packed, step_key,
                           self._prev_toks_or_zeros())
        if use_arena:
            # window-end fold: scatter the rings into the paged caches
            # (separate dispatch so donation aliases cleanly)
            s = self.max_num_reqs
            bs = self.block_size
            slots = np.zeros((n, s), np.int32)
            start = ib.num_computed_tokens[:s].copy()
            active = np.zeros(s, bool)
            for row, rid in enumerate(row_req_ids):
                if rid is not None:
                    active[row] = True
            for j in range(n):
                pos = start + j
                pos_c = np.minimum(pos, self.max_model_len - 1)
                blk = ib.block_table[np.arange(s), pos_c // bs]
                slots[j] = np.where(active, blk * bs + pos_c % bs, 0)
            ringsK, ringsV = aux
            fold = self._get_fold(n)
            self.kv_caches = fold(self.kv_caches, ringsK, ringsV,
                                  jnp.asarray(slots.reshape(-1)))
        else:
            self.kv_caches = aux
        self._prev_toks = all_toks[-1]
        self._prev_row_of = {rid: row
                             for row, rid in enumerate(row_req_ids)
                             if rid is not None}
        try:
            all_toks.copy_to_host_async()
        except Exception:
            pass
        return (all_toks, row_req_ids)

    def _dispatch_multistep_spec(self, fn, spec_k: int, n: int, packed,
                                 step_key, row_req_ids):
        """Speculative window dispatch: drafts carry on device between
        windows (the first window's -1 drafts simply verify to nothing,
        so misalignment after batch membership changes only costs
        acceptance, never correctness)."""
        s = self.max_num_reqs
        prev_drafts = getattr(self, "_prev_win_drafts", None)
        if prev_drafts is None or prev_drafts.shape != (s, spec_k):
            prev_drafts = jnp.full((s, spec_k), -1, jnp.int32)
        toks_all, gens_all, last, drafts, aux = fn(
            self.params, self.kv_caches, self.rope_cache, packed,
            step_key, self._prev_toks_or_zeros(), self.medusa_heads,
            prev_drafts)
        self._prev_win_drafts = drafts
        ringsK, ringsV, ring_pos, ring_valid = aux
        pi = jnp.asarray(
            self.input_batch.block_table[:s, :self.max_blocks_per_req])
        fold = self._get_fold_spec()
        self.kv_caches = fold(self.kv_caches, ringsK, ringsV,
                              ring_pos, ring_valid, pi)
        self._prev_toks = last
        self._prev_row_of = {rid: row
                             for row, rid in enumerate(row_req_ids)
                             if rid is not None}
        for a in (toks_all, gens_all):
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        return (toks_all, gens_all, row_req_ids)

    def _fetch_multistep(self, h) -> ModelRunnerOutput:
        if len(h) == 3:  # speculative window: [N, S, K+1] + counts
            toks_all, gens_all, row_req_ids = h
            out = ModelRunnerOutput()
            toks_np = np.asarray(jax.device_get(toks_all))
            gens_np = np.asarray(jax.device_get(gens_all))
            k1 = toks_np.shape[2]
            # accepted-prefix mask [N, S, K+1]; per row the accepted
            # tokens concatenate in iteration order
            mask = (np.arange(k1)[None, None, :]
                    < gens_np[:, :, None])
            for row, rid in enumerate(row_req_ids):
                if rid is None:
                    continue
                out.req_ids.append(rid)
                out.sampled_token_ids[rid] = \
                    toks_np[:, row][mask[:, row]].tolist()
            return out
        all_toks, row_req_ids = h
        out = ModelRunnerOutput()
        toks_np = np.asarray(jax.device_get(all_toks))  # [N, S]
        for row, rid in enumerate(row_req_ids):
            if rid is None:
                continue
            out.req_ids.append(rid)
            out.sampled_token_ids[rid] = [int(t) for t in toks_np[:, row]]
        return out
