"""Model runner: persistent batch + bucketed jitted step functions.

Role of the reference's ``v1/worker/tpu_model_runner.py`` redesigned for
JAX:
- static-shape discipline: the flat token axis is padded to a bucket
  (pow-2 ladder, reference pads to x16 at ``:419-440``); the sequence
  axis is fixed at ``max_num_seqs`` so only one axis varies;
- the model forward + logits run as ONE jitted function per token
  bucket under ``shard_map`` over the ("data","model") mesh, with the
  paged KV caches donated so updates are in-place;
- sampling runs as a second small jitted function (greedy fast path and
  general path, reference all-greedy detection ``gpu_input_batch.py``);
- host side is numpy-first (reference ``_prepare_inputs``,
  ``gpu_model_runner.py:447``): the scheduler<->runner protocol never
  touches device memory.
"""

import functools
from typing import Any, Dict, List, Optional

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
        # device state
        self.rope_cache = jax.device_put(
            model.rope_cache(),
            NamedSharding(mesh, P(None, None)))
        # logical (unsharded) kv shape; sharded on the kv-head axis
        kv_shape = model.kv_cache_shape(num_kv_blocks, self.block_size,
                                        tp_size=1)
        self.kv_spec = model.kv_cache_spec()
        kv_dtype = (jnp.bfloat16 if config.model.dtype == "bfloat16"
                    else jnp.float32)
        self.kv_caches = [
            jax.device_put(jnp.zeros(kv_shape, kv_dtype),
                           NamedSharding(mesh, self.kv_spec))
            for _ in range(model.cfg.num_hidden_layers)
        ]
        logger.info("KV cache: %d pages x %s x %d layers (%.2f GiB total)",
                    num_kv_blocks, kv_shape[1:], len(self.kv_caches),
                    np.prod(kv_shape) * len(self.kv_caches) *
                    (2 if kv_dtype == jnp.bfloat16 else 4) / 2**30)

        self._forward_fns: Dict[int, Any] = {}
        self._sample_greedy = None
        self._sample_general = None
        self._step_count = 0
        self._rng_key = jax.random.PRNGKey(config.model.seed)
        # speculative decoding: verify K drafts + 1 bonus token per row
        self.spec_k = (config.speculative.num_spec_tokens
                       if config.speculative.enabled else 0)

        # scratch host arrays reused across steps
        self._tok = np.zeros(self.token_buckets[-1], np.int32)
        self._pos = np.zeros(self.token_buckets[-1], np.int32)
        self._slots = np.zeros(self.token_buckets[-1], np.int32)

    # ------------------------------------------------------------------
    # jitted step functions

    def _build_forward(self, t_bucket: int):
        model = self.model
        mesh = self.mesh
        param_specs = model.param_specs()
        n_layers = model.cfg.num_hidden_layers
        input_specs = {k: P() for k in
                       ("token_ids", "positions", "slot_mapping", "kv_lens",
                        "page_indices", "cu_q_lens", "num_seqs",
                        "logits_indices")}

        def fwd(params, kv_caches, rope, inputs):
            hidden, new_caches = model(
                params, inputs["token_ids"], inputs["positions"],
                kv_caches, inputs, rope)
            sel = hidden[inputs["logits_indices"]]
            logits = model.compute_logits(params, sel)
            return logits, new_caches

        sharded = _shard_map(
            fwd, mesh,
            in_specs=(param_specs, [self.kv_spec] * n_layers, P(None, None),
                      input_specs),
            out_specs=(P(), [self.kv_spec] * n_layers),
        )
        return jax.jit(sharded, donate_argnums=(1,))

    def _get_forward(self, t_bucket: int):
        fn = self._forward_fns.get(t_bucket)
        if fn is None:
            fn = self._build_forward(t_bucket)
            self._forward_fns[t_bucket] = fn
        return fn

    def _get_sampler(self, greedy: bool, num_logprobs: int):
        key = (greedy, num_logprobs)
        if not hasattr(self, "_samplers"):
            self._samplers = {}
        fn = self._samplers.get(key)
        if fn is None:
            @functools.partial(jax.jit, static_argnames=())
            def run(logits, state, step_key):
                toks = sample(logits, state, step_key, all_greedy=greedy)
                if num_logprobs > 0:
                    ids, vals, rank = compute_logprobs(
                        logits, toks, num_logprobs)
                    return toks, ids, vals, rank
                return toks, None, None, None
            fn = run
            self._samplers[key] = fn
        return fn

    def _get_spec_sampler(self, greedy: bool, num_logprobs: int):
        key = ("spec", greedy, num_logprobs)
        if not hasattr(self, "_samplers"):
            self._samplers = {}
        fn = self._samplers.get(key)
        if fn is None:
            from vllm_pq_tpu.layers.rejection import verify_and_sample
            s = self.max_num_reqs
            k1 = self.spec_k + 1

            @jax.jit
            def run(logits, drafts, num_drafts, state, step_key):
                l3 = logits.reshape(s, k1, -1)
                toks, gens = verify_and_sample(
                    l3, drafts, num_drafts, state, step_key,
                    all_greedy=greedy)
                if num_logprobs > 0:
                    # logprob rows never carry drafts, so their position-0
                    # logits/token are exact
                    ids, vals, rank = compute_logprobs(
                        l3[:, 0], toks[:, 0], num_logprobs)
                    return toks, gens, ids, vals, rank
                return toks, gens, None, None, None
            fn = run
            self._samplers[key] = fn
        return fn

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
        ib.condense()
        for nr in so.scheduled_new_reqs:
            ib.add_request(nr)
            if request_meta and nr.req_id in request_meta:
                eos, ignore = request_meta[nr.req_id]
                ib.set_eos(nr.req_id, eos, ignore)
        for cr in so.scheduled_cached_reqs:
            ib.update_cached(cr)

    def _pick_bucket(self, t: int) -> int:
        for b in self.token_buckets:
            if t <= b:
                return b
        raise ValueError(f"{t} tokens exceed the largest bucket "
                         f"{self.token_buckets[-1]}")

    def prepare_inputs(self, so: SchedulerOutput):
        """Flatten the scheduled work into static-shape arrays."""
        ib = self.input_batch
        s = self.max_num_reqs
        t_bucket = self._pick_bucket(max(so.total_num_scheduled_tokens, 1))

        tok = self._tok[:t_bucket]
        pos = self._pos[:t_bucket]
        slots = self._slots[:t_bucket]
        tok[:] = 0
        pos[:] = 0
        slots[:] = 0  # null page

        kv_lens = np.zeros(s, np.int32)
        cu = np.zeros(s + 1, np.int32)
        k1 = self.spec_k + 1
        logits_idx = np.zeros(s * k1 if self.spec_k else s, np.int32)
        drafts_arr = (np.zeros((s, self.spec_k), np.int32)
                      if self.spec_k else None)
        num_drafts = np.zeros(s, np.int32) if self.spec_k else None
        row_req_ids: List[Optional[str]] = [None] * s

        off = 0
        n_sched = 0
        for row in range(ib.num_reqs):
            rid = ib.req_ids[row]
            nt = so.num_scheduled_tokens.get(rid, 0)
            cu[row + 1] = cu[row] + nt
            if nt == 0:
                continue
            n_sched += 1
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
                drafts_arr[row, :dn] = dr
                num_drafts[row] = dn
            else:
                logits_idx[row] = off + nt - 1
            off += nt
        cu[ib.num_reqs + 1:] = cu[ib.num_reqs]

        page_indices = ib.block_table[:, :self.max_blocks_per_req]
        inputs = {
            "token_ids": jnp.asarray(tok),
            "positions": jnp.asarray(pos),
            "slot_mapping": jnp.asarray(slots),
            "kv_lens": jnp.asarray(kv_lens),
            "page_indices": jnp.asarray(page_indices),
            "cu_q_lens": jnp.asarray(cu),
            "num_seqs": jnp.asarray([ib.num_reqs], np.int32),
            "logits_indices": jnp.asarray(logits_idx),
        }
        spec = ((jnp.asarray(drafts_arr), jnp.asarray(num_drafts))
                if self.spec_k else None)
        return t_bucket, inputs, row_req_ids, spec

    def _sampling_state(self) -> SamplingState:
        ib = self.input_batch
        out_len = (ib.num_tokens - ib.num_prompt_tokens).astype(np.int32)
        return SamplingState(
            temperature=jnp.asarray(ib.temperature),
            top_k=jnp.asarray(ib.top_k),
            top_p=jnp.asarray(ib.top_p),
            min_p=jnp.asarray(ib.min_p),
            presence_penalty=jnp.asarray(ib.presence_penalty),
            frequency_penalty=jnp.asarray(ib.frequency_penalty),
            repetition_penalty=jnp.asarray(ib.repetition_penalty),
            seed=jnp.asarray(ib.seed),
            has_seed=jnp.asarray(ib.has_seed),
            eos_token_id=jnp.asarray(ib.eos_token_id),
            min_tokens=jnp.asarray(ib.min_tokens),
            output_len=jnp.asarray(out_len),
        )

    def execute_model(self, so: SchedulerOutput,
                      request_meta: Optional[Dict] = None
                      ) -> ModelRunnerOutput:
        self.update_states(so, request_meta)
        out = ModelRunnerOutput()
        if so.total_num_scheduled_tokens == 0:
            return out

        t_bucket, inputs, row_req_ids, spec = self.prepare_inputs(so)
        fwd = self._get_forward(t_bucket)
        logits, self.kv_caches = fwd(self.params, self.kv_caches,
                                     self.rope_cache, inputs)

        ib = self.input_batch
        num_logprobs = ib.max_num_logprobs
        self._step_count += 1
        step_key = jax.random.fold_in(self._rng_key, self._step_count)

        if self.spec_k:
            sampler = self._get_spec_sampler(ib.all_greedy, num_logprobs)
            toks, gens, lp_ids, lp_vals, lp_rank = sampler(
                logits, spec[0], spec[1], self._sampling_state(), step_key)
            toks_np = np.asarray(jax.device_get(toks))    # [S, K+1]
            gens_np = np.asarray(jax.device_get(gens))    # [S]
        else:
            sampler = self._get_sampler(ib.all_greedy, num_logprobs)
            toks, lp_ids, lp_vals, lp_rank = sampler(
                logits, self._sampling_state(), step_key)
            toks_np = np.asarray(jax.device_get(toks))
        if num_logprobs > 0:
            lp_ids = np.asarray(jax.device_get(lp_ids))
            lp_vals = np.asarray(jax.device_get(lp_vals))
            lp_rank = np.asarray(jax.device_get(lp_rank))

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
        return out
