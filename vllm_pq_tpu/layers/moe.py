"""Fused mixture-of-experts layer (role of reference
``model_executor/layers/fused_moe/`` — FusedMoE ``layer.py:297``, triton
kernels ``fused_moe.py``, Pallas gmm ``moe_pallas.py:8-40``), rebuilt
TPU-first:

- routing: dense top-k over softmaxed router logits (the XLA analog of
  ``topk_softmax_kernels.cu``);
- expert compute: tokens sorted by expert id feed ``jax.lax.ragged_dot``
  (TPU grouped matmul — the gmm the reference's Pallas MoE path uses);
- sharding, two modes:
  * default ("expert-tensor parallelism"): expert weights sharded on the
    INTERMEDIATE dim; every shard processes all assignments against its
    1/tp slice of every expert, then psums — exact and load-balanced
    regardless of routing skew, with no token all-to-all.
  * ``expert_parallel=True`` (reference ``determine_expert_map``,
    ``fused_moe/layer.py:253-290,367-374``): experts partitioned across
    the mesh axis; each shard masks assignments to its local experts
    (non-local assignments are pointed at a real local expert with zero
    routing weight so the math stays finite) and psums partial outputs.
    Exact for any routing. Preferable when intermediate/tp would drop
    below the MXU tile (128) or experts don't divide on I; per-shard
    HBM traffic touches only local expert weights.

Weights: ``w1 [E, H, I]`` (gate), ``w3 [E, H, I]`` (up), ``w2
[E, I, H]``. Gate and up are separate tensors so each shards cleanly on
the intermediate dim (the MergedColumnParallelLinear lesson, reference
``linear.py:445``: a naive gate‖up concat would hand shards gate-only /
up-only slices).
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.quantization.methods import TP_AXIS


class FusedMoE:
    """Stateless functional MoE block."""

    def __init__(self, hidden_size: int, intermediate_size: int,
                 num_experts: int, top_k: int, renormalize: bool = True,
                 expert_parallel: bool = False,
                 n_group: int = 1, topk_group: int = 1,
                 routed_scaling_factor: float = 1.0,
                 scoring_func: str = "softmax",
                 router_jitter: float = 0.01,
                 act: str = "silu",
                 router_logit_cap: Optional[float] = None):
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_experts = num_experts
        self.top_k = top_k
        self.renormalize = renormalize
        self.expert_parallel = expert_parallel
        # DeepSeekMoE group-limited routing (reference grouped_topk,
        # fused_moe/fused_moe.py): experts are split into n_group
        # groups; only the topk_group best groups (by their max expert
        # score) are eligible for the final top-k.
        self.n_group = n_group
        self.topk_group = topk_group
        self.routed_scaling_factor = routed_scaling_factor
        self.scoring_func = scoring_func  # softmax | sigmoid | sparsemixer
        self.router_jitter = router_jitter  # sparsemixer mask width
        self.act = act  # silu | gelu (Grok1, reference grok1.py:99)
        # Grok1 router logit tanh cap (reference grok1.py:108)
        self.router_logit_cap = router_logit_cap

    def param_shapes(self, dtype) -> Dict:
        h, i, e = self.hidden_size, self.intermediate_size, self.num_experts
        return {
            "router": {"weight": ((h, e), dtype)},
            "experts": {
                "w1": ((e, h, i), dtype),
                "w3": ((e, h, i), dtype),
                "w2": ((e, i, h), dtype),
            },
        }

    def partition_specs(self) -> Dict:
        if self.expert_parallel:
            experts = {
                # expert-dim sharding: each shard owns E/ep whole experts
                "w1": P(TP_AXIS, None, None),
                "w3": P(TP_AXIS, None, None),
                "w2": P(TP_AXIS, None, None),
            }
        else:
            experts = {
                # intermediate-dim sharding: column-parallel w1/w3,
                # row-parallel w2 (psum after)
                "w1": P(None, None, TP_AXIS),
                "w3": P(None, None, TP_AXIS),
                "w2": P(None, TP_AXIS, None),
            }
        return {"router": {"weight": P(None, None)}, "experts": experts}

    def __call__(self, params: Dict, x: jax.Array,
                 tp_axis: Optional[str] = TP_AXIS) -> jax.Array:
        """x [T, H] -> [T, H] (caller adds residual)."""
        t, h = x.shape
        e, k = self.num_experts, self.top_k
        w1 = params["experts"]["w1"]
        w3 = params["experts"]["w3"]
        w2 = params["experts"]["w2"]

        router_logits = jnp.dot(
            x, params["router"]["weight"],
            preferred_element_type=jnp.float32)         # [T, E]
        if self.router_logit_cap:
            cap = self.router_logit_cap
            router_logits = cap * jnp.tanh(router_logits / cap)
        if self.scoring_func == "sparsemixer":
            # Phi-3.5-MoE routing (reference models/phimoe.py
            # sparsemixer eval path): per pick, experts whose relative
            # distance from the max exceeds 2*jitter_eps are masked out
            # of the weight softmax; pick = argmax; second pick repeats
            # with the first expert removed.
            eps2 = 2.0 * self.router_jitter
            topi_l, topw_l = [], []
            scores = router_logits
            for _ in range(2):
                mx = jnp.max(scores, axis=-1, keepdims=True)
                factor = jnp.maximum(jnp.abs(router_logits), mx)
                far = ((mx - router_logits) / factor) > eps2
                masked = jnp.where(far, -jnp.inf, scores)
                sel = jnp.argmax(scores, axis=-1)
                gates = jax.nn.softmax(masked, axis=-1)
                topi_l.append(sel)
                topw_l.append(jnp.take_along_axis(
                    gates, sel[:, None], axis=1)[:, 0])
                scores = scores.at[jnp.arange(t), sel].set(-jnp.inf)
            topi = jnp.stack(topi_l, axis=1)
            topw = jnp.stack(topw_l, axis=1)
            tok_ids = jnp.repeat(jnp.arange(t, dtype=jnp.int32), 2)
            exp_ids = topi.reshape(-1).astype(jnp.int32)
            weights = topw.reshape(-1).astype(jnp.float32)
            return self._dispatch(params, x, tok_ids, exp_ids, weights,
                                  tp_axis)
        if self.scoring_func == "sigmoid":
            probs = jax.nn.sigmoid(router_logits)
        else:
            probs = jax.nn.softmax(router_logits, axis=-1)
        if self.n_group > 1:
            # group-limited routing: mask out every expert outside the
            # topk_group best groups before the final top-k
            g = probs.reshape(t, self.n_group, e // self.n_group)
            group_scores = jnp.max(g, axis=-1)          # [T, G]
            _, top_groups = jax.lax.top_k(group_scores, self.topk_group)
            gmask = jnp.zeros((t, self.n_group), bool).at[
                jnp.arange(t)[:, None], top_groups].set(True)
            probs = jnp.where(
                jnp.repeat(gmask, e // self.n_group, axis=1), probs, 0.0)
        topw, topi = jax.lax.top_k(probs, k)            # [T, K]
        if self.renormalize:
            topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
        topw = topw * self.routed_scaling_factor

        # flatten assignments and sort by expert so ragged_dot sees
        # contiguous groups
        tok_ids = jnp.repeat(jnp.arange(t, dtype=jnp.int32), k)   # [T*K]
        exp_ids = topi.reshape(-1).astype(jnp.int32)
        weights = topw.reshape(-1).astype(jnp.float32)
        return self._dispatch(params, x, tok_ids, exp_ids, weights,
                              tp_axis)

    def _dispatch(self, params: Dict, x: jax.Array, tok_ids, exp_ids,
                  weights, tp_axis) -> jax.Array:
        """Sorted ragged_dot expert compute shared by all routing
        modes."""
        t, h = x.shape
        e = self.num_experts
        w1 = params["experts"]["w1"]
        w3 = params["experts"]["w3"]
        w2 = params["experts"]["w2"]
        e_groups = e
        if self.expert_parallel and tp_axis:
            # expert-partition EP: keep only assignments to this shard's
            # E/ep local experts; foreign assignments are redirected to
            # local expert 0 with zero routing weight (finite garbage
            # times zero), psum merges shards at the end.
            ep = jax.lax.psum(1, tp_axis)
            e_loc = e // ep
            lo = jax.lax.axis_index(tp_axis) * e_loc
            local = (exp_ids >= lo) & (exp_ids < lo + e_loc)
            exp_ids = jnp.where(local, exp_ids - lo, 0)
            weights = jnp.where(local, weights, 0.0)
            e_groups = e_loc

        order = jnp.argsort(exp_ids)
        tok_s = tok_ids[order]
        w_s = weights[order]
        group_sizes = jnp.bincount(exp_ids,
                                   length=e_groups).astype(jnp.int32)

        xs = x[tok_s]                                     # [T*K, H]
        h1 = jax.lax.ragged_dot(
            xs, w1.astype(x.dtype), group_sizes,
            preferred_element_type=jnp.float32)           # [T*K, I_loc]
        h3 = jax.lax.ragged_dot(
            xs, w3.astype(x.dtype), group_sizes,
            preferred_element_type=jnp.float32)
        act_fn = (jax.nn.gelu if self.act == "gelu" else jax.nn.silu)
        act = act_fn(h1) * h3
        out = jax.lax.ragged_dot(
            act.astype(x.dtype), w2.astype(x.dtype), group_sizes,
            preferred_element_type=jnp.float32)           # [T*K, H]

        y = jnp.zeros((t, h), jnp.float32)
        y = y.at[tok_s].add(out * w_s[:, None])
        if tp_axis:
            y = jax.lax.psum(y, tp_axis)
        return y.astype(x.dtype)


def moe_ref(params: Dict, x: jax.Array, top_k: int,
            renormalize: bool = True) -> jax.Array:
    """Per-token loop oracle for tests (numpy semantics, no grouping)."""
    xf = np.asarray(x, np.float32)
    wr = np.asarray(params["router"]["weight"], np.float32)
    w1 = np.asarray(params["experts"]["w1"], np.float32)
    w3 = np.asarray(params["experts"]["w3"], np.float32)
    w2 = np.asarray(params["experts"]["w2"], np.float32)
    logits = xf @ wr
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    out = np.zeros_like(xf)
    for ti in range(xf.shape[0]):
        idx = np.argsort(-probs[ti])[:top_k]
        w = probs[ti, idx]
        if renormalize:
            w = w / w.sum()
        for ei, wi in zip(idx, w):
            gate = xf[ti] @ w1[ei]
            up = xf[ti] @ w3[ei]
            act = gate / (1 + np.exp(-gate)) * up
            out[ti] += wi * (act @ w2[ei])
    return out
