"""Pipeline parallelism: GPipe-style microbatched inference forward
over a "pipe" mesh axis (role of reference PP — ``_PP`` group +
layer-range partitioning + send/recv between stages,
``distributed/parallel_state.py:925-935,546,602`` — rebuilt TPU-first).

Instead of point-to-point NCCL sends between worker processes, the
whole pipeline is ONE jitted SPMD program under ``shard_map``:

- per-layer params and KV caches are STACKED on a leading layer dim and
  sharded over the "pipe" axis, so each shard materializes only its
  L/S layers (weights and KV both);
- the token batch is pre-packed into M microbatches (each with its own
  ragged-attention metadata, split by sequence);
- the schedule is the classic (M + S - 1)-tick wavefront: at tick t,
  stage s works on microbatch (t - s); hidden states hop stages via
  ``lax.ppermute`` (XLA turns this into an ICI neighbor transfer —
  the analog of the reference's ``send_tensor_dict``/``recv_tensor_dict``);
- inactive (bubble) ticks compute on garbage but their KV writes are
  redirected to the reserved null page 0 and their outputs masked, so
  results are exact;
- composes with TP: mesh ("data", "pipe", "model"), attention/MLP
  internals still shard over "model".

The bubble fraction is (S-1)/(M+S-1); V1's batch-queue bubble
elimination (reference ``v1/engine/core.py:78-88``) maps onto keeping
M >= S via the scheduler's token budget.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

PIPE_AXIS = "pipe"


def stack_layer_params(params: Dict) -> Dict:
    """[{layer0}, {layer1}, ...] -> one pytree with leading layer dim
    (requires homogeneous layers, true for all our decoder families)."""
    layers = params["layers"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers_stacked"] = stacked
    return out


def stacked_param_specs(model) -> Dict:
    """Partition specs for the stacked tree: prepend the pipe axis to
    every per-layer leaf spec."""
    specs = model.param_specs()
    layer0 = specs["layers"][0]
    stacked = jax.tree.map(lambda s: P(PIPE_AXIS, *s), layer0,
                           is_leaf=lambda v: isinstance(v, P))
    out = {k: v for k, v in specs.items() if k != "layers"}
    out["layers_stacked"] = stacked
    return out


def stacked_kv_spec(model) -> P:
    return P(PIPE_AXIS, *model.kv_cache_spec())


def pipelined_forward(
    model,
    params: Dict,            # with "layers_stacked" (local [L/S, ...])
    mb_inputs: Dict,         # every leaf has leading microbatch dim M
    kv_stacked: jax.Array,   # local [L/S, Pg, ps, 2KVH_l, D]
    rope_cache: jax.Array,
    *,
    pp: int,
    block_size: int = 16,
    pipe_axis: str = PIPE_AXIS,
    tp_axis: Optional[str] = "model",
    decode_mode: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Per-shard body (call under shard_map). Returns
    (hidden [M, Tm, H] — valid on every shard, new kv_stacked local).

    mb_inputs leaves: token_ids/positions/slot_mapping [M, Tm],
    kv_lens [M, s], page_indices [M, s, pages], cu_q_lens [M, s+1],
    num_seqs [M, 1].
    """
    cfg = model.cfg
    assert not cfg.sliding_window_pattern, \
        "per-layer window patterns need static layer ids; not under PP yet"
    sid = jax.lax.axis_index(pipe_axis)
    tp = jax.lax.psum(1, tp_axis) if tp_axis else 1
    heads = cfg.num_attention_heads // tp
    kv_heads = cfg.num_key_value_heads // tp
    sm_scale = 1.0 / ((cfg.query_pre_attn_scalar or cfg.head_dim)**0.5)
    norm = model.make_norm()

    M = mb_inputs["token_ids"].shape[0]
    tm = mb_inputs["token_ids"].shape[1]
    l_loc = kv_stacked.shape[0]
    ticks = M + pp - 1

    h_in = jnp.zeros((tm, cfg.hidden_size),
                     params["embed_tokens"]["weight"].dtype)
    out = jnp.zeros((M, tm, cfg.hidden_size), jnp.float32)
    caches = kv_stacked
    is_first = (sid == 0)
    is_last = (sid == pp - 1)

    for t in range(ticks):
        mb_i = t - sid                                  # traced
        active = (mb_i >= 0) & (mb_i < M)
        mb = jnp.clip(mb_i, 0, M - 1)
        inp = jax.tree.map(lambda a: a[mb], mb_inputs)

        # stage 0 embeds its microbatch; later stages take the hop-in
        x0 = model._embed(params["embed_tokens"], inp["token_ids"],
                          tp_axis)
        if cfg.embed_scale is not None:
            x0 = x0 * jnp.asarray(cfg.embed_scale, x0.dtype)
        x = jnp.where(is_first, x0, h_in.astype(x0.dtype))

        # bubble ticks park their KV writes on the reserved null page 0
        slots = jnp.where(active, inp["slot_mapping"],
                          jnp.arange(tm, dtype=jnp.int32) % block_size)
        attn_md = {
            "slot_mapping": slots,
            "kv_lens": inp["kv_lens"],
            "page_indices": inp["page_indices"],
            "cu_q_lens": inp["cu_q_lens"],
            "num_seqs": inp["num_seqs"],
        }

        new_layers = []
        for li in range(l_loc):
            lp = jax.tree.map(lambda a: a[li],
                              params["layers_stacked"])
            x, cache = model.decoder_layer(
                lp, 0, x, inp["positions"], caches[li], attn_md,
                rope_cache, tp_axis=tp_axis, lora_layer=None,
                lora_md=None, decode_mode=decode_mode, norm=norm,
                heads=heads, kv_heads=kv_heads, sm_scale=sm_scale)
            new_layers.append(cache)
        caches = jnp.stack(new_layers)

        # last stage: final norm + collect its finished microbatch
        normed = norm(x, params["norm"]).astype(jnp.float32)
        contrib = jnp.where(active & is_last, 1.0, 0.0)
        out = out.at[mb].add(normed * contrib)

        # hop hidden to the next stage (stage 0 receives zeros)
        h_in = jax.lax.ppermute(
            x.astype(h_in.dtype), pipe_axis,
            [(i, i + 1) for i in range(pp - 1)])

    # replicate the last stage's result to every pipe shard
    out = jax.lax.psum(out * jnp.where(is_last, 1.0, 0.0), pipe_axis)
    return out, caches


def build_pipeline_forward(model, mesh: Mesh, *, block_size: int = 16,
                           decode_mode=False):
    """Jit a pipelined forward over ``mesh`` (axes must include "pipe"
    and "model"). Returns fn(params_stacked, kv_stacked, rope,
    mb_inputs) -> (hidden [M, Tm, H] replicated, new kv_stacked)."""
    pp = mesh.shape[PIPE_AXIS]
    p_specs = stacked_param_specs(model)
    kv_spec = stacked_kv_spec(model)

    def fn(params, kv, rope, mb_inputs):
        return pipelined_forward(model, params, mb_inputs, kv, rope,
                                 pp=pp, block_size=block_size,
                                 decode_mode=decode_mode)

    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(p_specs, kv_spec, P(), P()),
        out_specs=(P(), kv_spec),
        check_vma=False)
    return jax.jit(mapped), p_specs, kv_spec


def shard_stacked(mesh: Mesh, params_stacked: Dict, p_specs: Dict,
                  kv_stacked, kv_spec):
    put = lambda a, s: jax.device_put(a, NamedSharding(mesh, s))
    params = jax.tree.map(put, params_stacked, p_specs,
                          is_leaf=lambda v: isinstance(v, jax.Array))
    return params, put(kv_stacked, kv_spec)
