"""Snowflake Arctic — role of reference
``model_executor/models/arctic.py``.

Dense-MoE hybrid: on MoE layers (``(li+1) % moe_layer_frequency == 0``)
with ``use_residual``, the layer runs a PARALLEL pair of branches after
attention — a dense ``residual_mlp`` (SwiGLU at ffn_dim=hidden) over the
post-attention state, and the routed MoE over the PRE-attention input —
summed together onto the attention residual (reference
arctic.py:338-352). Non-MoE layers are standard sequential SwiGLU.
"""

from typing import Dict, Optional

import jax
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.norm import rms_norm
from vllm_pq_tpu.models.mixtral import MixtralConfig, MixtralModel
from vllm_pq_tpu.quantization.methods import TP_AXIS


class ArcticConfig(MixtralConfig):
    pass


class ArcticModel(MixtralModel):

    def __init__(self, cfg, linear_method, moe_layer_frequency: int = 2,
                 use_residual: bool = True, expert_parallel: bool = False):
        super().__init__(cfg, linear_method,
                         expert_parallel=expert_parallel)
        self.moe_layer_frequency = moe_layer_frequency
        self.use_residual = use_residual

    def is_moe(self, li: int) -> bool:
        return (li + 1) % self.moe_layer_frequency == 0

    def _mlp(self, lp, h, tp_axis, lora_layer=None, lora_md=None):
        # dense sequential layers use the plain SwiGLU path; MoE layers
        # route (non-residual MoE layers only — the residual pair is
        # handled in decoder_layer)
        if "moe" in lp:
            return self.moe(lp["moe"], h, tp_axis)
        from vllm_pq_tpu.models.llama import LlamaModel
        return LlamaModel._mlp(self, lp, h, tp_axis, lora_layer, lora_md)

    def param_shapes(self) -> Dict:
        cfg = self.cfg
        dt = cfg.dtype
        shapes = super().param_shapes()
        h = cfg.hidden_size
        inter = cfg.intermediate_size
        lm = self.linear_method
        for li, layer in enumerate(shapes["layers"]):
            if not self.is_moe(li):
                # dense sequential layer: plain SwiGLU MLP
                del layer["moe"]
                layer["gate_proj"] = lm.param_shapes(h, inter, dt)
                layer["up_proj"] = lm.param_shapes(h, inter, dt)
                layer["down_proj"] = lm.param_shapes(inter, h, dt)
            elif self.use_residual:
                layer["residual_layernorm"] = self._norm_shape()
                # residual dense SwiGLU at ffn_dim = hidden
                layer["residual_gate_proj"] = lm.param_shapes(h, h, dt)
                layer["residual_up_proj"] = lm.param_shapes(h, h, dt)
                layer["residual_down_proj"] = lm.param_shapes(h, h, dt)
        return shapes

    def param_specs(self) -> Dict:
        cfg = self.cfg
        specs = super().param_specs()
        lm = self.linear_method
        norm_spec = {k: P(None) for k in self._norm_shape()}
        for li, layer in enumerate(specs["layers"]):
            if not self.is_moe(li):
                del layer["moe"]
                layer["gate_proj"] = lm.partition_specs("column")
                layer["up_proj"] = lm.partition_specs("column")
                layer["down_proj"] = lm.partition_specs("row")
            elif self.use_residual:
                layer["residual_layernorm"] = dict(norm_spec)
                layer["residual_gate_proj"] = lm.partition_specs("column")
                layer["residual_up_proj"] = lm.partition_specs("column")
                layer["residual_down_proj"] = lm.partition_specs("row")
        return specs

    def decoder_layer(self, lp, li, x, positions, kv_cache, attn_md,
                      rope_cache, *, tp_axis, lora_layer, lora_md,
                      decode_mode, norm, heads, kv_heads, sm_scale,
                      decode_pages=None):
        if not (self.is_moe(li) and self.use_residual):
            return super().decoder_layer(
                lp, li, x, positions, kv_cache, attn_md, rope_cache,
                tp_axis=tp_axis, lora_layer=lora_layer, lora_md=lora_md,
                decode_mode=decode_mode, decode_pages=decode_pages,
                norm=norm, heads=heads, kv_heads=kv_heads,
                sm_scale=sm_scale)
        cfg = self.cfg
        residual_input = x
        # attention (reuse the parent attention math by running the
        # parent layer with the MLP suppressed is not possible — inline
        # the standard attention block)
        x1, cache = self._attention_block(
            lp, li, x, positions, kv_cache, attn_md, rope_cache,
            tp_axis=tp_axis, lora_layer=lora_layer, lora_md=lora_md,
            decode_mode=decode_mode, decode_pages=decode_pages,
            norm=norm, heads=heads, kv_heads=kv_heads, sm_scale=sm_scale)

        # parallel pair: dense residual MLP over ln(x1), routed MoE over
        # ln(residual_input) — both partial sums joined before one psum
        h_r = norm(x1, lp["residual_layernorm"])
        import jax.numpy as jnp
        from vllm_pq_tpu.layers.activation import ACT2FN
        act = ACT2FN[cfg.hidden_act]

        def lin(name, v):
            return self.linear_method.apply(lp[name], v)

        gate = lin("residual_gate_proj", h_r)
        up = lin("residual_up_proj", h_r)
        r = lin("residual_down_proj",
                (act(gate.astype(jnp.float32))
                 * up.astype(jnp.float32)).astype(x.dtype))

        h_m = norm(residual_input, lp["post_attention_layernorm"])
        m = self.moe(lp["moe"], h_m, tp_axis=None)
        s = r + m.astype(r.dtype)
        if tp_axis:
            s = jax.lax.psum(s, tp_axis)
        return x1 + s, cache

    def _attention_block(self, lp, li, x, positions, kv_cache, attn_md,
                         rope_cache, *, tp_axis, lora_layer, lora_md,
                         decode_mode, decode_pages, norm, heads,
                         kv_heads, sm_scale):
        """x -> (x + attn(ln1 x), cache) — the parent decoder_layer's
        attention half (reference ArcticAttention + residual)."""
        from vllm_pq_tpu.layers.rotary import apply_rope
        from vllm_pq_tpu.ops.attention import (ragged_paged_attention,
                                               write_kv_cache)
        import jax.numpy as jnp
        cfg = self.cfg
        d = cfg.head_dim
        h = norm(x, lp["input_layernorm"])
        q = self._lin(lp, "q_proj", h, lora_layer, lora_md)
        k = self._lin(lp, "k_proj", h, lora_layer, lora_md)
        v = self._lin(lp, "v_proj", h, lora_layer, lora_md)
        t = q.shape[0]
        q = q.reshape(t, heads, d)
        k = k.reshape(t, kv_heads, d)
        v = v.reshape(t, kv_heads, d)
        q, k = apply_rope(q, k, positions, rope_cache, cfg.rope_style)
        cache = write_kv_cache(kv_cache, k, v, attn_md["slot_mapping"])
        attn = ragged_paged_attention(
            q, cache, attn_md["kv_lens"], attn_md["page_indices"],
            attn_md["cu_q_lens"], attn_md["num_seqs"],
            sm_scale=sm_scale, sliding_window=self.layer_window(li),
            soft_cap=cfg.attn_logit_softcap, decode_mode=decode_mode,
            decode_pages=decode_pages)
        attn = attn.reshape(t, heads * d)
        o = self._lin(lp, "o_proj", attn, lora_layer, lora_md)
        if tp_axis:
            o = jax.lax.psum(o, tp_axis)
        return x + o, cache
