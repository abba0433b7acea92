"""OPT decoder (role of reference ``model_executor/models/opt.py``) —
BASELINE.md staged config #1 (opt-125m PQ greedy on CPU).

Architecturally distinct from the Llama family: learned positional
embeddings (offset by 2), pre-LayerNorm (with bias), ReLU MLP, no rope,
no GQA, tied lm_head. Shares the paged-attention machinery.
"""

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.norm import layer_norm
from vllm_pq_tpu.ops.attention import ragged_paged_attention, write_kv_cache
from vllm_pq_tpu.quantization.methods import TP_AXIS, LinearMethod

_POS_OFFSET = 2  # OPT quirk: positions are offset by 2 in the table


@dataclass
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    ffn_dim: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 2048
    do_layer_norm_before: bool = True
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_key_value_heads(self) -> int:
        return self.num_attention_heads

    @classmethod
    def from_hf_config(cls, hf) -> "OPTConfig":
        return cls(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            ffn_dim=getattr(hf, "ffn_dim", 4 * hf.hidden_size),
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            max_position_embeddings=hf.max_position_embeddings,
            do_layer_norm_before=getattr(hf, "do_layer_norm_before", True),
        )


def _linear_defs(cfg: OPTConfig):
    h = cfg.hidden_size
    return [
        ("q_proj", h, h, "column"),
        ("k_proj", h, h, "column"),
        ("v_proj", h, h, "column"),
        ("out_proj", h, h, "row"),
        ("fc1", h, cfg.ffn_dim, "column"),
        ("fc2", cfg.ffn_dim, h, "row"),
    ]


def _ln_shapes(cfg):
    return {"weight": ((cfg.hidden_size,), cfg.dtype),
            "bias": ((cfg.hidden_size,), cfg.dtype)}


class OPTModel:

    def __init__(self, cfg: OPTConfig, linear_method: LinearMethod,
                 lm_head_method: Optional[LinearMethod] = None):
        self.cfg = cfg
        self.linear_method = linear_method

    def lora_linear_defs(self):
        return _linear_defs(self.cfg)

    def param_shapes(self) -> Dict:
        cfg = self.cfg
        layer = {}
        for name, i, o, _k in _linear_defs(cfg):
            layer[name] = self.linear_method.param_shapes(i, o, cfg.dtype)
            layer[name + "_bias"] = {"bias": ((o,), cfg.dtype)}
        layer["self_attn_layer_norm"] = _ln_shapes(cfg)
        layer["final_layer_norm"] = _ln_shapes(cfg)
        return {
            "embed_tokens": {"weight": ((cfg.vocab_size, cfg.hidden_size),
                                        cfg.dtype)},
            "embed_positions": {
                "weight": ((cfg.max_position_embeddings + _POS_OFFSET,
                            cfg.hidden_size), cfg.dtype)},
            "layers": [dict(layer) for _ in range(cfg.num_hidden_layers)],
            "final_layer_norm": _ln_shapes(cfg),
        }

    def param_specs(self) -> Dict:
        cfg = self.cfg
        layer = {}
        for name, _i, _o, kind in _linear_defs(cfg):
            layer[name] = self.linear_method.partition_specs(kind)
            layer[name + "_bias"] = {
                "bias": P(TP_AXIS) if kind == "column" else P(None)}
        ln = {"weight": P(None), "bias": P(None)}
        layer["self_attn_layer_norm"] = dict(ln)
        layer["final_layer_norm"] = dict(ln)
        return {
            "embed_tokens": {"weight": P(TP_AXIS, None)},
            "embed_positions": {"weight": P(None, None)},
            "layers": [dict(layer) for _ in range(cfg.num_hidden_layers)],
            "final_layer_norm": dict(ln),
        }

    def kv_cache_shape(self, num_pages: int, page_size: int,
                       tp_size: int = 1) -> Tuple:
        cfg = self.cfg
        kvh = max(cfg.num_attention_heads // tp_size, 1)
        return (num_pages, page_size, 2 * kvh, cfg.head_dim)

    def kv_cache_spec(self) -> P:
        return P(None, None, TP_AXIS, None)

    def rope_cache(self, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((1, 1), dtype)  # unused: learned positions

    def _lin(self, lp, name, h, lora_layer, lora_md):
        y = self.linear_method.apply(lp[name], h)
        y = y + lp[name + "_bias"]["bias"]
        if lora_layer is not None and name in lora_layer:
            from vllm_pq_tpu.lora.models import lora_apply
            d = lora_layer[name]
            y = y + lora_apply(h, d["a"], d["b"], lora_md["sorted_tok"],
                               lora_md["group_sizes"])
        return y

    def __call__(self, params, input_ids, positions, kv_caches, attn_md,
                 rope_cache, *, tp_axis: Optional[str] = TP_AXIS,
                 lora: Optional[Dict] = None,
                 decode_mode: bool = False, decode_pages=None,
                 mm=None):
        cfg = self.cfg
        tp = jax.lax.psum(1, tp_axis) if tp_axis else 1
        heads = cfg.num_attention_heads // tp
        d = cfg.head_dim
        sm_scale = 1.0 / (d**0.5)

        x = self._embed(params["embed_tokens"], input_ids, tp_axis)
        x = x + params["embed_positions"]["weight"][
            positions + _POS_OFFSET]
        if mm is not None:
            # multimodal splice (BLIP-2 query tokens; same contract as
            # models/llama.py)
            mm_mask, mm_embeds = mm
            x = jnp.where(mm_mask[:, None] > 0,
                          mm_embeds.astype(x.dtype), x)
        new_caches = []
        for li in range(cfg.num_hidden_layers):
            lp = params["layers"][li]
            lora_layer = lora["layers"][li] if lora is not None else None
            lora_md = ({"sorted_tok": lora["sorted_tok"],
                        "group_sizes": lora["group_sizes"]}
                       if lora is not None else None)
            residual = x
            if cfg.do_layer_norm_before:
                x = layer_norm(x, lp["self_attn_layer_norm"]["weight"],
                               lp["self_attn_layer_norm"]["bias"])
            q = self._lin(lp, "q_proj", x, lora_layer, lora_md)
            k = self._lin(lp, "k_proj", x, lora_layer, lora_md)
            v = self._lin(lp, "v_proj", x, lora_layer, lora_md)
            t = q.shape[0]
            q = q.reshape(t, heads, d)
            k = k.reshape(t, heads, d)
            v = v.reshape(t, heads, d)
            cache = write_kv_cache(kv_caches[li], k, v,
                                   attn_md["slot_mapping"])
            new_caches.append(cache)
            attn = ragged_paged_attention(
                q, cache, attn_md["kv_lens"], attn_md["page_indices"],
                attn_md["cu_q_lens"], attn_md["num_seqs"],
                sm_scale=sm_scale, decode_mode=decode_mode,
                decode_pages=decode_pages)
            o = self._lin(lp, "out_proj", attn.reshape(t, heads * d),
                          lora_layer, lora_md)
            if tp_axis:
                o = jax.lax.psum(o, tp_axis)
            x = residual + o
            if not cfg.do_layer_norm_before:
                x = layer_norm(x, lp["self_attn_layer_norm"]["weight"],
                               lp["self_attn_layer_norm"]["bias"])

            residual = x
            if cfg.do_layer_norm_before:
                x = layer_norm(x, lp["final_layer_norm"]["weight"],
                               lp["final_layer_norm"]["bias"])
            h1 = jax.nn.relu(self._lin(lp, "fc1", x, lora_layer, lora_md))
            h2 = self._lin(lp, "fc2", h1, lora_layer, lora_md)
            if tp_axis:
                h2 = jax.lax.psum(h2, tp_axis)
            x = residual + h2
            if not cfg.do_layer_norm_before:
                x = layer_norm(x, lp["final_layer_norm"]["weight"],
                               lp["final_layer_norm"]["bias"])

        x = layer_norm(x, params["final_layer_norm"]["weight"],
                       params["final_layer_norm"]["bias"])
        return x, new_caches

    def _embed(self, ep, input_ids, tp_axis):
        w = ep["weight"]
        if not tp_axis:
            return w[input_ids]
        tp = jax.lax.psum(1, tp_axis)
        rank = jax.lax.axis_index(tp_axis)
        vocab_local = w.shape[0]
        start = rank * vocab_local
        local_ids = input_ids - start
        in_range = (local_ids >= 0) & (local_ids < vocab_local)
        local_ids = jnp.clip(local_ids, 0, vocab_local - 1)
        emb = jnp.where(in_range[:, None], w[local_ids], 0)
        return jax.lax.psum(emb, tp_axis)

    def compute_logits(self, params, hidden,
                       tp_axis: Optional[str] = TP_AXIS):
        # lm_head is tied to embed_tokens in OPT
        w = params["embed_tokens"]["weight"]
        logits = jnp.dot(hidden, w.T, preferred_element_type=jnp.float32)
        if tp_axis:
            logits = jax.lax.all_gather(logits, tp_axis, axis=1,
                                        tiled=True)
        return logits.astype(jnp.float32)
