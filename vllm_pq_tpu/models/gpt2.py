"""GPT-2 decoder (role of reference ``model_executor/models/gpt2.py``):
learned positional embeddings, pre-LayerNorm with bias, fused c_attn
(split at load), GELU MLP, tied lm_head. HF stores Conv1D weights
already [in, out], so no transpose on load.
"""

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.norm import layer_norm
from vllm_pq_tpu.ops.attention import ragged_paged_attention, write_kv_cache
from vllm_pq_tpu.quantization.methods import TP_AXIS, LinearMethod


@dataclass
class GPT2Config:
    vocab_size: int = 50257
    hidden_size: int = 768
    n_inner: Optional[int] = None
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 1024
    layer_norm_epsilon: float = 1e-5
    # GPT-BigCode (Starcoder-1): MQA + nn.Linear ([out, in]) weights
    multi_query: bool = False
    activation_function: str = "gelu_new"
    hf_family: str = "gpt2"
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_key_value_heads(self) -> int:
        return 1 if self.multi_query else self.num_attention_heads

    @property
    def intermediate_size(self) -> int:
        return self.n_inner or 4 * self.hidden_size

    @classmethod
    def from_hf_config(cls, hf) -> "GPT2Config":
        return cls(
            vocab_size=hf.vocab_size,
            hidden_size=getattr(hf, "n_embd", getattr(hf, "hidden_size",
                                                      768)),
            n_inner=getattr(hf, "n_inner", None),
            num_hidden_layers=getattr(hf, "n_layer",
                                      getattr(hf, "num_hidden_layers",
                                              12)),
            num_attention_heads=getattr(hf, "n_head",
                                        getattr(hf, "num_attention_heads",
                                                12)),
            max_position_embeddings=getattr(hf, "n_positions", 1024),
            layer_norm_epsilon=getattr(hf, "layer_norm_epsilon", 1e-5),
            activation_function=getattr(hf, "activation_function",
                                        "gelu_new"),
        )


def _linear_defs(cfg: GPT2Config):
    h = cfg.hidden_size
    kv = cfg.num_key_value_heads * cfg.head_dim
    return [
        ("q_proj", h, h, "column"),
        ("k_proj", h, kv, "column"),
        ("v_proj", h, kv, "column"),
        ("c_proj", h, h, "row"),
        ("c_fc", h, cfg.intermediate_size, "column"),
        ("mlp_c_proj", cfg.intermediate_size, h, "row"),
    ]


def _ln(cfg):
    return {"weight": ((cfg.hidden_size,), cfg.dtype),
            "bias": ((cfg.hidden_size,), cfg.dtype)}


class GPT2Model:

    def __init__(self, cfg: GPT2Config, linear_method: LinearMethod,
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
        layer["ln_1"] = _ln(cfg)
        layer["ln_2"] = _ln(cfg)
        return {
            "wte": {"weight": ((cfg.vocab_size, cfg.hidden_size),
                               cfg.dtype)},
            "wpe": {"weight": ((cfg.max_position_embeddings,
                                cfg.hidden_size), cfg.dtype)},
            "layers": [dict(layer) for _ in range(cfg.num_hidden_layers)],
            "ln_f": _ln(cfg),
        }

    def param_specs(self) -> Dict:
        cfg = self.cfg
        layer = {}
        for name, _i, _o, kind in _linear_defs(cfg):
            layer[name] = self.linear_method.partition_specs(kind)
            layer[name + "_bias"] = {
                "bias": P(TP_AXIS) if kind == "column" else P(None)}
        ln = {"weight": P(None), "bias": P(None)}
        layer["ln_1"] = dict(ln)
        layer["ln_2"] = dict(ln)
        return {
            "wte": {"weight": P(TP_AXIS, None)},
            "wpe": {"weight": P(None, None)},
            "layers": [dict(layer) for _ in range(cfg.num_hidden_layers)],
            "ln_f": dict(ln),
        }

    def kv_cache_shape(self, num_pages: int, page_size: int,
                       tp_size: int = 1) -> Tuple:
        cfg = self.cfg
        kvh = max(cfg.num_key_value_heads // tp_size, 1)
        return (num_pages, page_size, 2 * kvh, cfg.head_dim)

    def kv_cache_spec(self) -> P:
        return P(None, None, TP_AXIS, None)

    def rope_cache(self, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((1, 1), dtype)  # learned positions

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
                 lora: Optional[Dict] = None, decode_mode: bool = False,
                 decode_pages=None):
        cfg = self.cfg
        tp = jax.lax.psum(1, tp_axis) if tp_axis else 1
        heads = cfg.num_attention_heads // tp
        d = cfg.head_dim
        sm_scale = 1.0 / (d**0.5)
        eps = cfg.layer_norm_epsilon

        x = self._embed(params["wte"], input_ids, tp_axis)
        x = x + params["wpe"]["weight"][positions]
        new_caches = []
        for li in range(cfg.num_hidden_layers):
            lp = params["layers"][li]
            lora_layer = lora["layers"][li] if lora is not None else None
            lora_md = ({"sorted_tok": lora["sorted_tok"],
                        "group_sizes": lora["group_sizes"]}
                       if lora is not None else None)
            h = layer_norm(x, lp["ln_1"]["weight"], lp["ln_1"]["bias"],
                           eps)
            q = self._lin(lp, "q_proj", h, lora_layer, lora_md)
            k = self._lin(lp, "k_proj", h, lora_layer, lora_md)
            v = self._lin(lp, "v_proj", h, lora_layer, lora_md)
            t = q.shape[0]
            kvh = max(cfg.num_key_value_heads // tp, 1)
            q = q.reshape(t, heads, d)
            k = k.reshape(t, kvh, d)
            v = v.reshape(t, kvh, d)
            cache = write_kv_cache(kv_caches[li], k, v,
                                   attn_md["slot_mapping"])
            new_caches.append(cache)
            attn = ragged_paged_attention(
                q, cache, attn_md["kv_lens"], attn_md["page_indices"],
                attn_md["cu_q_lens"], attn_md["num_seqs"],
                sm_scale=sm_scale, decode_mode=decode_mode,
                decode_pages=decode_pages)
            o = self._lin(lp, "c_proj", attn.reshape(t, heads * d),
                          lora_layer, lora_md)
            if tp_axis:
                o = jax.lax.psum(o, tp_axis)
            x = x + o

            h = layer_norm(x, lp["ln_2"]["weight"], lp["ln_2"]["bias"],
                           eps)
            from vllm_pq_tpu.layers.activation import ACT2FN
            h1 = ACT2FN[cfg.activation_function](
                self._lin(lp, "c_fc", h, lora_layer, lora_md))
            h2 = self._lin(lp, "mlp_c_proj", h1, lora_layer, lora_md)
            if tp_axis:
                h2 = jax.lax.psum(h2, tp_axis)
            x = x + h2

        x = layer_norm(x, params["ln_f"]["weight"], params["ln_f"]["bias"],
                       eps)
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
        w = params["wte"]["weight"]  # tied lm_head
        logits = jnp.dot(hidden, w.T, preferred_element_type=jnp.float32)
        if tp_axis:
            logits = jax.lax.all_gather(logits, tp_axis, axis=1,
                                        tiled=True)
        return logits.astype(jnp.float32)
