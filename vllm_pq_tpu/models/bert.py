"""BERT-family encoder models (embeddings / cross-encoder scoring).

Role of the reference's pooling-model families (``models/bert.py``:
BertEmbeddingModel, BertForSequenceClassification — the /v1/embeddings,
score and rerank serving paths). Encoder-only: bidirectional attention
over the whole (padded) prompt, no KV cache, post-LN blocks.

TP mapping mirrors the decoder models: q/k/v and the MLP intermediate
are column-parallel, the output projections row-parallel with a psum;
embeddings and norms are replicated (the vocab table is small relative
to decoder LMs and embedding lookups here are one-shot, not per-step).
"""

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.norm import layer_norm
from vllm_pq_tpu.quantization.methods import TP_AXIS


@dataclass
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    # Roberta/XLM-Roberta: positions start at padding_idx + 1 (HF
    # create_position_ids_from_input_ids); BERT uses 0
    position_offset: int = 0
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    num_labels: int = 0          # >0: sequence-classification head
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf_config(cls, hf) -> "BertConfig":
        return cls(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            intermediate_size=hf.intermediate_size,
            max_position_embeddings=getattr(hf, "max_position_embeddings",
                                            512),
            type_vocab_size=getattr(hf, "type_vocab_size", 2),
            layer_norm_eps=getattr(hf, "layer_norm_eps", 1e-12),
            hidden_act=getattr(hf, "hidden_act", "gelu"),
        )


def _lin_shape(i, o, dtype):
    return {"weight": ((i, o), dtype), "bias": ((o,), dtype)}


def _norm_shape(h, dtype):
    return {"weight": ((h,), dtype), "bias": ((h,), dtype)}


class BertModel:
    """Stateless encoder; ``encode`` is the only forward."""

    is_encoder_only = True

    def __init__(self, cfg: BertConfig, linear_method=None):
        self.cfg = cfg

    # -- templates ----------------------------------------------------------

    def param_shapes(self) -> Dict:
        cfg = self.cfg
        h, inter, dt = cfg.hidden_size, cfg.intermediate_size, cfg.dtype
        layer = {
            "query": _lin_shape(h, h, dt),
            "key": _lin_shape(h, h, dt),
            "value": _lin_shape(h, h, dt),
            "attn_out": _lin_shape(h, h, dt),
            "attn_norm": _norm_shape(h, dt),
            "inter": _lin_shape(h, inter, dt),
            "out": _lin_shape(inter, h, dt),
            "out_norm": _norm_shape(h, dt),
        }
        shapes = {
            "word_embeddings": {"weight": ((cfg.vocab_size, h), dt)},
            "position_embeddings": {
                "weight": ((cfg.max_position_embeddings, h), dt)},
            "token_type_embeddings": {
                "weight": ((cfg.type_vocab_size, h), dt)},
            "embed_norm": _norm_shape(h, dt),
            "layers": [dict(layer) for _ in range(cfg.num_hidden_layers)],
            "pooler": _lin_shape(h, h, dt),
        }
        if cfg.num_labels:
            shapes["classifier"] = _lin_shape(h, cfg.num_labels, dt)
        return shapes

    def param_specs(self) -> Dict:
        cfg = self.cfg
        col = {"weight": P(None, TP_AXIS), "bias": P(TP_AXIS)}
        row = {"weight": P(TP_AXIS, None), "bias": P(None)}
        rep2 = {"weight": P(None, None), "bias": P(None)}
        norm = {"weight": P(None), "bias": P(None)}
        layer = {
            "query": dict(col), "key": dict(col), "value": dict(col),
            "attn_out": dict(row), "attn_norm": dict(norm),
            "inter": dict(col), "out": dict(row), "out_norm": dict(norm),
        }
        specs = {
            "word_embeddings": {"weight": P(None, None)},
            "position_embeddings": {"weight": P(None, None)},
            "token_type_embeddings": {"weight": P(None, None)},
            "embed_norm": dict(norm),
            "layers": [dict(layer) for _ in range(cfg.num_hidden_layers)],
            "pooler": dict(rep2),
        }
        if cfg.num_labels:
            specs["classifier"] = dict(rep2)
        return specs

    # -- forward ------------------------------------------------------------

    def encode(self, params: Dict, input_ids: jax.Array,
               token_type_ids: Optional[jax.Array],
               attn_mask: jax.Array,
               tp_axis: Optional[str] = TP_AXIS) -> jax.Array:
        """input_ids i32[T] (padded), attn_mask bool[T] -> hidden [T, H]."""
        from vllm_pq_tpu.layers.activation import ACT2FN
        cfg = self.cfg
        tp = jax.lax.psum(1, tp_axis) if tp_axis else 1
        heads = cfg.num_attention_heads // tp
        d = cfg.head_dim
        t = input_ids.shape[0]
        eps = cfg.layer_norm_eps
        act = ACT2FN[cfg.hidden_act]

        def lin(p, x):
            return (jnp.dot(x, p["weight"],
                            preferred_element_type=jnp.float32)
                    + p["bias"].astype(jnp.float32)).astype(x.dtype)

        def lin_row(p, x):
            # row-parallel: psum partials, add the replicated bias once
            y = jnp.dot(x, p["weight"], preferred_element_type=jnp.float32)
            if tp_axis:
                y = jax.lax.psum(y, tp_axis)
            return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)

        pos = jnp.arange(t, dtype=jnp.int32) + cfg.position_offset
        x = params["word_embeddings"]["weight"][input_ids]
        x = x + params["position_embeddings"]["weight"][pos]
        tt = (token_type_ids if token_type_ids is not None
              else jnp.zeros(t, jnp.int32))
        x = x + params["token_type_embeddings"]["weight"][tt]
        en = params["embed_norm"]
        x = layer_norm(x, en["weight"], en["bias"], eps)

        neg = jnp.asarray(-1e30, jnp.float32)
        mask_bias = jnp.where(attn_mask[None, :], 0.0, neg)  # [1, T]
        scale = 1.0 / np.sqrt(d)

        for lp in params["layers"]:
            q = lin(lp["query"], x).reshape(t, heads, d)
            k = lin(lp["key"], x).reshape(t, heads, d)
            v = lin(lp["value"], x).reshape(t, heads, d)
            scores = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                                k.astype(jnp.float32)) * scale
            scores = scores + mask_bias[None, :, :]
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("hqk,khd->qhd", probs.astype(v.dtype), v)
            ctx = ctx.reshape(t, heads * d)
            a = lin_row(lp["attn_out"], ctx)
            an = lp["attn_norm"]
            x = layer_norm(x + a, an["weight"], an["bias"], eps)
            i = act(lin(lp["inter"], x).astype(jnp.float32)).astype(x.dtype)
            o = lin_row(lp["out"], i)
            on = lp["out_norm"]
            x = layer_norm(x + o, on["weight"], on["bias"], eps)
        return x

    def pool(self, params: Dict, hidden: jax.Array) -> jax.Array:
        """HF BertPooler: tanh(dense(hidden[CLS]))."""
        p = params["pooler"]
        return jnp.tanh(jnp.dot(hidden[0], p["weight"],
                                preferred_element_type=jnp.float32)
                        + p["bias"].astype(jnp.float32))

    def classify(self, params: Dict, hidden: jax.Array) -> jax.Array:
        """Sequence-classification logits from the pooled [CLS]."""
        pooled = self.pool(params, hidden)
        c = params["classifier"]
        return (jnp.dot(pooled, c["weight"],
                        preferred_element_type=jnp.float32)
                + c["bias"].astype(jnp.float32))
