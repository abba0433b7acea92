"""BART encoder-decoder text model — role of reference
``model_executor/models/bart.py``.

Same serving design as Whisper (models/whisper.py): the encoder runs
ONCE per request as its own jitted function (token ids in, states
out), states are cached per batch row, and the decoder runs the normal
paged-KV step with an extra cross-attention over the row's encoder
states. Architectural deltas vs Whisper: token (not conv/mel) encoder
input, LEARNED positions with BART's +2 offset, optional sqrt(d)
embedding scale, a layernorm_embedding after embed+pos, POST-layernorm
blocks, k_proj bias, and no final decoder norm.

API: the encoder prompt rides ``multi_modal_data={"encoder": [ids]}``
(the reference's ExplicitEncoderDecoderPrompt role);
``prompt_token_ids`` is the decoder prompt (start it with
``decoder_start_token_id``).
"""

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.norm import layer_norm
from vllm_pq_tpu.ops.attention import (ragged_paged_attention,
                                       write_kv_cache)


def _lin(i, o, dt, bias=True):
    d = {"weight": ((i, o), dt)}
    if bias:
        d["bias"] = ((o,), dt)
    return d


def _ln(d, dt):
    return {"weight": ((d,), dt), "bias": ((d,), dt)}


@dataclass
class BartConfig:
    vocab_size: int = 50265
    d_model: int = 768
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_attention_heads: int = 12
    decoder_attention_heads: int = 12
    encoder_ffn_dim: int = 3072
    decoder_ffn_dim: int = 3072
    max_position_embeddings: int = 1024
    activation_function: str = "gelu"
    scale_embedding: bool = False
    dtype: str = "float32"

    @classmethod
    def from_hf_config(cls, hf) -> "BartConfig":
        return cls(
            vocab_size=hf.vocab_size,
            d_model=hf.d_model,
            encoder_layers=hf.encoder_layers,
            decoder_layers=hf.decoder_layers,
            encoder_attention_heads=hf.encoder_attention_heads,
            decoder_attention_heads=hf.decoder_attention_heads,
            encoder_ffn_dim=hf.encoder_ffn_dim,
            decoder_ffn_dim=hf.decoder_ffn_dim,
            max_position_embeddings=hf.max_position_embeddings,
            activation_function=getattr(hf, "activation_function",
                                        "gelu"),
            scale_embedding=getattr(hf, "scale_embedding", False),
        )

    @property
    def head_dim(self) -> int:
        return self.d_model // self.decoder_attention_heads

    @property
    def num_hidden_layers(self) -> int:
        return self.decoder_layers

    @property
    def num_key_value_heads(self) -> int:
        return self.decoder_attention_heads

    @property
    def num_attention_heads(self) -> int:
        return self.decoder_attention_heads

    @property
    def hidden_size(self) -> int:
        return self.d_model


class BartModel:

    is_encoder_decoder = True

    def __init__(self, cfg: BartConfig, linear_method=None):
        self.cfg = cfg

    def _attn_shapes(self, dt):
        d = self.cfg.d_model
        return {
            "q_proj": _lin(d, d, dt), "k_proj": _lin(d, d, dt),
            "v_proj": _lin(d, d, dt), "out_proj": _lin(d, d, dt),
        }

    def param_shapes(self) -> Dict:
        cfg = self.cfg
        dt = cfg.dtype
        d = cfg.d_model
        enc_layer = {
            "self_attn": self._attn_shapes(dt),
            "self_attn_layer_norm": _ln(d, dt),
            "fc1": _lin(d, cfg.encoder_ffn_dim, dt),
            "fc2": _lin(cfg.encoder_ffn_dim, d, dt),
            "final_layer_norm": _ln(d, dt),
        }
        dec_layer = {
            "self_attn": self._attn_shapes(dt),
            "self_attn_layer_norm": _ln(d, dt),
            "encoder_attn": self._attn_shapes(dt),
            "encoder_attn_layer_norm": _ln(d, dt),
            "fc1": _lin(d, cfg.decoder_ffn_dim, dt),
            "fc2": _lin(cfg.decoder_ffn_dim, d, dt),
            "final_layer_norm": _ln(d, dt),
        }
        return {
            "embed_tokens": {"weight": ((cfg.vocab_size, d), dt)},
            "encoder": {
                # +2: BartLearnedPositionalEmbedding offset
                "embed_positions": {
                    "weight": ((cfg.max_position_embeddings + 2, d),
                               dt)},
                "layernorm_embedding": _ln(d, dt),
                "layers": [dict(enc_layer)
                           for _ in range(cfg.encoder_layers)],
            },
            "embed_positions": {
                "weight": ((cfg.max_position_embeddings + 2, d), dt)},
            "layernorm_embedding": _ln(d, dt),
            "layers": [dict(dec_layer)
                       for _ in range(cfg.decoder_layers)],
            "final_logits_bias": {"weight": ((cfg.vocab_size,), dt)},
        }

    def param_specs(self) -> Dict:
        return jax.tree.map(
            lambda _: P(), self.param_shapes(),
            is_leaf=lambda v: isinstance(v, tuple) and len(v) == 2
            and isinstance(v[0], tuple))

    def kv_cache_shape(self, num_pages: int, page_size: int,
                       tp_size: int = 1) -> Tuple:
        cfg = self.cfg
        return (num_pages, page_size, 2 * cfg.decoder_attention_heads,
                cfg.head_dim)

    def kv_cache_spec(self) -> P:
        return P(None, None, None, None)

    def rope_cache(self, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((1, 2), dtype)  # unused: learned positions

    def lora_linear_defs(self):
        return []

    def _act(self, x):
        from vllm_pq_tpu.layers.activation import ACT2FN
        return ACT2FN[self.cfg.activation_function](x)

    def _scale(self):
        return (self.cfg.d_model ** 0.5 if self.cfg.scale_embedding
                else 1.0)

    # -- encoder ------------------------------------------------------------

    def encode_encoder_input(self, params: Dict,
                             ids: jax.Array) -> jax.Array:
        """token ids i32[L] -> encoder states [L, d] (post-LN BART
        encoder, HF BartEncoder.forward)."""
        cfg = self.cfg
        ids = ids.astype(jnp.int32)
        x = params["embed_tokens"]["weight"][ids] * jnp.asarray(
            self._scale(), cfg.dtype)
        return self.encode_from_embeds(params, x)

    def encode_from_embeds(self, params: Dict,
                           x: jax.Array) -> jax.Array:
        """embeddings [L, d] -> encoder states [L, d] (the multimodal
        entry: Florence-2 prepends DaViT image tokens to the text
        embeds before positions are added)."""
        cfg = self.cfg
        ep = params["encoder"]
        eps = 1e-5
        n = x.shape[0]
        x = x + ep["embed_positions"]["weight"][2:2 + n]
        x = layer_norm(x, ep["layernorm_embedding"]["weight"],
                       ep["layernorm_embedding"]["bias"], eps)

        heads = cfg.encoder_attention_heads
        hd = cfg.d_model // heads
        scale = hd ** -0.5

        def lin(p, u):
            y = jnp.dot(u, p["weight"],
                        preferred_element_type=jnp.float32)
            if "bias" in p:
                y = y + p["bias"].astype(jnp.float32)
            return y.astype(u.dtype)

        for lp in ep["layers"]:
            ap = lp["self_attn"]
            q = (lin(ap["q_proj"], x) * scale).reshape(n, heads, hd)
            k = lin(ap["k_proj"], x).reshape(n, heads, hd)
            v = lin(ap["v_proj"], x).reshape(n, heads, hd)
            sc = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            k.astype(jnp.float32))
            p2 = jax.nn.softmax(sc, axis=-1)
            ctx = jnp.einsum("hqk,khd->qhd", p2.astype(v.dtype), v)
            x = x + lin(ap["out_proj"], ctx.reshape(n, heads * hd))
            x = layer_norm(x, lp["self_attn_layer_norm"]["weight"],
                           lp["self_attn_layer_norm"]["bias"], eps)
            h = self._act(lin(lp["fc1"], x).astype(jnp.float32)) \
                .astype(x.dtype)
            x = x + lin(lp["fc2"], h)
            x = layer_norm(x, lp["final_layer_norm"]["weight"],
                           lp["final_layer_norm"]["bias"], eps)
        return x

    # -- decoder ------------------------------------------------------------

    def __call__(self, params, input_ids, positions, kv_caches, attn_md,
                 rope_cache, *, tp_axis=None, lora=None,
                 decode_mode: bool = False, decode_pages=None,
                 mm=None) -> Tuple[jax.Array, List[jax.Array]]:
        cfg = self.cfg
        t = input_ids.shape[0]
        eps = 1e-5
        heads = cfg.decoder_attention_heads
        hd = cfg.head_dim
        scale = hd ** -0.5
        enc_states = attn_md["enc_states"]     # [S, L_enc, d]
        enc_lens = attn_md["enc_lens"]         # i32[S]
        s, l_enc, _ = enc_states.shape

        cu = attn_md["cu_q_lens"]
        tok = jnp.arange(t, dtype=jnp.int32)
        seq_of_tok = jnp.sum((tok[None, :] >= cu[1:][:, None])
                             .astype(jnp.int32), axis=0)
        seq_of_tok = jnp.minimum(seq_of_tok, s - 1)
        if decode_mode:
            seq_of_tok = jnp.minimum(tok, s - 1)

        def lin(p, u):
            y = jnp.dot(u, p["weight"],
                        preferred_element_type=jnp.float32)
            if "bias" in p:
                y = y + p["bias"].astype(jnp.float32)
            return y.astype(u.dtype)

        x = params["embed_tokens"]["weight"][input_ids] * jnp.asarray(
            self._scale(), cfg.dtype)
        x = x + params["embed_positions"]["weight"][positions + 2]
        x = layer_norm(x, params["layernorm_embedding"]["weight"],
                       params["layernorm_embedding"]["bias"], eps)

        enc_tok = enc_states[seq_of_tok]       # [T, L_enc, d]
        enc_mask = (jnp.arange(l_enc)[None, :]
                    < enc_lens[seq_of_tok][:, None])

        new_caches = []
        for li, lp in enumerate(params["layers"]):
            ap = lp["self_attn"]
            q = lin(ap["q_proj"], x).reshape(t, heads, hd)
            k = lin(ap["k_proj"], x).reshape(t, heads, hd)
            v = lin(ap["v_proj"], x).reshape(t, heads, hd)
            cache = write_kv_cache(kv_caches[li], k, v,
                                   attn_md["slot_mapping"])
            attn = ragged_paged_attention(
                q, cache, attn_md["kv_lens"], attn_md["page_indices"],
                attn_md["cu_q_lens"], attn_md["num_seqs"],
                sm_scale=scale, decode_mode=decode_mode,
                decode_pages=decode_pages)
            new_caches.append(cache)
            x = x + lin(ap["out_proj"], attn.reshape(t, heads * hd))
            x = layer_norm(x, lp["self_attn_layer_norm"]["weight"],
                           lp["self_attn_layer_norm"]["bias"], eps)

            cp = lp["encoder_attn"]
            q = (lin(cp["q_proj"], x) * scale).reshape(t, heads, hd)
            ek = lin(cp["k_proj"], enc_tok).reshape(t, l_enc, heads, hd)
            ev = lin(cp["v_proj"], enc_tok).reshape(t, l_enc, heads, hd)
            sc = jnp.einsum("thd,tlhd->thl", q.astype(jnp.float32),
                            ek.astype(jnp.float32))
            sc = jnp.where(enc_mask[:, None, :], sc, -1e30)
            p2 = jax.nn.softmax(sc, axis=-1)
            ctx = jnp.einsum("thl,tlhd->thd", p2.astype(ev.dtype), ev)
            x = x + lin(cp["out_proj"], ctx.reshape(t, heads * hd))
            x = layer_norm(x, lp["encoder_attn_layer_norm"]["weight"],
                           lp["encoder_attn_layer_norm"]["bias"], eps)

            h = self._act(lin(lp["fc1"], x).astype(jnp.float32)) \
                .astype(x.dtype)
            x = x + lin(lp["fc2"], h)
            x = layer_norm(x, lp["final_layer_norm"]["weight"],
                           lp["final_layer_norm"]["bias"], eps)
        return x, new_caches

    def compute_logits(self, params, hidden, tp_axis=None) -> jax.Array:
        # tied lm_head + final_logits_bias (HF
        # BartForConditionalGeneration.forward)
        w = params["embed_tokens"]["weight"]
        return (jnp.dot(hidden, w.T,
                        preferred_element_type=jnp.float32)
                + params["final_logits_bias"]["weight"]
                .astype(jnp.float32))
