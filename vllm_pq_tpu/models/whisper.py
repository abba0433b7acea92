"""Whisper encoder-decoder (role of reference ``models/whisper.py`` —
the encoder-decoder + cross-attention-KV family).

- audio encoder: two conv1d stems (stride 1 then 2) + fixed sinusoidal
  positions + bidirectional pre-LN blocks; run ONCE per request (the
  encoder output is cached host-side and kept device-resident per batch
  row, the role of the reference's encoder cache + cross-attn KV);
- decoder: learned positional embeddings, causal self-attention over the
  paged KV cache (the standard serving path), plus per-layer
  cross-attention over the request's encoder states;
- Whisper specifics mirrored from HF: k_proj has no bias anywhere, the
  query is pre-scaled by head_dim^-0.5, gelu MLPs, tied proj_out.
"""

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.norm import layer_norm
from vllm_pq_tpu.ops.attention import ragged_paged_attention, \
    write_kv_cache


@dataclass
class WhisperConfig:
    vocab_size: int = 51865
    d_model: int = 384
    encoder_layers: int = 4
    encoder_attention_heads: int = 6
    decoder_layers: int = 4
    decoder_attention_heads: int = 6
    encoder_ffn_dim: int = 1536
    decoder_ffn_dim: int = 1536
    num_mel_bins: int = 80
    max_source_positions: int = 1500
    max_target_positions: int = 448
    dtype: Any = jnp.float32

    @property
    def head_dim(self):
        return self.d_model // self.decoder_attention_heads

    # engine-compat aliases (scheduler/runner read these)
    @property
    def num_hidden_layers(self):
        return self.decoder_layers

    @property
    def hidden_size(self):
        return self.d_model

    @property
    def num_attention_heads(self):
        return self.decoder_attention_heads

    @property
    def num_key_value_heads(self):
        return self.decoder_attention_heads

    @classmethod
    def from_hf_config(cls, hf) -> "WhisperConfig":
        return cls(
            vocab_size=hf.vocab_size,
            d_model=getattr(hf, "d_model", 384),
            encoder_layers=getattr(hf, "encoder_layers", 4),
            encoder_attention_heads=getattr(hf, "encoder_attention_heads",
                                            6),
            decoder_layers=getattr(hf, "decoder_layers", 4),
            decoder_attention_heads=getattr(hf, "decoder_attention_heads",
                                            6),
            encoder_ffn_dim=getattr(hf, "encoder_ffn_dim", 1536),
            decoder_ffn_dim=getattr(hf, "decoder_ffn_dim", 1536),
            num_mel_bins=getattr(hf, "num_mel_bins", 80),
            max_source_positions=getattr(hf, "max_source_positions",
                                         1500),
            max_target_positions=getattr(hf, "max_target_positions", 448),
        )


def _lin(i, o, dt, bias=True):
    d = {"weight": ((i, o), dt)}
    if bias:
        d["bias"] = ((o,), dt)
    return d


def _ln(n, dt):
    return {"weight": ((n,), dt), "bias": ((n,), dt)}


class WhisperModel:

    is_encoder_decoder = True

    def __init__(self, cfg: WhisperConfig, linear_method=None):
        self.cfg = cfg

    # -- templates ----------------------------------------------------------

    def _attn_shapes(self, dt):
        d = self.cfg.d_model
        return {
            "q_proj": _lin(d, d, dt), "k_proj": _lin(d, d, dt, False),
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
            "encoder": {
                "conv1": {"weight": ((cfg.num_mel_bins, 3, d), dt),
                          "bias": ((d,), dt)},
                "conv2": {"weight": ((d, 3, d), dt), "bias": ((d,), dt)},
                "embed_positions": {
                    "weight": ((cfg.max_source_positions, d), dt)},
                "layers": [dict(enc_layer)
                           for _ in range(cfg.encoder_layers)],
                "layer_norm": _ln(d, dt),
            },
            "embed_tokens": {"weight": ((cfg.vocab_size, d), dt)},
            "embed_positions": {
                "weight": ((cfg.max_target_positions, d), dt)},
            "layers": [dict(dec_layer) for _ in range(cfg.decoder_layers)],
            "norm": _ln(d, dt),
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

    # -- encoder ------------------------------------------------------------

    def encode_encoder_input(self, params: Dict, mel: jax.Array) -> jax.Array:
        """mel [num_mel_bins, frames] -> encoder states [frames/2, d]."""
        cfg = self.cfg
        ep = params["encoder"]

        def conv(p, x, stride):
            # x [C_in, T] -> [C_out, T/stride]; weight [C_in, 3, C_out]
            return jax.lax.conv_general_dilated(
                x[None], p["weight"], window_strides=(stride,),
                padding=((1, 1),),
                dimension_numbers=("NCH", "IHO", "NCH"))[0] \
                + p["bias"][:, None]

        x = jax.nn.gelu(conv(ep["conv1"], mel.astype(cfg.dtype), 1),
                        approximate=False)
        x = jax.nn.gelu(conv(ep["conv2"], x, 2), approximate=False)
        x = x.T                                        # [T/2, d]
        n = x.shape[0]
        x = x + ep["embed_positions"]["weight"][:n]
        eps = 1e-5
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
            h = layer_norm(x, lp["self_attn_layer_norm"]["weight"],
                           lp["self_attn_layer_norm"]["bias"], eps)
            ap = lp["self_attn"]
            q = (lin(ap["q_proj"], h) * scale).reshape(n, heads, hd)
            k = lin(ap["k_proj"], h).reshape(n, heads, hd)
            v = lin(ap["v_proj"], h).reshape(n, heads, hd)
            sc = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            k.astype(jnp.float32))
            p2 = jax.nn.softmax(sc, axis=-1)
            ctx = jnp.einsum("hqk,khd->qhd", p2.astype(v.dtype), v)
            x = x + lin(ap["out_proj"], ctx.reshape(n, heads * hd))
            h = layer_norm(x, lp["final_layer_norm"]["weight"],
                           lp["final_layer_norm"]["bias"], eps)
            h = jax.nn.gelu(lin(lp["fc1"], h).astype(jnp.float32),
                            approximate=False).astype(x.dtype)
            x = x + lin(lp["fc2"], h)
        return layer_norm(x, ep["layer_norm"]["weight"],
                          ep["layer_norm"]["bias"], eps)

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

        # flat token -> batch row (cross-attention operand selection)
        cu = attn_md["cu_q_lens"]
        tok = jnp.arange(t, dtype=jnp.int32)
        seq_of_tok = jnp.sum((tok[None, :] >= cu[1:][:, None])
                             .astype(jnp.int32), axis=0)
        seq_of_tok = jnp.minimum(seq_of_tok, s - 1)
        if decode_mode:
            seq_of_tok = jnp.minimum(tok, s - 1)  # row-aligned decode

        def lin(p, u):
            y = jnp.dot(u, p["weight"],
                        preferred_element_type=jnp.float32)
            if "bias" in p:
                y = y + p["bias"].astype(jnp.float32)
            return y.astype(u.dtype)

        x = params["embed_tokens"]["weight"][input_ids]
        x = x + params["embed_positions"]["weight"][positions]

        enc_tok = enc_states[seq_of_tok]       # [T, L_enc, d]
        enc_mask = (jnp.arange(l_enc)[None, :]
                    < enc_lens[seq_of_tok][:, None])  # [T, L_enc]

        new_caches = []
        for li, lp in enumerate(params["layers"]):
            # causal self-attention over the paged cache
            h = layer_norm(x, lp["self_attn_layer_norm"]["weight"],
                           lp["self_attn_layer_norm"]["bias"], eps)
            ap = lp["self_attn"]
            q = lin(ap["q_proj"], h).reshape(t, heads, hd)
            k = lin(ap["k_proj"], h).reshape(t, heads, hd)
            v = lin(ap["v_proj"], h).reshape(t, heads, hd)
            cache = write_kv_cache(kv_caches[li], k, v,
                                   attn_md["slot_mapping"])
            attn = ragged_paged_attention(
                q, cache, attn_md["kv_lens"], attn_md["page_indices"],
                attn_md["cu_q_lens"], attn_md["num_seqs"],
                sm_scale=scale, decode_mode=decode_mode,
                decode_pages=decode_pages)
            new_caches.append(cache)
            x = x + lin(ap["out_proj"], attn.reshape(t, heads * hd))

            # cross-attention over the request's encoder states
            h = layer_norm(x, lp["encoder_attn_layer_norm"]["weight"],
                           lp["encoder_attn_layer_norm"]["bias"], eps)
            cp = lp["encoder_attn"]
            q = (lin(cp["q_proj"], h) * scale).reshape(t, heads, hd)
            ek = lin(cp["k_proj"], enc_tok).reshape(t, l_enc, heads, hd)
            ev = lin(cp["v_proj"], enc_tok).reshape(t, l_enc, heads, hd)
            sc = jnp.einsum("thd,tlhd->thl", q.astype(jnp.float32),
                            ek.astype(jnp.float32))
            sc = jnp.where(enc_mask[:, None, :], sc, -1e30)
            p2 = jax.nn.softmax(sc, axis=-1)
            ctx = jnp.einsum("thl,tlhd->thd", p2.astype(ev.dtype), ev)
            x = x + lin(cp["out_proj"], ctx.reshape(t, heads * hd))

            h = layer_norm(x, lp["final_layer_norm"]["weight"],
                           lp["final_layer_norm"]["bias"], eps)
            h = jax.nn.gelu(lin(lp["fc1"], h).astype(jnp.float32),
                            approximate=False).astype(x.dtype)
            x = x + lin(lp["fc2"], h)

        x = layer_norm(x, params["norm"]["weight"],
                       params["norm"]["bias"], eps)
        return x, new_caches

    def compute_logits(self, params, hidden, tp_axis=None) -> jax.Array:
        # tied proj_out (HF WhisperForConditionalGeneration.proj_out)
        w = params["embed_tokens"]["weight"]
        return jnp.dot(hidden, w.T,
                       preferred_element_type=jnp.float32)
