"""Qwen2-Audio (audio-language) — role of reference
``model_executor/models/qwen2_audio.py``.

Composition: a Whisper-style audio encoder (two conv stems, learned
positions, pre-LN blocks) + AvgPool(2) + final LN + one linear
projector + a Qwen2 language model. Unlike Whisper the audio
participates by EMBEDDING SPLICE (not cross-attention): projected
frames stream into the <|AUDIO|> placeholder rows via the generic
``mm`` machinery — the encoder output is cached per request and the
placeholder span length is the TRUE frame count
(((T-1)//2+1 - 2)//2 + 1), while the encoder always runs on the
max_source_positions-padded mel (HF requires the fixed length).
"""

from dataclasses import dataclass, field
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.norm import layer_norm
from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
from vllm_pq_tpu.quantization.methods import LinearMethod


@dataclass
class Qwen2AudioEncoderConfig:
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    num_mel_bins: int = 128
    max_source_positions: int = 1500
    activation_function: str = "gelu"

    @classmethod
    def from_hf(cls, hf) -> "Qwen2AudioEncoderConfig":
        return cls(
            d_model=hf.d_model,
            encoder_layers=hf.encoder_layers,
            encoder_attention_heads=hf.encoder_attention_heads,
            encoder_ffn_dim=hf.encoder_ffn_dim,
            num_mel_bins=hf.num_mel_bins,
            max_source_positions=hf.max_source_positions,
            activation_function=getattr(hf, "activation_function",
                                        "gelu"),
        )


def _lin(i, o, dt, bias=True):
    d = {"weight": ((i, o), dt)}
    if bias:
        d["bias"] = ((o,), dt)
    return d


def _ln(d, dt):
    return {"weight": ((d,), dt), "bias": ((d,), dt)}


class Qwen2AudioModel(LlamaModel):

    def __init__(self, cfg: LlamaConfig,
                 audio_cfg: Qwen2AudioEncoderConfig,
                 linear_method: LinearMethod,
                 audio_token_index: int = 151646):
        super().__init__(cfg, linear_method)
        self.audio_cfg = audio_cfg
        self.image_token_index = audio_token_index  # splice machinery

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        a = self.audio_cfg
        dt = self.cfg.dtype
        d = a.d_model
        layer = {
            "self_attn": {
                "q_proj": _lin(d, d, dt), "k_proj": _lin(d, d, dt,
                                                         False),
                "v_proj": _lin(d, d, dt), "out_proj": _lin(d, d, dt),
            },
            "self_attn_layer_norm": _ln(d, dt),
            "fc1": _lin(d, a.encoder_ffn_dim, dt),
            "fc2": _lin(a.encoder_ffn_dim, d, dt),
            "final_layer_norm": _ln(d, dt),
        }
        shapes["vision"] = {
            "tower": {
                "conv1": {"weight": ((a.num_mel_bins, 3, d), dt),
                          "bias": ((d,), dt)},
                "conv2": {"weight": ((d, 3, d), dt),
                          "bias": ((d,), dt)},
                "embed_positions": {
                    "weight": ((a.max_source_positions, d), dt)},
                "layers": [dict(layer)
                           for _ in range(a.encoder_layers)],
                "layer_norm": _ln(d, dt),
            },
            "projector": {"linear": _lin(d, self.cfg.hidden_size, dt)},
        }
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.param_shapes()["vision"],
            is_leaf=lambda v: isinstance(v, tuple))
        return specs

    def encode_images(self, vision_params: Dict,
                      mel: jax.Array) -> jax.Array:
        """mel [B, num_mel_bins, 2*max_source_positions] -> projected
        frames [B, max_source_positions // 2, text_hidden] (HF
        Qwen2AudioEncoder.forward + projector; callers slice the true
        frame count)."""
        a = self.audio_cfg
        ep = vision_params["tower"]
        eps = 1e-5
        from vllm_pq_tpu.layers.activation import ACT2FN
        act = ACT2FN[a.activation_function]

        def conv(p, x, stride):
            return jax.lax.conv_general_dilated(
                x, p["weight"], window_strides=(stride,),
                padding=((1, 1),),
                dimension_numbers=("NCH", "IHO", "NCH")) \
                + p["bias"][None, :, None]

        x = jax.nn.gelu(conv(ep["conv1"],
                             mel.astype(self.cfg.dtype), 1),
                        approximate=False)
        x = jax.nn.gelu(conv(ep["conv2"], x, 2), approximate=False)
        x = x.transpose(0, 2, 1)               # [B, T/2, d]
        x = x + ep["embed_positions"]["weight"][None]

        b, t, d = x.shape
        heads = a.encoder_attention_heads
        hd = d // heads
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
            q = (lin(ap["q_proj"], h) * scale).reshape(b, t, heads, hd)
            k = lin(ap["k_proj"], h).reshape(b, t, heads, hd)
            v = lin(ap["v_proj"], h).reshape(b, t, heads, hd)
            sc = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32))
            p2 = jax.nn.softmax(sc, axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", p2.astype(v.dtype), v)
            x = x + lin(ap["out_proj"], ctx.reshape(b, t, d))
            h = layer_norm(x, lp["final_layer_norm"]["weight"],
                           lp["final_layer_norm"]["bias"], eps)
            h = act(lin(lp["fc1"], h).astype(jnp.float32)) \
                .astype(x.dtype)
            x = x + lin(lp["fc2"], h)

        # AvgPool1d(2, stride 2) over time, then final LN + projector
        x = (x[:, 0::2] + x[:, 1::2]) * 0.5
        x = layer_norm(x, ep["layer_norm"]["weight"],
                       ep["layer_norm"]["bias"], eps)
        pp = vision_params["projector"]["linear"]
        return (jnp.dot(x, pp["weight"],
                        preferred_element_type=jnp.float32)
                .astype(x.dtype) + pp["bias"])
