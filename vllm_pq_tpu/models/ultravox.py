"""Ultravox (speech-language) — role of reference
``model_executor/models/ultravox.py``.

Composition: a Whisper encoder (conv stems + pre-LN blocks + final LN,
NO pooling — reference ModifiedWhisperEncoder) + the UltravoxProjector
(stack ``stack_factor`` adjacent frames, RMSNorm, bias-free linear,
``x[:d] * silu(x[d:])`` SwiGLU, mid- or post-RMSNorm per
``projector_ln_mid``, bias-free linear) + any llama-family LM. Audio
participates by embedding splice into the placeholder span, like
Qwen2-Audio; span length = ceil(true_frames / stack_factor).
"""

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.norm import layer_norm
from vllm_pq_tpu.models.llama import LlamaConfig
from vllm_pq_tpu.models.qwen2_audio import (Qwen2AudioEncoderConfig,
                                            Qwen2AudioModel, _lin)
from vllm_pq_tpu.quantization.methods import LinearMethod


def _rms(x, w, eps=1e-6):
    x32 = x.astype(jnp.float32)
    nx = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True)
                             + eps)
    return (nx * w.astype(jnp.float32)).astype(x.dtype)


class UltravoxModel(Qwen2AudioModel):

    def __init__(self, cfg: LlamaConfig,
                 audio_cfg: Qwen2AudioEncoderConfig,
                 linear_method: LinearMethod,
                 audio_token_index: int = 32000,
                 stack_factor: int = 8,
                 projector_hidden: int = 4096,
                 projector_act: str = "swiglu",
                 projector_ln_mid: bool = False):
        super().__init__(cfg, audio_cfg, linear_method,
                         audio_token_index=audio_token_index)
        self.stack_factor = stack_factor
        self.projector_hidden = projector_hidden
        self.projector_act = projector_act
        self.projector_ln_mid = projector_ln_mid

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        a = self.audio_cfg
        dt = self.cfg.dtype
        din = a.d_model * self.stack_factor
        mid = (self.projector_hidden // 2
               if self.projector_act == "swiglu"
               else self.projector_hidden)
        proj = {
            "ln_pre": {"weight": ((din,), dt)},
            "linear_1": _lin(din, self.projector_hidden, dt, bias=False),
            "linear_2": _lin(mid, self.cfg.hidden_size, dt, bias=False),
        }
        if self.projector_ln_mid:
            proj["ln_mid"] = {"weight": ((mid,), dt)}
        else:
            proj["ln_post"] = {"weight": ((self.cfg.hidden_size,), dt)}
        shapes["vision"]["projector"] = proj
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.param_shapes()["vision"],
            is_leaf=lambda v: isinstance(v, tuple))
        return specs

    def encode_images(self, vision_params: Dict,
                      mel: jax.Array) -> jax.Array:
        """mel [B, num_mel_bins, T_mel] -> projected frames
        [B, ceil(T_mel/2/stack_factor), text_hidden]."""
        a = self.audio_cfg
        ep = vision_params["tower"]
        eps = 1e-5
        from vllm_pq_tpu.layers.activation import ACT2FN

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
        # ModifiedWhisperEncoder: embed_pos sliced to the input length
        x = x + ep["embed_positions"]["weight"][None, :x.shape[1]]

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
            act_enc = ACT2FN[a.activation_function]
            h = act_enc(lin(lp["fc1"], h).astype(jnp.float32)) \
                .astype(x.dtype)
            x = x + lin(lp["fc2"], h)
        x = layer_norm(x, ep["layer_norm"]["weight"],
                       ep["layer_norm"]["bias"], eps)

        # UltravoxProjector: pad to a stack_factor multiple, stack,
        # ln_pre -> linear_1 -> act -> (ln_mid) -> linear_2 -> (ln_post)
        pp = vision_params["projector"]
        sf = self.stack_factor
        t_pad = -(-t // sf) * sf
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        x = x.reshape(b, t_pad // sf, d * sf)
        x = _rms(x, pp["ln_pre"]["weight"])
        x = lin(pp["linear_1"], x)
        if self.projector_act == "swiglu":
            half = x.shape[-1] // 2
            x = (x[..., :half].astype(jnp.float32)
                 * jax.nn.silu(x[..., half:].astype(jnp.float32))) \
                .astype(x.dtype)
        else:
            x = ACT2FN[self.projector_act](x)
        if self.projector_ln_mid:
            x = _rms(x, pp["ln_mid"]["weight"])
        x = lin(pp["linear_2"], x)
        if not self.projector_ln_mid:
            x = _rms(x, pp["ln_post"]["weight"])
        return x
