"""InternViT vision tower (InternVL family), functional JAX.

Role of the reference's ``model_executor/models/intern_vit.py`` — same
design as ``multimodal/clip.py``: a pure function over a param pytree,
jitted once per pixel shape, attention as dense batched einsums.

Architecture (HF InternVLVisionModel): CLS token + conv patch embed +
absolute position embeddings, pre-norm blocks with per-channel LAYER
SCALE (lambda_1/lambda_2), optional full-width q/k RMSNorm, norm type
layer_norm or rms_norm, and (use_mean_pooling=True) NO final norm."""

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


@dataclass
class InternVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    num_channels: int = 3
    hidden_act: str = "gelu"
    norm_type: str = "layer_norm"
    use_qk_norm: bool = False
    attention_bias: bool = False
    use_mean_pooling: bool = True

    @classmethod
    def from_hf(cls, hf) -> "InternVisionConfig":
        def scalar(v):
            return v[0] if isinstance(v, (list, tuple)) else v
        return cls(
            hidden_size=hf.hidden_size,
            intermediate_size=hf.intermediate_size,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            image_size=scalar(hf.image_size),
            patch_size=scalar(hf.patch_size),
            layer_norm_eps=getattr(hf, "layer_norm_eps", 1e-6),
            hidden_act=getattr(hf, "hidden_act", "gelu"),
            norm_type=getattr(hf, "norm_type", "layer_norm"),
            # legacy OpenGVLab configs (InternVLChatModel) spell these
            # qk_normalization / qkv_bias (reference intern_vit.py)
            use_qk_norm=getattr(hf, "use_qk_norm",
                                getattr(hf, "qk_normalization", False)),
            attention_bias=getattr(hf, "attention_bias",
                                   getattr(hf, "qkv_bias", False)),
            use_mean_pooling=getattr(hf, "use_mean_pooling", True),
        )

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _ln(x, p, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["weight"]
            + p["bias"]).astype(x.dtype)


def _rms(x, p, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (p["weight"] * (x32 * jax.lax.rsqrt(var + eps)).astype(
        x.dtype))


class InternVisionTower:

    def __init__(self, cfg: InternVisionConfig):
        self.cfg = cfg
        self.n_blocks = cfg.num_hidden_layers

    def param_shapes(self, dtype) -> Dict:
        cfg = self.cfg
        h, i = cfg.hidden_size, cfg.intermediate_size
        norm = ({"weight": ((h,), dtype), "bias": ((h,), dtype)}
                if cfg.norm_type == "layer_norm"
                else {"weight": ((h,), dtype)})
        qkv_b = {"bias": ((h,), dtype)} if cfg.attention_bias else {}
        layer = {
            "layernorm_before": dict(norm),
            "layernorm_after": dict(norm),
            "q_proj": {"weight": ((h, h), dtype), **qkv_b},
            "k_proj": {"weight": ((h, h), dtype), **qkv_b},
            "v_proj": {"weight": ((h, h), dtype), **qkv_b},
            "projection_layer": {"weight": ((h, h), dtype),
                                 "bias": ((h,), dtype)},
            "fc1": {"weight": ((h, i), dtype), "bias": ((i,), dtype)},
            "fc2": {"weight": ((i, h), dtype), "bias": ((h,), dtype)},
            "lambda_1": {"weight": ((h,), dtype)},
            "lambda_2": {"weight": ((h,), dtype)},
        }
        if cfg.use_qk_norm:
            layer["q_norm"] = {"weight": ((h,), dtype)}
            layer["k_norm"] = {"weight": ((h,), dtype)}
        shapes = {
            "cls_token": {"weight": ((h,), dtype)},
            "patch_embedding": {
                "weight": ((cfg.patch_size * cfg.patch_size
                            * cfg.num_channels, h), dtype),
                "bias": ((h,), dtype)},
            "position_embeddings": {"weight": ((cfg.num_patches + 1, h),
                                               dtype)},
            "layers": [dict(layer) for _ in range(self.n_blocks)],
        }
        if not cfg.use_mean_pooling:
            shapes["layernorm"] = {"weight": ((h,), dtype),
                                   "bias": ((h,), dtype)}
        return shapes

    def param_specs(self) -> Dict:
        return jax.tree.map(lambda _: P(),
                            self.param_shapes(jnp.float32),
                            is_leaf=lambda v: isinstance(v, tuple))

    def __call__(self, params: Dict, pixels: jax.Array) -> jax.Array:
        """pixels [B, 3, H, W] -> features [B, num_patches + 1, hidden]
        (CLS first, HF last_hidden_state semantics)."""
        from vllm_pq_tpu.layers.activation import ACT2FN
        cfg = self.cfg
        eps = cfg.layer_norm_eps
        act = ACT2FN[cfg.hidden_act]
        norm = _ln if cfg.norm_type == "layer_norm" else _rms
        b = pixels.shape[0]
        ps = cfg.patch_size
        g = cfg.image_size // ps
        x = pixels.reshape(b, cfg.num_channels, g, ps, g, ps)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(
            b, g * g, ps * ps * cfg.num_channels)
        x = (jnp.dot(x, params["patch_embedding"]["weight"],
                     preferred_element_type=jnp.float32)
             .astype(pixels.dtype) + params["patch_embedding"]["bias"])
        cls = jnp.broadcast_to(params["cls_token"]["weight"],
                               (b, 1, cfg.hidden_size)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["position_embeddings"]["weight"]

        nh = cfg.num_attention_heads
        d = cfg.hidden_size // nh
        scale = d ** -0.5
        for lp in params["layers"]:
            h_in = norm(x, lp["layernorm_before"], eps)
            t = h_in.shape[1]

            def proj(n, v):
                y = jnp.dot(v, lp[n]["weight"],
                            preferred_element_type=jnp.float32) \
                    .astype(v.dtype)
                return y + lp[n]["bias"] if "bias" in lp[n] else y
            q = proj("q_proj", h_in)
            k = proj("k_proj", h_in)
            v = proj("v_proj", h_in)
            if cfg.use_qk_norm:
                # full-width RMSNorm BEFORE the head split (HF
                # InternVLVisionAttention.q_norm/k_norm)
                q = _rms(q, lp["q_norm"], eps)
                k = _rms(k, lp["k_norm"], eps)
            q = q.reshape(b, t, nh, d)
            k = k.reshape(b, t, nh, d)
            v = v.reshape(b, t, nh, d)
            scores = jnp.einsum("bqhd,bkhd->bhqk",
                                q.astype(jnp.float32) * scale,
                                k.astype(jnp.float32))
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd",
                              probs.astype(v.dtype), v)
            attn = proj("projection_layer",
                        attn.reshape(b, t, cfg.hidden_size))
            x = x + lp["lambda_1"]["weight"] * attn

            h_in = norm(x, lp["layernorm_after"], eps)
            mlp = proj("fc2", act(proj("fc1", h_in)))
            x = x + lp["lambda_2"]["weight"] * mlp
        if not cfg.use_mean_pooling:
            x = _ln(x, params["layernorm"], eps)
        return x
