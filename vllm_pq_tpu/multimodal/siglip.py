"""SigLIP vision tower, functional JAX.

Role of the reference's ``model_executor/models/siglip.py`` (the
encoder PaliGemma and Gemma3 compose) — same design as
``multimodal/clip.py``: a pure function over a param pytree, jitted
once per pixel shape, attention as one dense batched einsum (encoder
sequences are a few hundred patches — MXU-friendly without paging).

Differences from CLIP: no CLS token, no pre-layernorm, a learned
per-patch position embedding, tanh-approx GELU MLP, and a final
post_layernorm on the LAST hidden state (consumers read the full
encoder output, not hidden_states[-2])."""

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


@dataclass
class SiglipVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 16
    layer_norm_eps: float = 1e-6
    num_channels: int = 3
    hidden_act: str = "gelu_pytorch_tanh"

    @classmethod
    def from_hf(cls, hf) -> "SiglipVisionConfig":
        return cls(
            hidden_size=hf.hidden_size,
            intermediate_size=hf.intermediate_size,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            image_size=hf.image_size,
            patch_size=hf.patch_size,
            layer_norm_eps=getattr(hf, "layer_norm_eps", 1e-6),
            hidden_act=getattr(hf, "hidden_act", "gelu_pytorch_tanh"),
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


class SiglipVisionTower:
    """Patch embed -> N pre-norm blocks -> post_layernorm. Returns the
    post-LN last hidden state [B, num_patches, hidden] (HF
    SiglipVisionTransformer.forward with vision_use_head=False).

    ``position_ids`` (optional, [num_patches] int) remaps the position
    table per patch — Idefics3's bucketized NaViT coords ride the same
    tower (models/idefics3.py)."""

    def __init__(self, cfg: SiglipVisionConfig, position_ids=None,
                 apply_post_layernorm: bool = True,
                 run_blocks: int = None):
        self.cfg = cfg
        self.n_blocks = cfg.num_hidden_layers
        # Phi-4-MM taps hidden_states[-2]: run all but the last block
        # (param templates keep every layer so checkpoints load whole)
        self.run_blocks = run_blocks
        self.position_ids = position_ids
        # LLaVA-OneVision taps hidden_states[-1], i.e. the last block
        # output BEFORE the final post_layernorm (HF
        # vision_feature_layer=-1 semantics); PaliGemma/Idefics3 consume
        # the post-LN output
        self.apply_post_layernorm = apply_post_layernorm

    def param_shapes(self, dtype) -> Dict:
        cfg = self.cfg
        h, i = cfg.hidden_size, cfg.intermediate_size
        ln = {"weight": ((h,), dtype), "bias": ((h,), dtype)}
        layer = {
            "layer_norm1": dict(ln), "layer_norm2": dict(ln),
            "q_proj": {"weight": ((h, h), dtype), "bias": ((h,), dtype)},
            "k_proj": {"weight": ((h, h), dtype), "bias": ((h,), dtype)},
            "v_proj": {"weight": ((h, h), dtype), "bias": ((h,), dtype)},
            "out_proj": {"weight": ((h, h), dtype), "bias": ((h,), dtype)},
            "fc1": {"weight": ((h, i), dtype), "bias": ((i,), dtype)},
            "fc2": {"weight": ((i, h), dtype), "bias": ((h,), dtype)},
        }
        return {
            # conv kernel stored as a matmul: [P*P*3, h] (+ conv bias)
            "patch_embedding": {
                "weight": ((cfg.patch_size * cfg.patch_size
                            * cfg.num_channels, h), dtype),
                "bias": ((h,), dtype)},
            "position_embedding": {"weight": ((cfg.num_patches, h),
                                              dtype)},
            "post_layernorm": dict(ln),
            "layers": [dict(layer) for _ in range(self.n_blocks)],
        }

    def param_specs(self) -> Dict:
        # replicated: the tower runs once per image outside the
        # TP-sharded LM step
        return jax.tree.map(lambda _: P(),
                            self.param_shapes(jnp.float32),
                            is_leaf=lambda v: isinstance(v, tuple))

    def __call__(self, params: Dict, pixels: jax.Array) -> jax.Array:
        """pixels [B, 3, H, W] -> features [B, num_patches, hidden]."""
        from vllm_pq_tpu.layers.activation import ACT2FN
        cfg = self.cfg
        eps = cfg.layer_norm_eps
        act = ACT2FN[cfg.hidden_act]
        b = pixels.shape[0]
        ps = cfg.patch_size
        g = cfg.image_size // ps
        # conv-as-matmul: [B, 3, g, ps, g, ps] -> [B, g*g, ps*ps*3]
        x = pixels.reshape(b, cfg.num_channels, g, ps, g, ps)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(
            b, g * g, ps * ps * cfg.num_channels)
        x = (jnp.dot(x, params["patch_embedding"]["weight"],
                     preferred_element_type=jnp.float32)
             .astype(pixels.dtype) + params["patch_embedding"]["bias"])
        pos = params["position_embedding"]["weight"]
        if self.position_ids is not None:
            pos = pos[jnp.asarray(self.position_ids)]
        x = x + pos

        nh = cfg.num_attention_heads
        d = cfg.hidden_size // nh
        scale = d ** -0.5
        layers = params["layers"]
        if self.run_blocks is not None:
            layers = layers[:self.run_blocks]
        for lp in layers:
            h_in = _ln(x, lp["layer_norm1"], eps)
            t = h_in.shape[1]

            def proj(n, v):
                return (jnp.dot(v, lp[n]["weight"],
                                preferred_element_type=jnp.float32)
                        .astype(v.dtype) + lp[n]["bias"])
            q = proj("q_proj", h_in).reshape(b, t, nh, d)
            k = proj("k_proj", h_in).reshape(b, t, nh, d)
            v = proj("v_proj", h_in).reshape(b, t, nh, d)
            scores = jnp.einsum("bqhd,bkhd->bhqk",
                                q.astype(jnp.float32) * scale,
                                k.astype(jnp.float32))
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
            x = x + proj("out_proj", attn.reshape(b, t, cfg.hidden_size))

            h_in = _ln(x, lp["layer_norm2"], eps)
            x = x + proj("fc2", act(proj("fc1", h_in)))
        if not self.apply_post_layernorm:
            return x
        return _ln(x, params["post_layernorm"], eps)
