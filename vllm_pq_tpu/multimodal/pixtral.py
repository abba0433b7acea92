"""Pixtral vision tower (role of reference
``model_executor/models/pixtral.py`` VisionTransformer /
PixtralHFVisionModel): a RoPE-2D ViT — bias-free patch conv, RMS
pre-norm, pre-norm blocks of bias-free attention (2D rotary over the
patch grid) and SwiGLU MLP. Used by the LLaVA composite when
``vision_config.model_type == "pixtral"``.

Functional JAX like the CLIP tower: pure function over a param pytree,
one dense einsum attention per block (encoder sequences are hundreds of
patches — MXU-friendly)."""

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


@dataclass
class PixtralVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 1024
    patch_size: int = 16
    num_channels: int = 3
    rope_theta: float = 10000.0
    head_dim: int = 64

    @classmethod
    def from_hf(cls, hf) -> "PixtralVisionConfig":
        h = hf.hidden_size
        heads = hf.num_attention_heads
        return cls(
            hidden_size=h,
            intermediate_size=hf.intermediate_size,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=heads,
            image_size=hf.image_size,
            patch_size=hf.patch_size,
            rope_theta=getattr(hf, "rope_theta", 10000.0),
            head_dim=getattr(hf, "head_dim", None) or h // heads,
        )

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _rms(x, w, eps=1e-5):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)
            * w.astype(jnp.float32)).astype(x.dtype)


def _rope2d_table(cfg: PixtralVisionConfig) -> np.ndarray:
    """[side*side, head_dim] cos/sin base angles (HF
    PixtralRotaryEmbedding: h rows use even freqs, w columns odd)."""
    d = cfg.head_dim
    side = cfg.image_size // cfg.patch_size
    freqs = 1.0 / (cfg.rope_theta
                   ** (np.arange(0, d, 2, dtype=np.float64) / d))
    h = np.arange(side, dtype=np.float64)
    freqs_h = np.outer(h, freqs[0::2])           # [side, d/4]
    freqs_w = np.outer(h, freqs[1::2])
    inv = np.concatenate(
        [np.repeat(freqs_h[:, None, :], side, axis=1),
         np.repeat(freqs_w[None, :, :], side, axis=0)],
        axis=-1).reshape(side * side, d // 2)
    return np.concatenate([inv, inv], axis=-1)   # [side^2, d]


def _rotate_half(x):
    d = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)


class PixtralVisionTower:
    """Same call interface as CLIPVisionTower; returns the LAST hidden
    state (pixtral has no CLS and LLaVA-pixtral selects feature layer
    -1 with strategy "full")."""

    def __init__(self, cfg: PixtralVisionConfig, feature_layer: int = -1):
        self.cfg = cfg
        n = cfg.num_hidden_layers
        self.n_blocks = (feature_layer + n + 1 if feature_layer < 0
                         else feature_layer)

    def param_shapes(self, dtype) -> Dict:
        cfg = self.cfg
        h, i = cfg.hidden_size, cfg.intermediate_size
        hd = cfg.num_attention_heads * cfg.head_dim
        layer = {
            "attention_norm": {"weight": ((h,), dtype)},
            "ffn_norm": {"weight": ((h,), dtype)},
            "q_proj": {"weight": ((h, hd), dtype)},
            "k_proj": {"weight": ((h, hd), dtype)},
            "v_proj": {"weight": ((h, hd), dtype)},
            "o_proj": {"weight": ((hd, h), dtype)},
            "gate_proj": {"weight": ((h, i), dtype)},
            "up_proj": {"weight": ((h, i), dtype)},
            "down_proj": {"weight": ((i, h), dtype)},
        }
        return {
            # conv kernel as matmul [ps*ps*3, h] (channel-last patches)
            "patch_embedding": {"weight": (
                (cfg.patch_size * cfg.patch_size * cfg.num_channels, h),
                dtype)},
            "ln_pre": {"weight": ((h,), dtype)},
            "layers": [dict(layer) for _ in range(self.n_blocks)],
        }

    def param_specs(self) -> Dict:
        return jax.tree.map(lambda _: P(),
                            self.param_shapes(jnp.float32),
                            is_leaf=lambda v: isinstance(v, tuple))

    def __call__(self, params: Dict, pixels: jax.Array) -> jax.Array:
        """pixels [B, 3, H, W] -> features [B, n_patches, hidden]."""
        cfg = self.cfg
        b, _, hh, ww = pixels.shape
        ps = cfg.patch_size
        gh, gw = hh // ps, ww // ps
        x = pixels.reshape(b, cfg.num_channels, gh, ps, gw, ps)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(
            b, gh * gw, ps * ps * cfg.num_channels)
        x = jnp.dot(x, params["patch_embedding"]["weight"],
                    preferred_element_type=jnp.float32).astype(
            pixels.dtype)
        x = _rms(x, params["ln_pre"]["weight"])

        # 2D rope angles for this grid (row-major h*max_w + w indexing)
        side = cfg.image_size // ps
        table = jnp.asarray(_rope2d_table(cfg), jnp.float32)
        pos = (jnp.arange(gh)[:, None] * side
               + jnp.arange(gw)[None, :]).reshape(-1)
        ang = table[pos]                       # [t, head_dim]
        cos, sin = jnp.cos(ang), jnp.sin(ang)

        nh, d = cfg.num_attention_heads, cfg.head_dim
        scale = d ** -0.5
        t = gh * gw
        for lp in params["layers"]:
            h_in = _rms(x, lp["attention_norm"]["weight"])

            def mm(n, v):
                return jnp.dot(v, lp[n]["weight"],
                               preferred_element_type=jnp.float32
                               ).astype(v.dtype)
            q = mm("q_proj", h_in).reshape(b, t, nh, d)
            k = mm("k_proj", h_in).reshape(b, t, nh, d)
            c = cos[None, :, None, :].astype(jnp.float32)
            s = sin[None, :, None, :].astype(jnp.float32)
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            q = (qf * c + _rotate_half(qf) * s).astype(q.dtype)
            k = (kf * c + _rotate_half(kf) * s).astype(k.dtype)
            v = mm("v_proj", h_in).reshape(b, t, nh, d)
            scores = jnp.einsum("bqhd,bkhd->bhqk",
                                q.astype(jnp.float32) * scale,
                                k.astype(jnp.float32))
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
            x = x + mm("o_proj", attn.reshape(b, t, nh * d))

            h_in = _rms(x, lp["ffn_norm"]["weight"])
            f = jax.nn.silu(mm("gate_proj", h_in)) * mm("up_proj", h_in)
            x = x + mm("down_proj", f)
        return x
