"""CLIP vision tower + multimodal projector, functional JAX.

Role of the reference's ``model_executor/models/clip.py`` (CLIP
encoder used by LLaVA) — redesigned as a pure function over a param
pytree, jitted once per pixel shape. Bidirectional attention runs as
one dense ``jnp.einsum`` (no paging: encoder sequences are a few
hundred patches, MXU-friendly as a single batched matmul).
"""

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


@dataclass
class CLIPVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 32
    layer_norm_eps: float = 1e-5
    num_channels: int = 3

    @classmethod
    def from_hf(cls, hf) -> "CLIPVisionConfig":
        return cls(
            hidden_size=hf.hidden_size,
            intermediate_size=hf.intermediate_size,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            image_size=hf.image_size,
            patch_size=hf.patch_size,
            layer_norm_eps=getattr(hf, "layer_norm_eps", 1e-5),
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


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPVisionTower:
    """Patch embed -> pre-LN -> N pre-norm transformer blocks. Returns
    the hidden state after ``feature_layer`` blocks (LLaVA uses -2 =
    all but the last block; HF hidden_states[-2] semantics)."""

    def __init__(self, cfg: CLIPVisionConfig, feature_layer: int = -2):
        self.cfg = cfg
        # hidden_states[i] = output after block i (0 = embeddings); a
        # negative index counts from hidden_states len n_layers+1
        n = cfg.num_hidden_layers
        self.n_blocks = (feature_layer + n + 1 if feature_layer < 0
                         else feature_layer)

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
            "class_embedding": {"weight": ((h,), dtype)},
            # conv kernel stored as a matmul: [P*P*3, h]
            "patch_embedding": {"weight": (
                (cfg.patch_size * cfg.patch_size * cfg.num_channels, h),
                dtype)},
            "position_embedding": {"weight": ((cfg.num_patches + 1, h),
                                              dtype)},
            "pre_layrnorm": dict(ln),   # (sic) HF CLIP attribute name
            "layers": [dict(layer) for _ in range(self.n_blocks)],
        }

    def param_specs(self) -> Dict:
        # vision tower is replicated: it runs once per image, outside
        # the TP-sharded LM step
        return jax.tree.map(lambda _: P(),
                            self.param_shapes(jnp.float32),
                            is_leaf=lambda v: isinstance(v, tuple))

    def __call__(self, params: Dict, pixels: jax.Array) -> jax.Array:
        """pixels [B, 3, H, W] -> features [B, num_patches + 1, hidden]."""
        cfg = self.cfg
        eps = cfg.layer_norm_eps
        b = pixels.shape[0]
        ps = cfg.patch_size
        g = cfg.image_size // ps
        # conv-as-matmul: [B, 3, g, ps, g, ps] -> [B, g*g, ps*ps*3]
        x = pixels.reshape(b, cfg.num_channels, g, ps, g, ps)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(b, g * g,
                                                  ps * ps * cfg.num_channels)
        # match the conv kernel layout [h, 3, ps, ps] -> [ps*ps*3, h]
        x = jnp.dot(x, params["patch_embedding"]["weight"],
                    preferred_element_type=jnp.float32).astype(pixels.dtype)
        cls = jnp.broadcast_to(params["class_embedding"]["weight"],
                               (b, 1, cfg.hidden_size)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["position_embedding"]["weight"]
        x = _ln(x, params["pre_layrnorm"], eps)

        nh = cfg.num_attention_heads
        d = cfg.hidden_size // nh
        scale = d ** -0.5
        for lp in params["layers"]:
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
            f = _quick_gelu(proj("fc1", h_in))
            x = x + proj("fc2", f)
        return x


class MultiModalProjector:
    """LLaVA projector: linear -> gelu -> linear (reference
    models/llava.py::LlavaMultiModalProjector)."""

    def __init__(self, vision_hidden: int, text_hidden: int,
                 act: str = "gelu"):
        self.vision_hidden = vision_hidden
        self.text_hidden = text_hidden
        self.act = act

    def param_shapes(self, dtype) -> Dict:
        return {
            "linear_1": {"weight": ((self.vision_hidden, self.text_hidden),
                                    dtype),
                         "bias": ((self.text_hidden,), dtype)},
            "linear_2": {"weight": ((self.text_hidden, self.text_hidden),
                                    dtype),
                         "bias": ((self.text_hidden,), dtype)},
        }

    def __call__(self, params: Dict, x: jax.Array) -> jax.Array:
        from vllm_pq_tpu.layers.activation import ACT2FN
        act = ACT2FN[self.act]
        y = jnp.dot(x, params["linear_1"]["weight"],
                    preferred_element_type=jnp.float32).astype(x.dtype) \
            + params["linear_1"]["bias"]
        y = act(y)
        return jnp.dot(y, params["linear_2"]["weight"],
                       preferred_element_type=jnp.float32).astype(x.dtype) \
            + params["linear_2"]["bias"]
