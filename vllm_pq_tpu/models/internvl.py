"""InternVL 3 / 2.5 (vision-language) — role of reference
``model_executor/models/internvl.py``.

Composition: InternViT tower + pixel-shuffle 2x2 downsample + LN+MLP
projector + a Qwen2/Llama language model. The LM step is unchanged;
projected features stream into the placeholder rows via the generic
``mm`` splice (models/llama.py). Each image contributes
``num_patches * downsample_ratio**2`` tokens (e.g. 448px/14 -> 32x32
patches -> 256 tokens at ratio 0.5)."""

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
from vllm_pq_tpu.multimodal.internvit import (InternVisionConfig,
                                              InternVisionTower)
from vllm_pq_tpu.quantization.methods import LinearMethod


def pixel_shuffle(x: jax.Array, scale: float) -> jax.Array:
    """[B, W, H, C] -> [B, W*s, H*s, C/s^2] (HF InternVLModel.
    pixel_shuffle — note its width/height transposes)."""
    b, w, h, c = x.shape
    x = x.reshape(b, w, int(h * scale), int(c / scale))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(b, int(h * scale), int(w * scale),
                  int(c / (scale * scale)))
    return x.transpose(0, 2, 1, 3)


class InternVLProjector:
    """LayerNorm -> linear -> act -> linear over the pixel-shuffled
    features (HF InternVLMultiModalProjector)."""

    def __init__(self, in_dim: int, text_hidden: int, act: str = "gelu"):
        self.in_dim = in_dim
        self.text_hidden = text_hidden
        self.act = act

    def param_shapes(self, dtype) -> Dict:
        return {
            "layer_norm": {"weight": ((self.in_dim,), dtype),
                           "bias": ((self.in_dim,), dtype)},
            "linear_1": {"weight": ((self.in_dim, self.text_hidden),
                                    dtype),
                         "bias": ((self.text_hidden,), dtype)},
            "linear_2": {"weight": ((self.text_hidden, self.text_hidden),
                                    dtype),
                         "bias": ((self.text_hidden,), dtype)},
        }

    def __call__(self, params: Dict, x: jax.Array) -> jax.Array:
        from vllm_pq_tpu.layers.activation import ACT2FN
        from vllm_pq_tpu.multimodal.internvit import _ln
        x = _ln(x, params["layer_norm"], 1e-5)
        y = (jnp.dot(x, params["linear_1"]["weight"],
                     preferred_element_type=jnp.float32)
             .astype(x.dtype) + params["linear_1"]["bias"])
        y = ACT2FN[self.act](y)
        return (jnp.dot(y, params["linear_2"]["weight"],
                        preferred_element_type=jnp.float32)
                .astype(x.dtype) + params["linear_2"]["bias"])


class InternVLModel(LlamaModel):

    def __init__(self, cfg: LlamaConfig, vision_cfg: InternVisionConfig,
                 linear_method: LinearMethod,
                 image_token_id: int = 151667,
                 downsample_ratio: float = 0.5,
                 projector_act: str = "gelu"):
        super().__init__(cfg, linear_method)
        self.vision_cfg = vision_cfg
        self.image_token_index = image_token_id
        self.downsample_ratio = downsample_ratio
        self.vision_tower = InternVisionTower(vision_cfg)
        in_dim = int(vision_cfg.hidden_size
                     * int(1 / downsample_ratio) ** 2)
        self.projector = InternVLProjector(in_dim, cfg.hidden_size,
                                           projector_act)

    @property
    def num_image_tokens(self) -> int:
        n = self.vision_cfg.num_patches
        return int(n * self.downsample_ratio * self.downsample_ratio)

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        shapes["vision"] = {
            "tower": self.vision_tower.param_shapes(self.cfg.dtype),
            "projector": self.projector.param_shapes(self.cfg.dtype),
        }
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.param_shapes()["vision"],
            is_leaf=lambda v: isinstance(v, tuple))
        return specs

    def encode_images(self, vision_params: Dict,
                      pixels: jax.Array) -> jax.Array:
        """pixels [B, 3, H, W] -> [B, num_image_tokens, text_hidden]."""
        feats = self.vision_tower(vision_params["tower"], pixels)
        feats = feats[:, 1:]  # drop CLS ("default" select strategy)
        b, n, c = feats.shape
        g = int(n ** 0.5)
        feats = pixel_shuffle(feats.reshape(b, g, g, c),
                              self.downsample_ratio)
        feats = feats.reshape(b, -1, feats.shape[-1])
        return self.projector(vision_params["projector"], feats)
