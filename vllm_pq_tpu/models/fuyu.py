"""Fuyu-8B (vision-language) — role of reference
``model_executor/models/fuyu.py``.

Fuyu has NO vision tower: raw image patches project through one linear
(``vision_embed_tokens``) straight into the Persimmon decoder's
embedding space. The patch flatten order is (row, col, channel) —
identical to the conv-as-matmul layout the CLIP/SigLIP towers use.
Projected patch embeddings stream into the placeholder rows via the
generic ``mm`` splice (models/llama.py)."""

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
from vllm_pq_tpu.quantization.methods import LinearMethod


class FuyuModel(LlamaModel):

    def __init__(self, cfg: LlamaConfig, linear_method: LinearMethod,
                 patch_size: int = 30, num_channels: int = 3,
                 image_size: int = 300,
                 image_token_index: int = 71011):
        super().__init__(cfg, linear_method)
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.image_size = image_size
        self.image_token_index = image_token_index

    @property
    def num_image_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        in_dim = self.patch_size * self.patch_size * self.num_channels
        shapes["vision"] = {"vision_embed_tokens": {
            "weight": ((in_dim, self.cfg.hidden_size), self.cfg.dtype),
            "bias": ((self.cfg.hidden_size,), self.cfg.dtype)}}
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.param_shapes()["vision"],
            is_leaf=lambda v: isinstance(v, tuple))
        return specs

    def encode_images(self, vision_params: Dict,
                      pixels: jax.Array) -> jax.Array:
        """pixels [B, 3, H, W] -> patch embeddings [B, (H/p)(W/p), d]
        (HF FuyuImageProcessor.patchify_image order + linear)."""
        b, c, hh, ww = pixels.shape
        ps = self.patch_size
        gh, gw = hh // ps, ww // ps
        x = pixels.reshape(b, c, gh, ps, gw, ps)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(b, gh * gw,
                                                  ps * ps * c)
        vp = vision_params["vision_embed_tokens"]
        return (jnp.dot(x, vp["weight"],
                        preferred_element_type=jnp.float32)
                .astype(pixels.dtype) + vp["bias"])
