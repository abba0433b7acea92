"""LLaVA (vision-language) — role of reference
``model_executor/models/llava.py``.

Composition: CLIP vision tower + 2-layer projector + any llama-family
language model. The LM step function is UNCHANGED except for the
multimodal embedding splice (``mm`` kwarg on LlamaModel); the vision
tower runs as its own jitted function once per image (scheduled by the
EncoderCacheManager budget), its projected features cached host-side
and streamed into the placeholder rows of each prefill chunk.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
from vllm_pq_tpu.multimodal.clip import (CLIPVisionConfig, CLIPVisionTower,
                                         MultiModalProjector)
from vllm_pq_tpu.quantization.methods import LinearMethod


class LlavaModel(LlamaModel):

    def __init__(self, cfg: LlamaConfig, vision_cfg,
                 linear_method: LinearMethod,
                 image_token_index: int = 32000,
                 vision_feature_layer: int = -2,
                 vision_feature_select_strategy: str = "default",
                 projector_act: str = "gelu",
                 tower=None):
        super().__init__(cfg, linear_method)
        self.vision_cfg = vision_cfg
        self.image_token_index = image_token_index
        self.select_strategy = vision_feature_select_strategy
        # tower is pluggable: CLIP (classic LLaVA) or Pixtral (RoPE-2D
        # ViT; reference models/pixtral.py PixtralHFVisionModel)
        self.vision_tower = tower or CLIPVisionTower(
            vision_cfg, vision_feature_layer)
        self.projector = MultiModalProjector(vision_cfg.hidden_size,
                                             cfg.hidden_size,
                                             projector_act)

    @property
    def num_image_tokens(self) -> int:
        n = self.vision_cfg.num_patches
        if not isinstance(self.vision_tower, CLIPVisionTower):
            return n  # pixtral: no CLS token
        return n if self.select_strategy == "default" else n + 1

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
        """pixels [B, 3, H, W] -> projected features
        [B, num_image_tokens, text_hidden] (jit once per pixel shape)."""
        feats = self.vision_tower(vision_params["tower"], pixels)
        if (isinstance(self.vision_tower, CLIPVisionTower)
                and self.select_strategy == "default"):
            feats = feats[:, 1:]  # drop CLS (pixtral towers have none)
        return self.projector(vision_params["projector"], feats)
