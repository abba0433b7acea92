"""Idefics3 / SmolVLM (vision-language) — role of reference
``model_executor/models/idefics3.py``.

Composition: SigLIP-structured vision transformer (reused from
multimodal/siglip.py) + connector (pixel shuffle scale^2 channel fold
+ bias-free linear) + a Llama3 language model. Projected features
stream into the <image> placeholder rows via the generic ``mm``
splice.

Position ids: Idefics3's NaViT-style bucketized fractional coords do
NOT reduce to arange even for full-resolution square images — the
(1 - 1e-6) guard in HF's Idefics3VisionEmbeddings puts patch row/col k
in bucket max(k-1, 0) (verified bit-exact against torch.bucketize for
sides 2..73), so the tower permutes its position table accordingly."""

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
from vllm_pq_tpu.multimodal.siglip import (SiglipVisionConfig,
                                           SiglipVisionTower)
from vllm_pq_tpu.quantization.methods import LinearMethod


def idefics3_pixel_shuffle(x: jax.Array, scale: int) -> jax.Array:
    """[B, seq, C] -> [B, seq/scale^2, C*scale^2] (HF
    Idefics3Connector.pixel_shuffle's exact permute sequence)."""
    b, seq, c = x.shape
    h = w = int(seq ** 0.5)
    x = x.reshape(b, h, w // scale, c * scale)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(b, w // scale, h // scale, c * scale * scale)
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(b, seq // (scale * scale), c * scale * scale)


class Idefics3Model(LlamaModel):

    def __init__(self, cfg: LlamaConfig, vision_cfg: SiglipVisionConfig,
                 linear_method: LinearMethod,
                 image_token_id: int = 128257,
                 scale_factor: int = 2):
        super().__init__(cfg, linear_method)
        self.vision_cfg = vision_cfg
        self.image_token_index = image_token_id
        self.scale_factor = scale_factor
        # HF bucketized position ids for a full square image:
        # pos(row k, col j) = max(k-1,0)*side + max(j-1,0)
        side = vision_cfg.image_size // vision_cfg.patch_size
        ax = np.maximum(np.arange(side) - 1, 0)
        pos_ids = (ax[:, None] * side + ax[None, :]).reshape(-1)
        self.vision_tower = SiglipVisionTower(vision_cfg,
                                              position_ids=pos_ids)

    @property
    def num_image_tokens(self) -> int:
        return self.vision_cfg.num_patches // (self.scale_factor ** 2)

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        in_dim = self.vision_cfg.hidden_size * self.scale_factor ** 2
        shapes["vision"] = {
            "tower": self.vision_tower.param_shapes(self.cfg.dtype),
            "projector": {"proj": {
                "weight": ((in_dim, self.cfg.hidden_size),
                           self.cfg.dtype)}},
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
        feats = idefics3_pixel_shuffle(feats, self.scale_factor)
        return jnp.dot(feats, vision_params["projector"]["proj"]["weight"],
                       preferred_element_type=jnp.float32) \
            .astype(feats.dtype)
