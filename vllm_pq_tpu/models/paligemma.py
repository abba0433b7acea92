"""PaliGemma (vision-language) — role of reference
``model_executor/models/paligemma.py``.

Composition: SigLIP vision tower + a single linear projector + a Gemma
language model (a Gemma-flagged LlamaModel). The LM step is unchanged;
projected image features stream into the placeholder rows of each
prefill chunk via the generic ``mm`` splice (models/llama.py).

Scaling: HF divides the projected features by sqrt(text_hidden) and
the Gemma stack multiplies ALL input embeddings (spliced rows
included) by the dtype-rounded sqrt(text_hidden) normalizer. Our
splice replaces rows AFTER the embed-scale multiply, so encode_images
reproduces the round trip ``(p / s) * s`` explicitly to stay
bit-identical with the HF goldens.
"""

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
from vllm_pq_tpu.multimodal.siglip import (SiglipVisionConfig,
                                           SiglipVisionTower)
from vllm_pq_tpu.quantization.methods import LinearMethod


class PaliGemmaProjector:
    """Single linear vision->text projection (HF
    PaliGemmaMultiModalProjector: one nn.Linear with bias)."""

    def __init__(self, vision_hidden: int, text_hidden: int):
        self.vision_hidden = vision_hidden
        self.text_hidden = text_hidden

    def param_shapes(self, dtype) -> Dict:
        return {"linear": {
            "weight": ((self.vision_hidden, self.text_hidden), dtype),
            "bias": ((self.text_hidden,), dtype)}}

    def __call__(self, params: Dict, x: jax.Array) -> jax.Array:
        return (jnp.dot(x, params["linear"]["weight"],
                        preferred_element_type=jnp.float32)
                .astype(x.dtype) + params["linear"]["bias"])


class PaliGemmaModel(LlamaModel):

    def __init__(self, cfg: LlamaConfig, vision_cfg: SiglipVisionConfig,
                 linear_method: LinearMethod,
                 image_token_index: int = 257152,
                 projection_dim: int = 0):
        super().__init__(cfg, linear_method)
        self.vision_cfg = vision_cfg
        self.image_token_index = image_token_index
        self.vision_tower = SiglipVisionTower(vision_cfg)
        self.projector = PaliGemmaProjector(
            vision_cfg.hidden_size, projection_dim or cfg.hidden_size)

    @property
    def num_image_tokens(self) -> int:
        return self.vision_cfg.num_patches

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
        """pixels [B, 3, H, W] -> spliced-row embeddings
        [B, num_patches, text_hidden]."""
        feats = self.vision_tower(vision_params["tower"], pixels)
        proj = self.projector(vision_params["projector"], feats)
        # HF round trip: /sqrt(h) in get_image_features, *normalizer in
        # the Gemma stack — both at the model dtype's rounding
        s = jnp.asarray(float(self.cfg.hidden_size) ** 0.5, proj.dtype)
        return (proj / s) * s
