"""LLaVA-NeXT (anyres vision-language) — role of reference
``model_executor/models/llava_next.py``.

Same composition as LLaVA (CLIP tower + 2-layer projector + llama-family
LM) but each image arrives as a BASE crop plus an anyres grid of
vision-size crops. After the tower+projector run on all crops in one
batch, the spatial crops are reassembled into the full-resolution
feature grid, the aspect-ratio padding is sliced off (HF
``unpad_image``), a learned ``image_newline`` column terminates each
row, and the base features are prepended. All grid shapes are static
per (image_size, crop-count) pair, so each distinct layout jits once.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.llava import LlavaModel
from vllm_pq_tpu.multimodal.llava_next import (anyres_grid_shape,
                                               unpad_slices)


class LlavaNextModel(LlavaModel):

    def __init__(self, *args, image_grid_pinpoints=None, **kw):
        super().__init__(*args, **kw)
        self.image_grid_pinpoints = image_grid_pinpoints or [[336, 672]]

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        shapes["vision"]["image_newline"] = {
            "weight": ((self.cfg.hidden_size,), self.cfg.dtype)}
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["vision"]["image_newline"] = {"weight": P()}
        return specs

    def encode_images(self, vision_params: Dict, pixels: jax.Array,
                      grid_thw: Tuple[int, int] = None) -> jax.Array:
        """pixels [P+1, 3, h, w] (base crop first, then the anyres grid
        crops row-major) + static original (H0, W0) -> spliced features
        [span, text_hidden] (HF pack_image_features)."""
        orig_hw = grid_thw
        feats = self.vision_tower(vision_params["tower"], pixels)
        if self.select_strategy == "default":
            feats = feats[:, 1:]  # drop CLS per crop
        proj = self.projector(vision_params["projector"], feats)
        base = proj[0]                                # [side*side, D]
        vs = self.vision_cfg.image_size
        side = vs // self.vision_cfg.patch_size
        nph, npw = anyres_grid_shape(orig_hw, self.image_grid_pinpoints,
                                     vs)
        d = proj.shape[-1]
        grid = proj[1:].reshape(nph, npw, side, side, d)
        grid = grid.transpose(0, 2, 1, 3, 4).reshape(nph * side,
                                                     npw * side, d)
        rs, cs = unpad_slices(orig_hw, (nph * side, npw * side))
        grid = grid[rs, cs]
        newline = vision_params["image_newline"]["weight"].astype(
            grid.dtype)
        rows = jnp.concatenate(
            [grid, jnp.broadcast_to(newline, (grid.shape[0], 1, d))],
            axis=1)
        return jnp.concatenate([base, rows.reshape(-1, d)], axis=0)
