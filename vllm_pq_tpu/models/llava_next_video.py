"""LLaVA-NeXT-Video — role of reference
``model_executor/models/llava_next_video.py``.

LLaVA-NeXT anyres images (inherited) + VIDEO inputs: each frame runs
the CLIP tower (feature layer -2, CLS dropped), then the
``vision_resampler`` average pool (kernel=stride=2, reference
LlavaNextVideoPooler) BEFORE the projector, and frames are flattened
with no newline terminator.
"""

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_pq_tpu.models.llava_next import LlavaNextModel
from vllm_pq_tpu.multimodal.clip import CLIPVisionTower


def next_video_span(num_frames: int, vision_size: int,
                    patch_size: int, stride: int = 2) -> int:
    side = vision_size // patch_size
    return num_frames * (side // stride) ** 2


class LlavaNextVideoModel(LlavaNextModel):

    def __init__(self, *args, spatial_pool_stride: int = 2,
                 spatial_pool_mode: str = "average",
                 video_token_index: int = 32001, **kw):
        super().__init__(*args, **kw)
        self.spatial_pool_stride = spatial_pool_stride
        self.spatial_pool_mode = spatial_pool_mode
        self.video_token_index = video_token_index

    def encode_images(self, vision_params: Dict, pixels: jax.Array,
                      grid_thw: Tuple = None) -> jax.Array:
        if grid_thw is not None and grid_thw[0] == "video":
            return self._encode_video(vision_params, pixels)
        return super().encode_images(vision_params, pixels, grid_thw)

    def _encode_video(self, vision_params: Dict,
                      frames: jax.Array) -> jax.Array:
        """frames [F, 3, vs, vs] -> [F * (side//stride)^2, D]."""
        feats = self.vision_tower(vision_params["tower"], frames)
        if (isinstance(self.vision_tower, CLIPVisionTower)
                and self.select_strategy == "default"):
            feats = feats[:, 1:]
        f = feats.shape[0]
        d = feats.shape[-1]
        side = self.vision_cfg.image_size // self.vision_cfg.patch_size
        st = self.spatial_pool_stride
        ps = side // st  # AvgPool2d floor-truncates odd trailing cells
        grid = feats.reshape(f, side, side, d)[:, :ps * st, :ps * st]
        grid = grid.reshape(f, ps, st, ps, st, d)
        if self.spatial_pool_mode == "max":
            pooled = grid.max(axis=(2, 4))
        else:
            pooled = grid.astype(jnp.float32).mean(axis=(2, 4)) \
                .astype(feats.dtype)
        proj = self.projector(vision_params["projector"],
                              pooled.reshape(f, ps * ps, d))
        return proj.reshape(-1, proj.shape[-1])
