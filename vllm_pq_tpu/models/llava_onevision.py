"""LLaVA-OneVision — role of reference
``model_executor/models/llava_onevision.py``.

LLaVA-NeXT anyres composition on a SigLIP tower with two deltas:
``anyres_max_N`` caps the unpadded spatial grid (bilinear downscale when
the grid exceeds N full-crop areas by >1.1x, reference
llava_onevision.py:679-688), and VIDEO inputs run each frame through the
tower+projector then 2x2 bilinear pooling (``apply_pooling``,
reference :holds stride=2), flattened across frames with one
image_newline terminator.

All grid shapes are static per (image size | frame count), so each
distinct layout jits once; videos dispatch through the same
``encode_images`` entry with ``grid_thw=("video", F)``.
"""

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_pq_tpu.models.llava_next import LlavaNextModel
from vllm_pq_tpu.multimodal.llava_next import (anyres_grid_shape,
                                               unpad_slices)


def onevision_downscale_shape(rows: int, cols: int, side: int,
                              max_patches: int) -> Tuple[int, int]:
    """Post-unpad grid shape after the anyres_max cap (host math)."""
    ratio = math.sqrt(rows * cols / (max_patches * side ** 2))
    if ratio > 1.1:
        return int(rows // ratio), int(cols // ratio)
    return rows, cols


def onevision_feature_span(orig_hw, pinpoints, vision_size: int,
                           patch_size: int, max_patches: int) -> int:
    """Image placeholder span: base crop + capped unpadded grid with one
    newline per row (reference merge_image_patch_embeddings)."""
    side = vision_size // patch_size
    nph, npw = anyres_grid_shape(orig_hw, pinpoints, vision_size)
    if nph * npw <= 1:
        return side * side + 1  # base + lone newline
    rs, cs = unpad_slices(orig_hw, (nph * side, npw * side))
    rows, cols = onevision_downscale_shape(
        rs.stop - rs.start, cs.stop - cs.start, side, max_patches)
    return side * side + rows * (cols + 1)


def onevision_video_span(num_frames: int, vision_size: int,
                         patch_size: int, stride: int = 2) -> int:
    side = vision_size // patch_size
    pooled = math.ceil(side / stride) ** 2
    return num_frames * pooled + 1  # trailing newline


def interpolate_bilinear(x: jax.Array, out_hw: Tuple[int, int]
                         ) -> jax.Array:
    """torch ``F.interpolate(mode="bilinear", align_corners=False)``
    equivalent: half-pixel centers, 2-tap kernel, NO antialiasing
    (jax.image.resize antialiases on downsample, which diverges from
    the HF reference numerics)."""
    ih, iw, d = x.shape
    oh, ow = out_hw

    def taps(n_in, n_out):
        src = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) \
            * (n_in / n_out) - 0.5
        src = jnp.clip(src, 0.0, n_in - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w = src - lo.astype(jnp.float32)
        return lo, hi, w

    rlo, rhi, rw = taps(ih, oh)
    clo, chi, cw = taps(iw, ow)
    xf = x.astype(jnp.float32)
    top = xf[rlo] * (1 - rw)[:, None, None] + xf[rhi] * rw[:, None, None]
    out = (top[:, clo] * (1 - cw)[None, :, None]
           + top[:, chi] * cw[None, :, None])
    return out.astype(x.dtype)


class LlavaOnevisionModel(LlavaNextModel):

    def __init__(self, *args, vision_aspect_ratio: str = "anyres_max_9",
                 video_token_index: int = 32001, **kw):
        super().__init__(*args, **kw)
        self.max_patches = int(
            vision_aspect_ratio.removeprefix("anyres_max_") or 9)
        self.video_token_index = video_token_index

    def encode_images(self, vision_params: Dict, pixels: jax.Array,
                      grid_thw: Tuple = None) -> jax.Array:
        if grid_thw is not None and grid_thw[0] == "video":
            return self._encode_video(vision_params, pixels)
        orig_hw = grid_thw
        feats = self.vision_tower(vision_params["tower"], pixels)
        proj = self.projector(vision_params["projector"], feats)
        base = proj[0]                                 # [side*side, D]
        vs = self.vision_cfg.image_size
        side = vs // self.vision_cfg.patch_size
        d = proj.shape[-1]
        newline = vision_params["image_newline"]["weight"].astype(
            proj.dtype)
        nph, npw = anyres_grid_shape(orig_hw, self.image_grid_pinpoints,
                                     vs)
        if nph * npw <= 1:
            return jnp.concatenate([base, newline[None]], axis=0)
        grid = proj[1:].reshape(nph, npw, side, side, d)
        grid = grid.transpose(0, 2, 1, 3, 4).reshape(nph * side,
                                                     npw * side, d)
        rs, cs = unpad_slices(orig_hw, (nph * side, npw * side))
        grid = grid[rs, cs]
        rows, cols = onevision_downscale_shape(
            grid.shape[0], grid.shape[1], side, self.max_patches)
        if (rows, cols) != grid.shape[:2]:
            grid = interpolate_bilinear(grid, (rows, cols))
        rows_nl = jnp.concatenate(
            [grid, jnp.broadcast_to(newline, (grid.shape[0], 1, d))],
            axis=1)
        return jnp.concatenate([base, rows_nl.reshape(-1, d)], axis=0)

    def _encode_video(self, vision_params: Dict,
                      frames: jax.Array) -> jax.Array:
        """frames [F, 3, vs, vs] -> [F*pooled + 1, D] (apply_pooling
        stride 2 + one trailing newline)."""
        feats = self.vision_tower(vision_params["tower"], frames)
        proj = self.projector(vision_params["projector"], feats)
        f, _, d = proj.shape
        side = self.vision_cfg.image_size // self.vision_cfg.patch_size
        ph, pw = math.ceil(side / 2), math.ceil(side / 2)
        grid = proj.reshape(f, side, side, d)
        pooled = jax.vmap(
            lambda fr: interpolate_bilinear(fr, (ph, pw)))(grid)
        newline = vision_params["image_newline"]["weight"].astype(
            proj.dtype)
        return jnp.concatenate(
            [pooled.reshape(-1, d), newline[None]], axis=0)
