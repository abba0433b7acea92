"""Phi-3-Vision — role of reference ``model_executor/models/phi3v.py``.

Composition: CLIP ViT-L/14-336 tower (feature layer -2, CLS dropped) +
the HD transform (2x2 spatial-to-channel merge, per-row ``sub_GN``
newline separators, ``glb_GN`` between the sub-image grid and the
global crop, order ``sub_glb``) + a 2-layer GELU projector + the Phi-3
decoder.

Per image the engine receives pixels [num_crops+1, 3, 336, 336] with
the GLOBAL crop FIRST (HF processor layout) and a static
(h_crop, w_crop) grid; each distinct grid jits once.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
from vllm_pq_tpu.multimodal.clip import CLIPVisionTower
from vllm_pq_tpu.quantization.methods import LinearMethod


def phi3v_feature_span(h_crop: int, w_crop: int, side2: int = 12) -> int:
    """Token span per image: sub grid with per-row newlines + glb_GN +
    global crop with per-row newlines (reference phi3v.py
    hd_feature_transform)."""
    return (h_crop * side2 * (w_crop * side2 + 1) + 1
            + side2 * (side2 + 1))


class Phi3VModel(LlamaModel):

    def __init__(self, cfg: LlamaConfig, vision_cfg,
                 linear_method: LinearMethod,
                 image_token_index: int = 32044,
                 vision_feature_layer: int = -2):
        super().__init__(cfg, linear_method)
        self.vision_cfg = vision_cfg
        self.image_token_index = image_token_index
        self.vision_tower = CLIPVisionTower(vision_cfg,
                                            vision_feature_layer)

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        dt = self.cfg.dtype
        c4 = self.vision_cfg.hidden_size * 4
        h = self.cfg.hidden_size
        shapes["vision"] = {
            "tower": self.vision_tower.param_shapes(dt),
            "glb_GN": {"weight": ((c4,), dt)},
            "sub_GN": {"weight": ((c4,), dt)},
            "projector": {
                "linear_1": {"weight": ((c4, h), dt), "bias": ((h,), dt)},
                "linear_2": {"weight": ((h, h), dt), "bias": ((h,), dt)},
            },
        }
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.param_shapes()["vision"],
            is_leaf=lambda v: isinstance(v, tuple))
        return specs

    def _merge_2x2(self, feats: jax.Array, h_crop: int,
                   w_crop: int) -> jax.Array:
        """[n_crops, side*side, C] -> [h_crop*side/2, w_crop*side/2, 4C]
        (reference reshape_hd_patches_2x2merge)."""
        n, l, c = feats.shape
        side = int(l ** 0.5)
        s2 = side // 2
        x = feats.reshape(n, s2, 2, s2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, s2 * s2, 4 * c)
        x = x.reshape(h_crop, w_crop, s2, s2, 4 * c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(h_crop * s2, w_crop * s2,
                                               4 * c)
        return x

    def _newline(self, grid: jax.Array, sub_gn: jax.Array) -> jax.Array:
        h, w, d = grid.shape
        nl = jnp.broadcast_to(sub_gn.astype(grid.dtype), (h, 1, d))
        return jnp.concatenate([grid, nl], axis=1).reshape(-1, d)

    def encode_images(self, vision_params: Dict, pixels: jax.Array,
                      grid_thw: Tuple[int, int] = None) -> jax.Array:
        """pixels [num_crops+1, 3, S, S] (global first) + static
        (h_crop, w_crop) -> [span, text_hidden]."""
        h_crop, w_crop = grid_thw
        feats = self.vision_tower(vision_params["tower"], pixels)
        feats = feats[:, 1:]  # drop CLS ("patch" feature type)
        sub_gn = vision_params["sub_GN"]["weight"]
        glb_gn = vision_params["glb_GN"]["weight"]
        glb = self._merge_2x2(feats[0:1], 1, 1)
        glb = self._newline(glb, sub_gn)
        sub = self._merge_2x2(feats[1:1 + h_crop * w_crop], h_crop,
                              w_crop)
        sub = self._newline(sub, sub_gn)
        emb = jnp.concatenate(
            [sub, glb_gn.astype(sub.dtype)[None], glb], axis=0)
        pp = vision_params["projector"]
        y = jnp.dot(emb, pp["linear_1"]["weight"],
                    preferred_element_type=jnp.float32) \
            + pp["linear_1"]["bias"].astype(jnp.float32)
        y = jax.nn.gelu(y, approximate=False)
        y = jnp.dot(y.astype(emb.dtype), pp["linear_2"]["weight"],
                    preferred_element_type=jnp.float32) \
            + pp["linear_2"]["bias"].astype(jnp.float32)
        return y.astype(emb.dtype)
