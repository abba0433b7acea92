"""DeepSeek-VL2 — role of reference
``model_executor/models/deepseek_vl2.py``.

Composition: SigLIP tower + the ``downsample_mlp_gelu`` MlpProjector
(2x2 space-to-channel unfold then Linear/GELU stack) + learned
``image_newline`` / ``view_seperator`` tokens + the DeepSeek-V2 MLA
decoder. Global view rows each end with image_newline; local tile grids
are reassembled ``(th h) (tw w)`` with a newline per row; the two views
join around the view separator per ``global_view_pos``.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.deepseek import DeepseekConfig, DeepseekV2Model


def deepseek_vl2_span(side2: int, tw: int, th: int) -> int:
    """Placeholder span: global h*(w+1) + separator + local
    (th*h)*(tw*w+1) (reference deepseek_vl2.py:160)."""
    g = side2 * (side2 + 1)
    loc = (th * side2) * (tw * side2 + 1) if th * tw > 0 else 0
    return g + 1 + loc


class DeepseekVL2Model(DeepseekV2Model):

    def __init__(self, cfg: DeepseekConfig, vision_cfg,
                 image_token_index: int = 100015,
                 downsample_ratio: int = 2,
                 projector_depth: int = 2, mlp_ratio: int = 1,
                 global_view_pos: str = "head"):
        super().__init__(cfg)
        self.vision_cfg = vision_cfg
        self.image_token_index = image_token_index
        self.downsample_ratio = downsample_ratio
        self.projector_depth = projector_depth
        self.mlp_ratio = mlp_ratio
        self.global_view_pos = global_view_pos
        from vllm_pq_tpu.multimodal.siglip import SiglipVisionTower
        self.vision_tower = SiglipVisionTower(vision_cfg)

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        dt = self.cfg.dtype
        vh = self.vision_cfg.hidden_size
        d = self.cfg.hidden_size
        r = self.downsample_ratio
        mid = d * self.mlp_ratio
        proj = {"layers": [
            {"weight": ((vh * r * r, mid), dt), "bias": ((mid,), dt)}]}
        for _ in range(1, self.projector_depth - 1):
            proj["layers"].append({"weight": ((mid, mid), dt),
                                   "bias": ((mid,), dt)})
        proj["layers"].append({"weight": ((mid, d), dt),
                               "bias": ((d,), dt)})
        shapes["vision"] = {
            "tower": self.vision_tower.param_shapes(dt),
            "projector": proj,
            "image_newline": {"weight": ((d,), dt)},
            "view_seperator": {"weight": ((d,), dt)},
        }
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.param_shapes()["vision"],
            is_leaf=lambda v: isinstance(v, tuple))
        return specs

    def _project(self, pp: Dict, feats: jax.Array) -> jax.Array:
        """[n, hw, vh] -> [n, hw/r^2, text_hidden] (downsample_mlp_gelu,
        reference MlpProjector.forward)."""
        n, hw, vh = feats.shape
        side = int(hw ** 0.5)
        r = self.downsample_ratio
        x = feats.reshape(n, side, side, vh)
        s2 = side // r
        # F.unfold(kernel=stride=r): channel order (C, kh, kw) per patch
        x = x.reshape(n, s2, r, s2, r, vh)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(n, s2 * s2, vh * r * r)
        for i, layer in enumerate(pp["layers"]):
            if i > 0:
                x = jax.nn.gelu(x.astype(jnp.float32),
                                approximate=False).astype(x.dtype)
            x = (jnp.dot(x, layer["weight"],
                         preferred_element_type=jnp.float32)
                 + layer["bias"].astype(jnp.float32)).astype(x.dtype)
        return x

    def encode_images(self, vision_params: Dict, pixels: jax.Array,
                      grid_thw: Tuple[int, int] = None) -> jax.Array:
        """pixels [1 + tw*th, 3, S, S] (global first) + static (tw, th)
        -> [span, text_hidden]."""
        tw, th = grid_thw if grid_thw is not None else (0, 0)
        feats = self.vision_tower(vision_params["tower"], pixels)
        emb = self._project(vision_params["projector"], feats)
        n, hw, d = emb.shape
        h = w = int(hw ** 0.5)
        nl = vision_params["image_newline"]["weight"].astype(emb.dtype)
        sep = vision_params["view_seperator"]["weight"].astype(emb.dtype)
        glb = emb[0].reshape(h, w, d)
        glb = jnp.concatenate(
            [glb, jnp.broadcast_to(nl, (h, 1, d))], axis=1).reshape(-1, d)
        parts = [glb, sep[None]]
        if th * tw > 0:
            loc = emb[1:1 + th * tw].reshape(th, tw, h, w, d)
            loc = loc.transpose(0, 2, 1, 3, 4).reshape(th * h, tw * w, d)
            loc = jnp.concatenate(
                [loc, jnp.broadcast_to(nl, (th * h, 1, d))],
                axis=1).reshape(-1, d)
            if self.global_view_pos == "head":
                parts = [glb, sep[None], loc]
            else:
                parts = [loc, sep[None], glb]
        return jnp.concatenate(parts, axis=0)
