"""MiniCPM-V / MiniCPM-O — role of reference
``model_executor/models/minicpmv.py`` (+ ``layers/resampler.py``).

Composition: SigLIP NaViT tower (idefics3-style bucketized positions
for the full-square path) + the perceiver ``Resampler2_5`` — learned
queries, kv_proj into the LLM width, 2D sincos position embeddings
added to the KEYS, one nn.MultiheadAttention cross-attention, ln_post
and a learned ``proj`` matrix — + the version-dependent LM (2.0:
MiniCPM scalings; 2.5: Llama-3; >= 2.6: Qwen2). MiniCPM-O shares the
image path (its audio/TTS heads are unused at serving time — reference
minicpmo.py routes audio through the same decoder).

Each image contributes exactly ``query_num`` spliced tokens.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
from vllm_pq_tpu.quantization.methods import LinearMethod


def sincos_2d(embed_dim: int, h: int, w: int) -> np.ndarray:
    """get_2d_sincos_pos_embed version (2,5): [h, w, D] — half the dims
    encode the row coordinate, half the column (reference
    layers/resampler.py:115)."""
    def one(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("hw,d->hwd", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)
    gw, gh = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    return np.concatenate([one(embed_dim // 2, gh),
                           one(embed_dim // 2, gw)], axis=-1)


def _ln(x, p, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)
            * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


class MiniCPMVModel(LlamaModel):

    def __init__(self, cfg: LlamaConfig, vision_cfg,
                 linear_method: LinearMethod,
                 image_token_index: int = 128244,
                 query_num: int = 64):
        super().__init__(cfg, linear_method)
        self.vision_cfg = vision_cfg
        self.image_token_index = image_token_index
        self.query_num = query_num
        from vllm_pq_tpu.multimodal.siglip import SiglipVisionTower
        side = vision_cfg.image_size // vision_cfg.patch_size
        ax = np.maximum(np.arange(side) - 1, 0)
        pos_ids = (ax[:, None] * side + ax[None, :]).reshape(-1)
        self.vision_tower = SiglipVisionTower(vision_cfg,
                                              position_ids=pos_ids)

    @property
    def num_image_tokens(self) -> int:
        return self.query_num

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        dt = self.cfg.dtype
        vh = self.vision_cfg.hidden_size
        d = self.cfg.hidden_size  # resampler embed_dim = LLM width

        def ln(n):
            return {"weight": ((n,), dt), "bias": ((n,), dt)}
        shapes["vision"] = {
            "tower": self.vision_tower.param_shapes(dt),
            "resampler": {
                "query": {"weight": ((self.query_num, d), dt)},
                "kv_proj": {"weight": ((vh, d), dt)},
                "ln_q": ln(d), "ln_kv": ln(d), "ln_post": ln(d),
                "in_proj": {"weight": ((3 * d, d), dt),
                            "bias": ((3 * d,), dt)},
                "out_proj": {"weight": ((d, d), dt), "bias": ((d,), dt)},
                "proj": {"weight": ((d, d), dt)},
            },
        }
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.param_shapes()["vision"],
            is_leaf=lambda v: isinstance(v, tuple))
        return specs

    def encode_images(self, vision_params: Dict, pixels: jax.Array,
                      grid_thw: Tuple = None) -> jax.Array:
        """pixels [B, 3, S, S] -> [B, query_num, text_hidden]."""
        feats = self.vision_tower(vision_params["tower"], pixels)
        rp = vision_params["resampler"]
        b, l, vh = feats.shape
        d = self.cfg.hidden_size
        side = self.vision_cfg.image_size // self.vision_cfg.patch_size
        heads = max(d // 128, 1)
        hd = d // heads

        kv = jnp.dot(feats, rp["kv_proj"]["weight"],
                     preferred_element_type=jnp.float32).astype(
            feats.dtype)
        kv = _ln(kv, rp["ln_kv"])
        pos = jnp.asarray(sincos_2d(d, side, side).reshape(l, d),
                          kv.dtype)
        q = _ln(rp["query"]["weight"].astype(kv.dtype)[None], rp["ln_q"])
        q = jnp.broadcast_to(q, (b, self.query_num, d))

        wq, wk, wv = jnp.split(rp["in_proj"]["weight"], 3, axis=0)
        bq, bk, bv = jnp.split(rp["in_proj"]["bias"], 3, axis=0)

        def proj(x, w, bias):
            return (jnp.dot(x, w.T, preferred_element_type=jnp.float32)
                    + bias.astype(jnp.float32)).astype(x.dtype)
        q2 = proj(q, wq, bq).reshape(b, self.query_num, heads, hd)
        k2 = proj(kv + pos[None], wk, bk).reshape(b, l, heads, hd)
        v2 = proj(kv, wv, bv).reshape(b, l, heads, hd)
        sc = jnp.einsum("bqhd,bkhd->bhqk",
                        q2.astype(jnp.float32) * (hd ** -0.5),
                        k2.astype(jnp.float32))
        probs = jax.nn.softmax(sc, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v2.dtype), v2)
        # out_proj stored torch-style [out, in] (proj() applies x @ w.T)
        out = proj(ctx.reshape(b, self.query_num, d),
                   rp["out_proj"]["weight"], rp["out_proj"]["bias"])
        out = _ln(out, rp["ln_post"])
        return jnp.dot(out, rp["proj"]["weight"],
                       preferred_element_type=jnp.float32).astype(
            out.dtype)
