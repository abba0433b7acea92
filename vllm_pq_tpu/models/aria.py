"""Aria (rhymes-ai) — role of reference ``model_executor/models/aria.py``.

Composition: an Idefics3/SigLIP vision tower + the AriaProjector (a
learned-query cross-attention block with the rhymes-ai double-projection
quirk: q/k/v pre-projections feed a standard MHA that projects AGAIN
with its packed in_proj, then out_proj -> linear -> LN -> gelu_new MLP)
+ a llama decoder whose MLP is a grouped-expert MoE (top-k then softmax
routing == renormalized softmax; fused fc1 chunks into
silu(projection) * gate) with ungated shared experts.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.qwen2_moe import Qwen2MoeConfig, Qwen2MoeModel
from vllm_pq_tpu.quantization.methods import LinearMethod


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)
            * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


class AriaModel(Qwen2MoeModel):

    def __init__(self, cfg: Qwen2MoeConfig, vision_cfg,
                 linear_method: LinearMethod,
                 image_token_index: int = 9,
                 patch_to_query: Dict[int, int] = None,
                 max_query: int = 256):
        super().__init__(cfg, linear_method)
        self.vision_cfg = vision_cfg
        self.image_token_index = image_token_index
        self.patch_to_query = patch_to_query or {1225: 128, 4900: 256}
        self.max_query = max_query
        import numpy as np

        from vllm_pq_tpu.multimodal.siglip import SiglipVisionTower
        # idefics3 NaViT bucketized position ids for a full square
        # image: pos(row k, col j) = max(k-1,0)*side + max(j-1,0)
        # (models/idefics3.py — the tower is the same)
        side = vision_cfg.image_size // vision_cfg.patch_size
        ax = np.maximum(np.arange(side) - 1, 0)
        pos_ids = (ax[:, None] * side + ax[None, :]).reshape(-1)
        self.vision_tower = SiglipVisionTower(vision_cfg,
                                              position_ids=pos_ids)

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        dt = self.cfg.dtype
        vh = self.vision_cfg.hidden_size
        th = self.cfg.hidden_size

        def lin(i, o, bias=True):
            d = {"weight": ((i, o), dt)}
            if bias:
                d["bias"] = ((o,), dt)
            return d

        def ln(n):
            return {"weight": ((n,), dt), "bias": ((n,), dt)}
        shapes["vision"] = {
            "tower": self.vision_tower.param_shapes(dt),
            "projector": {
                "query": {"weight": ((self.max_query, vh), dt)},
                "q_proj": lin(vh, vh, False),
                "k_proj": lin(vh, vh, False),
                "v_proj": lin(vh, vh, False),
                "in_proj": {"weight": ((3 * vh, vh), dt),
                            "bias": ((3 * vh,), dt)},
                "out_proj": lin(vh, vh),
                "linear": lin(vh, vh),
                "layer_norm_q": ln(vh),
                "layer_norm_kv": ln(vh),
                "layer_norm": ln(vh),
                "ffn_in": lin(vh, th, False),
                "ffn_out": lin(th, th, False),
            },
        }
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.param_shapes()["vision"],
            is_leaf=lambda v: isinstance(v, tuple))
        return specs

    def encode_images(self, vision_params: Dict,
                      pixels: jax.Array,
                      grid_thw: Tuple = None) -> jax.Array:
        """pixels [N, 3, S, S] -> [N * query_num, text_hidden]."""
        feats = self.vision_tower(vision_params["tower"], pixels)
        pp = vision_params["projector"]
        n, num_patches, vh = feats.shape
        qn = self.patch_to_query.get(num_patches, self.max_query)
        heads = self.vision_cfg.num_attention_heads
        hd = vh // heads

        def lin(p, x):
            y = jnp.dot(x, p["weight"],
                        preferred_element_type=jnp.float32)
            if "bias" in p:
                y = y + p["bias"].astype(jnp.float32)
            return y.astype(x.dtype)

        queries = jnp.broadcast_to(
            pp["query"]["weight"][:qn][None], (n, qn, vh))
        q = lin(pp["q_proj"], _ln(queries, pp["layer_norm_q"]))
        kvs = _ln(feats, pp["layer_norm_kv"])
        k = lin(pp["k_proj"], kvs)
        v = lin(pp["v_proj"], kvs)
        # nn.MultiheadAttention projects AGAIN with the packed in_proj
        # (reference aria.py AriaCrossAttention / rhymes-ai projector.py)
        wq, wk, wv = jnp.split(pp["in_proj"]["weight"], 3, axis=0)
        bq, bk, bv = jnp.split(pp["in_proj"]["bias"], 3, axis=0)

        def proj2(x, w, b):
            return (jnp.dot(x, w.T, preferred_element_type=jnp.float32)
                    + b.astype(jnp.float32)).astype(x.dtype)
        q2 = proj2(q, wq, bq).reshape(n, qn, heads, hd)
        k2 = proj2(k, wk, bk).reshape(n, num_patches, heads, hd)
        v2 = proj2(v, wv, bv).reshape(n, num_patches, heads, hd)
        sc = jnp.einsum("bqhd,bkhd->bhqk",
                        q2.astype(jnp.float32) * (hd ** -0.5),
                        k2.astype(jnp.float32))
        probs = jax.nn.softmax(sc, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v2.dtype), v2)
        attn = lin(pp["out_proj"], ctx.reshape(n, qn, vh))
        attn = lin(pp["linear"], attn)
        out = _ln(attn, pp["layer_norm"])
        from vllm_pq_tpu.layers.activation import ACT2FN
        h = ACT2FN["gelu_new"](lin(pp["ffn_in"], out)
                               .astype(jnp.float32)).astype(out.dtype)
        return lin(pp["ffn_out"], h)        # [N, query_num, text_hidden]
