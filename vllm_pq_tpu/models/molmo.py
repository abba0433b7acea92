"""Molmo — role of reference ``model_executor/models/molmo.py``.

Composition: CLIP-style ViT over PRE-PATCHIFIED crops (patch linear,
CLS + 577 learned positions, pre-LN resblocks with separate wq/wk/wv),
features from layers (-2, -9) concatenated → 2x2 attention pooling
(mean-query MultiHeadDotProductAttention) → SwiGLU image projector —
on a llama-math decoder with fused ``att_proj``, MulAndSilu ``ff_proj``
(multiplier half FIRST), optional full-width qk RMSNorm
(``attention_layer_norm``) and the norm-after block
(``MolmoDecoderNormAfterLayer`` = the OLMo2 block style). The
embedding table carries 128 ADDITIONAL_VOCAB_SIZE learned rows beyond
``embedding_size`` (the image special tokens); logits stay at
``embedding_size``.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
from vllm_pq_tpu.quantization.methods import LinearMethod

VIT_LAYERS = (-2, -9)
POOL = 2


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)
            * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MolmoModel(LlamaModel):

    def __init__(self, cfg: LlamaConfig, linear_method: LinearMethod,
                 image_patch_id: int, vis_overrides: dict = None):
        super().__init__(cfg, linear_method)
        # VisionBackboneConfig defaults (reference molmo.py:101); the
        # reference hardcodes these (they are NOT in Molmo configs) —
        # overrides exist for the tiny test checkpoints
        self.vis = dict(image_size=336, patch_size=14, emb=1024,
                        heads=16, layers=23, mlp=4096, num_pos=577,
                        eps=1e-5)
        if vis_overrides:
            self.vis.update(vis_overrides)
        self.vit_layers = tuple(self.vis.get("vit_layers", VIT_LAYERS))
        self.image_token_index = image_patch_id

    @property
    def num_image_tokens(self) -> int:
        side = self.vis["image_size"] // self.vis["patch_size"]
        return ((side + 1) // POOL) ** 2

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        dt = self.cfg.dtype
        v = self.vis
        e, mlp = v["emb"], v["mlp"]
        cat = e * len(self.vit_layers)
        th = self.cfg.hidden_size
        inter = self.cfg.intermediate_size

        def lin(i, o, bias=True):
            d = {"weight": ((i, o), dt)}
            if bias:
                d["bias"] = ((o,), dt)
            return d

        def ln(n):
            return {"weight": ((n,), dt), "bias": ((n,), dt)}
        layer = {
            "attention_norm": ln(e), "ffn_norm": ln(e),
            "wq": lin(e, e), "wk": lin(e, e), "wv": lin(e, e),
            "wo": lin(e, e),
            "w1": lin(e, mlp), "w2": lin(mlp, e),
        }
        shapes["vision"] = {
            "tower": {
                "patch_embedding": {
                    "weight": ((v["patch_size"] ** 2 * 3, e), dt)},
                "class_embedding": {"weight": ((e,), dt)},
                "positional_embedding": {"weight": ((v["num_pos"], e),
                                                    dt)},
                "pre_ln": ln(e),
                "layers": [dict(layer) for _ in range(v["layers"])],
            },
            "pooling": {
                "wq": lin(cat, e), "wk": lin(cat, e),
                "wv": lin(cat, e), "wo": lin(e, e),
            },
            "projector": {
                "w1": lin(e, inter, bias=False),
                "w3": lin(e, inter, bias=False),
                "w2": lin(inter, th, bias=False),
            },
            "pad_embed": {"weight": ((2, cat), dt)},
        }
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.param_shapes()["vision"],
            is_leaf=lambda v: isinstance(v, tuple))
        return specs

    def _vit_attn(self, p, q_in, kv_in, heads, hd):
        def lin(pp, u):
            y = jnp.dot(u, pp["weight"],
                        preferred_element_type=jnp.float32)
            if "bias" in pp:
                y = y + pp["bias"].astype(jnp.float32)
            return y.astype(u.dtype)
        b, tq = q_in.shape[:2]
        tk = kv_in.shape[1]
        q = lin(p["wq"], q_in).reshape(b, tq, heads, hd)
        k = lin(p["wk"], kv_in).reshape(b, tk, heads, hd)
        v = lin(p["wv"], kv_in).reshape(b, tk, heads, hd)
        sc = jnp.einsum("bqhd,bkhd->bhqk",
                        q.astype(jnp.float32) * (hd ** -0.5),
                        k.astype(jnp.float32))
        probs = jax.nn.softmax(sc, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        return lin(p["wo"], ctx.reshape(b, tq, heads * hd))

    def encode_images(self, vision_params: Dict, pixels: jax.Array,
                      grid_thw: Tuple = None) -> jax.Array:
        """pixels [B, 3, S, S] (one crop per image; the base-resolution
        path) -> [B, (side/2)^2, text_hidden]."""
        v = self.vis
        tw = vision_params["tower"]
        b = pixels.shape[0]
        ps = v["patch_size"]
        side = v["image_size"] // ps
        e = v["emb"]
        heads = v["heads"]
        hd = e // heads
        eps = v["eps"]

        # patchify in the HF-processor order: (h, dh, w, dw, c) ->
        # [h*w, dh*dw*c]
        x = pixels.transpose(0, 2, 3, 1)                # [B, S, S, 3]
        x = x.reshape(b, side, ps, side, ps, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, side * side,
                                                  ps * ps * 3)
        x = jnp.dot(x, tw["patch_embedding"]["weight"],
                    preferred_element_type=jnp.float32).astype(
            pixels.dtype)
        cls = jnp.broadcast_to(tw["class_embedding"]["weight"],
                               (b, 1, e)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + tw["positional_embedding"]["weight"][None].astype(
            x.dtype)
        x = _ln(x, tw["pre_ln"], eps)

        hiddens = []
        for lp in tw["layers"]:
            xn = _ln(x, lp["attention_norm"], eps)
            x = x + self._vit_attn(lp, xn, xn, heads, hd)
            h_in = _ln(x, lp["ffn_norm"], eps)
            y = jnp.dot(h_in, lp["w1"]["weight"],
                        preferred_element_type=jnp.float32) \
                + lp["w1"]["bias"].astype(jnp.float32)
            y = _quick_gelu(y)
            y = (jnp.dot(y.astype(x.dtype), lp["w2"]["weight"],
                         preferred_element_type=jnp.float32)
                 + lp["w2"]["bias"].astype(jnp.float32)).astype(x.dtype)
            x = x + y
            hiddens.append(x)
        feats = jnp.concatenate([hiddens[i] for i in self.vit_layers],
                                axis=-1)          # [B, 1+side^2, 2e]
        feats = feats[:, 1:]                      # drop CLS
        cat = feats.shape[-1]

        # 2x2 attention pooling with a mean query (reference
        # MolmoVisionBackbone.forward)
        g = side // POOL
        cells = feats.reshape(b, g, POOL, g, POOL, cat)
        cells = cells.transpose(0, 1, 3, 2, 4, 5).reshape(
            b * g * g, POOL * POOL, cat)
        query = cells.mean(axis=1, keepdims=True)
        pooled = self._vit_attn(vision_params["pooling"], query, cells,
                                heads, hd)
        pooled = pooled.reshape(b, g * g, e)

        pp = vision_params["projector"]
        gate = jnp.dot(pooled, pp["w1"]["weight"],
                       preferred_element_type=jnp.float32)
        up = jnp.dot(pooled, pp["w3"]["weight"],
                     preferred_element_type=jnp.float32)
        y = (jax.nn.silu(gate) * up).astype(pooled.dtype)
        return jnp.dot(y, pp["w2"]["weight"],
                       preferred_element_type=jnp.float32).astype(
            pooled.dtype)
