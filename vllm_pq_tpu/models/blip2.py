"""BLIP-2 (vision-language) — role of reference
``model_executor/models/blip2.py``.

Composition: BLIP ViT (fused-qkv pre-LN encoder, post-LN output) +
Q-Former (32 learned query tokens, BERT-style post-LN blocks with
cross-attention over the vision states every
``cross_attention_frequency`` layers) + linear language projection +
an OPT language model. Every image contributes exactly
``num_query_tokens`` spliced rows — the generic ``mm`` machinery
(models/opt.py mm kwarg) carries them."""

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.opt import OPTConfig, OPTModel
from vllm_pq_tpu.quantization.methods import LinearMethod


@dataclass
class Blip2VisionCfg:
    hidden_size: int = 1408
    intermediate_size: int = 6144
    num_hidden_layers: int = 39
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-6

    @classmethod
    def from_hf(cls, hf) -> "Blip2VisionCfg":
        return cls(hidden_size=hf.hidden_size,
                   intermediate_size=hf.intermediate_size,
                   num_hidden_layers=hf.num_hidden_layers,
                   num_attention_heads=hf.num_attention_heads,
                   image_size=hf.image_size, patch_size=hf.patch_size,
                   layer_norm_eps=getattr(hf, "layer_norm_eps", 1e-6))

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclass
class Blip2QFormerCfg:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    cross_attention_frequency: int = 2
    encoder_hidden_size: int = 1408
    layer_norm_eps: float = 1e-12

    @classmethod
    def from_hf(cls, hf) -> "Blip2QFormerCfg":
        return cls(hidden_size=hf.hidden_size,
                   num_hidden_layers=hf.num_hidden_layers,
                   num_attention_heads=hf.num_attention_heads,
                   intermediate_size=hf.intermediate_size,
                   cross_attention_frequency=hf.cross_attention_frequency,
                   encoder_hidden_size=hf.encoder_hidden_size,
                   layer_norm_eps=getattr(hf, "layer_norm_eps", 1e-12))


def _ln(x, p, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["weight"]
            + p["bias"]).astype(x.dtype)


def _lin(i, o, dt, bias=True):
    d = {"weight": ((i, o), dt)}
    if bias:
        d["bias"] = ((o,), dt)
    return d


def _apply(p, u):
    y = jnp.dot(u, p["weight"], preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(u.dtype)


class Blip2Model(OPTModel):

    def __init__(self, cfg: OPTConfig, vision_cfg: Blip2VisionCfg,
                 qformer_cfg: Blip2QFormerCfg,
                 linear_method: LinearMethod,
                 num_query_tokens: int = 32,
                 image_token_index: int = 50265):
        super().__init__(cfg, linear_method)
        self.vision_cfg = vision_cfg
        self.qformer_cfg = qformer_cfg
        self.num_query_tokens = num_query_tokens
        self.image_token_index = image_token_index

    @property
    def num_image_tokens(self) -> int:
        return self.num_query_tokens

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        v, qf = self.vision_cfg, self.qformer_cfg
        dt = self.cfg.dtype
        h, i = v.hidden_size, v.intermediate_size
        lnv = {"weight": ((h,), dt), "bias": ((h,), dt)}
        vit_layer = {
            "layer_norm1": dict(lnv), "layer_norm2": dict(lnv),
            "qkv": _lin(h, 3 * h, dt),
            "projection": _lin(h, h, dt),
            "fc1": _lin(h, i, dt), "fc2": _lin(i, h, dt),
        }
        qh, qi = qf.hidden_size, qf.intermediate_size
        lnq = {"weight": ((qh,), dt), "bias": ((qh,), dt)}
        qf_layers = []
        for li in range(qf.num_hidden_layers):
            layer = {
                "attention": {
                    "query": _lin(qh, qh, dt), "key": _lin(qh, qh, dt),
                    "value": _lin(qh, qh, dt),
                    "out": _lin(qh, qh, dt), "out_ln": dict(lnq),
                },
                "intermediate_query": _lin(qh, qi, dt),
                "output_query": _lin(qi, qh, dt),
                "output_query_ln": dict(lnq),
            }
            if li % qf.cross_attention_frequency == 0:
                layer["crossattention"] = {
                    "query": _lin(qh, qh, dt),
                    "key": _lin(qf.encoder_hidden_size, qh, dt),
                    "value": _lin(qf.encoder_hidden_size, qh, dt),
                    "out": _lin(qh, qh, dt), "out_ln": dict(lnq),
                }
            qf_layers.append(layer)
        shapes["vision"] = {
            "tower": {
                "class_embedding": {"weight": ((h,), dt)},
                "patch_embedding": _lin(
                    v.patch_size * v.patch_size * 3, h, dt),
                "position_embedding": {
                    "weight": ((v.num_patches + 1, h), dt)},
                "post_layernorm": dict(lnv),
                "layers": [dict(vit_layer)
                           for _ in range(v.num_hidden_layers)],
            },
            "qformer": {
                "query_tokens": {
                    "weight": ((self.num_query_tokens, qh), dt)},
                "layernorm": dict(lnq),
                "layers": qf_layers,
            },
            "projector": {"linear": _lin(qh, self.cfg.hidden_size, dt)},
        }
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.param_shapes()["vision"],
            is_leaf=lambda u: isinstance(u, tuple))
        return specs

    def _vit(self, tp: Dict, pixels: jax.Array) -> jax.Array:
        v = self.vision_cfg
        eps = v.layer_norm_eps
        b = pixels.shape[0]
        ps = v.patch_size
        g = v.image_size // ps
        x = pixels.reshape(b, 3, g, ps, g, ps)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(b, g * g, ps * ps * 3)
        x = _apply(tp["patch_embedding"], x.astype(pixels.dtype))
        cls = jnp.broadcast_to(tp["class_embedding"]["weight"],
                               (b, 1, v.hidden_size)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + tp["position_embedding"]["weight"]
        nh = v.num_attention_heads
        d = v.hidden_size // nh
        scale = d ** -0.5
        for lp in tp["layers"]:
            h_in = _ln(x, lp["layer_norm1"], eps)
            t = h_in.shape[1]
            qkv = _apply(lp["qkv"], h_in).reshape(b, t, 3, nh, d)
            q, k, vv = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            sc = jnp.einsum("bqhd,bkhd->bhqk",
                            q.astype(jnp.float32) * scale,
                            k.astype(jnp.float32))
            p2 = jax.nn.softmax(sc, axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", p2.astype(vv.dtype), vv)
            x = x + _apply(lp["projection"],
                           ctx.reshape(b, t, v.hidden_size))
            h_in = _ln(x, lp["layer_norm2"], eps)
            f = jax.nn.gelu(_apply(lp["fc1"], h_in).astype(jnp.float32),
                            approximate=False).astype(x.dtype)
            x = x + _apply(lp["fc2"], f)
        return _ln(x, tp["post_layernorm"], eps)

    def _qformer_attn(self, ap: Dict, hidden: jax.Array,
                      kv_src: jax.Array, eps: float) -> jax.Array:
        qf = self.qformer_cfg
        nh = qf.num_attention_heads
        d = qf.hidden_size // nh
        b, t, _ = hidden.shape
        l = kv_src.shape[1]
        q = _apply(ap["query"], hidden).reshape(b, t, nh, d)
        k = _apply(ap["key"], kv_src).reshape(b, l, nh, d)
        v = _apply(ap["value"], kv_src).reshape(b, l, nh, d)
        sc = jnp.einsum("bqhd,bkhd->bhqk",
                        q.astype(jnp.float32) * d ** -0.5,
                        k.astype(jnp.float32))
        p2 = jax.nn.softmax(sc, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", p2.astype(v.dtype), v)
        out = _apply(ap["out"], ctx.reshape(b, t, qf.hidden_size))
        return _ln(out + hidden, ap["out_ln"], eps)

    def encode_images(self, vision_params: Dict,
                      pixels: jax.Array) -> jax.Array:
        """pixels [B, 3, H, W] -> language-projected query embeddings
        [B, num_query_tokens, text_hidden] (HF get_image_features)."""
        qf = self.qformer_cfg
        eps = qf.layer_norm_eps
        img = self._vit(vision_params["tower"], pixels)
        qp = vision_params["qformer"]
        b = pixels.shape[0]
        x = jnp.broadcast_to(
            qp["query_tokens"]["weight"],
            (b,) + qp["query_tokens"]["weight"].shape)
        x = _ln(x, qp["layernorm"], eps)
        for lp in qp["layers"]:
            x = self._qformer_attn(lp["attention"], x, x, eps)
            if "crossattention" in lp:
                x = self._qformer_attn(lp["crossattention"], x,
                                       img.astype(x.dtype), eps)
            f = jax.nn.gelu(
                _apply(lp["intermediate_query"], x).astype(jnp.float32),
                approximate=False).astype(x.dtype)
            x = _ln(_apply(lp["output_query"], f) + x,
                    lp["output_query_ln"], eps)
        return _apply(vision_params["projector"]["linear"], x)
