"""Prithvi geospatial MAE — role of reference
``model_executor/models/prithvi_geospatial_mae.py``.

The reference defers ALL math to the external ``terratorch`` package
(its wrapper only instantiates a SemanticSegmentationTask and forwards
pixels, V0-only). The TPU-native equivalent implements the Prithvi
ViT-MAE ENCODER in-tree — 3D (time, h, w) patch embedding over the
6-band HLS input, CLS token, 3D sincos positions, pre-LN ViT blocks —
and serves pooled patch features; task decoders (segmentation necks)
remain external exactly as terratorch is external to the reference.
"""

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def _ln(x, p, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)
            * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _sincos_1d(dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("n,d->nd", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_3d(embed_dim: int, t: int, h: int, w: int) -> np.ndarray:
    """Prithvi 3D sincos positions: [t*h*w, D] with D split 1/4
    temporal and 3/8 + 3/8 spatial (terratorch
    get_3d_sincos_pos_embed convention: t_dim = D // 4 rounded to a
    multiple of 4... simplified to the even split used by Prithvi:
    spatial uses 3/4 of D (half each axis), temporal 1/4)."""
    sp = embed_dim * 3 // 4
    tp = embed_dim - sp
    gw, gh = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    emb_h = _sincos_1d(sp // 2, gh)
    emb_w = _sincos_1d(sp // 2, gw)
    spat = np.concatenate([emb_h, emb_w], axis=1)       # [h*w, sp]
    temp = _sincos_1d(tp, np.arange(t, dtype=np.float32))  # [t, tp]
    out = np.concatenate(
        [np.repeat(temp, h * w, axis=0),
         np.tile(spat, (t, 1))], axis=1)
    return out.astype(np.float32)


class PrithviModel:
    """Attention-free from the serving engine's view (no KV cache):
    one forward per request, pooled features out."""

    is_pooling_only = True

    def __init__(self, cfg, linear_method=None):
        self.cfg = cfg
        g = cfg
        self.img_size = int(getattr(g, "img_size", 224))
        self.patch = int(getattr(g, "patch_size", 16))
        self.bands = int(getattr(g, "num_channels",
                                 getattr(g, "in_chans", 6)))
        self.frames = int(getattr(g, "num_frames", 1))
        self.t_patch = int(getattr(g, "t_patch_size",
                                   getattr(g, "tubelet_size", 1)))
        self.emb = int(getattr(g, "embed_dim", 768))
        self.depth = int(getattr(g, "num_hidden_layers",
                                 getattr(g, "depth", 12)))
        self.heads = int(getattr(g, "num_attention_heads",
                                 getattr(g, "num_heads", 12)))
        self.mlp_ratio = float(getattr(g, "mlp_ratio", 4.0))

    def param_shapes(self) -> Dict:
        dt = getattr(self.cfg, "dtype", "float32")
        e = self.emb
        mlp = int(e * self.mlp_ratio)

        def lin(i, o):
            return {"weight": ((i, o), dt), "bias": ((o,), dt)}

        def ln(n):
            return {"weight": ((n,), dt), "bias": ((n,), dt)}
        layer = {
            "norm1": ln(e), "norm2": ln(e),
            "qkv": lin(e, 3 * e), "proj": lin(e, e),
            "fc1": lin(e, mlp), "fc2": lin(mlp, e),
        }
        return {
            "patch_embed": {
                "weight": ((self.t_patch * self.patch * self.patch
                            * self.bands, e), dt),
                "bias": ((e,), dt)},
            "cls_token": {"weight": ((e,), dt)},
            "blocks": [dict(layer) for _ in range(self.depth)],
            "norm": ln(e),
        }

    def param_specs(self) -> Dict:
        return jax.tree.map(lambda _: P(), self.param_shapes(),
                            is_leaf=lambda v: isinstance(v, tuple)
                            and len(v) == 2 and isinstance(v[0], tuple))

    def encode_pixels(self, params: Dict, pixels: jax.Array,
                      location_coords: Optional[jax.Array] = None
                      ) -> jax.Array:
        """pixels [C, T, H, W] (or [C, H, W], T=1) -> features
        [1 + t*h*w, embed_dim] (CLS first)."""
        if pixels.ndim == 3:
            pixels = pixels[:, None]
        c, t, hh, ww = pixels.shape
        ps, tp = self.patch, self.t_patch
        gt, gh, gw = t // tp, hh // ps, ww // ps
        x = pixels.reshape(c, gt, tp, gh, ps, gw, ps)
        # tube order matches Conv3d flattening: (C, tp, ph, pw)
        x = x.transpose(1, 3, 5, 0, 2, 4, 6).reshape(
            gt * gh * gw, c * tp * ps * ps)
        x = (jnp.dot(x, params["patch_embed"]["weight"],
                     preferred_element_type=jnp.float32)
             + params["patch_embed"]["bias"].astype(jnp.float32)) \
            .astype(pixels.dtype)
        pos = jnp.asarray(sincos_3d(self.emb, gt, gh, gw), x.dtype)
        x = x + pos
        cls = params["cls_token"]["weight"][None].astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=0)

        heads = self.heads
        hd = self.emb // heads
        n = x.shape[0]

        def lin(p, u):
            return (jnp.dot(u, p["weight"],
                            preferred_element_type=jnp.float32)
                    + p["bias"].astype(jnp.float32)).astype(u.dtype)

        for lp in params["blocks"]:
            xn = _ln(x, lp["norm1"])
            qkv = lin(lp["qkv"], xn).reshape(n, 3, heads, hd)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            sc = jnp.einsum("qhd,khd->hqk",
                            q.astype(jnp.float32) * (hd ** -0.5),
                            k.astype(jnp.float32))
            pr = jax.nn.softmax(sc, axis=-1)
            ctx = jnp.einsum("hqk,khd->qhd", pr.astype(v.dtype), v)
            x = x + lin(lp["proj"], ctx.reshape(n, self.emb))
            xn = _ln(x, lp["norm2"])
            y = jax.nn.gelu(lin(lp["fc1"], xn).astype(jnp.float32),
                            approximate=False).astype(x.dtype)
            x = x + lin(lp["fc2"], y)
        return _ln(x, params["norm"])
