"""Florence-2 — role of reference ``model_executor/models/florence2.py``.

Composition: DaViT hierarchical vision tower (4 stages of ConvEmbed +
[SpatialBlock (7x7 window attention) + ChannelBlock (grouped channel
attention)], each block with depthwise-conv residuals before attention
and FFN) → learned 2D absolute positions + cosine temporal embedding →
``image_feature_source`` concat (spatial_avg_pool / temporal_avg_pool
/ last_frame) → ``image_projection`` + LayerNorm — prepended to the
text embeddings of the BART ENCODER; generation runs on the BART
decoder with cross-attention (models/bart.py serving design: encoder
runs once per request, states cached per row).
"""

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.bart import BartConfig, BartModel


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)
            * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _linp(p, u):
    y = jnp.dot(u, p["weight"], preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(u.dtype)


def _cosine_1d(embed_dim: int, max_len: int) -> np.ndarray:
    """reference PositionalEmbeddingCosine1D table [L, D]."""
    den = np.exp(-math.log(10000)
                 * np.arange(0, embed_dim, 2) / embed_dim)
    freqs = np.arange(max_len).reshape(-1, 1) * den
    out = np.zeros((max_len, embed_dim), np.float32)
    out[:, 0::2] = np.sin(freqs)
    out[:, 1::2] = np.cos(freqs)
    return out


class Florence2Model(BartModel):
    """BART + DaViT. ``vision_cfg`` is the HF ``vision_config`` dict
    (model_type davit)."""

    def __init__(self, cfg: BartConfig, vision_cfg: Dict,
                 linear_method=None, pad_token_id: int = 1):
        super().__init__(cfg, linear_method)
        v = dict(vision_cfg)
        self.vision_cfg = v
        self.depths = tuple(v.get("depths", (1, 1, 9, 1)))
        self.dims = tuple(v.get("dim_embed", (128, 256, 512, 1024)))
        self.heads = tuple(v.get("num_heads", (4, 8, 16, 32)))
        self.groups = tuple(v.get("num_groups", (4, 8, 16, 32)))
        self.patch_size = tuple(v.get("patch_size", (7, 3, 3, 3)))
        self.patch_stride = tuple(v.get("patch_stride", (4, 2, 2, 2)))
        self.patch_padding = tuple(v.get("patch_padding", (3, 1, 1, 1)))
        self.patch_prenorm = tuple(v.get("patch_prenorm",
                                         (False, True, True, True)))
        self.window = int(v.get("window_size", 12))
        self.proj_dim = int(v.get("projection_dim", cfg.d_model))
        pe = v.get("image_pos_embed", {}) or {}
        self.num_pos = int(pe.get("max_pos_embeddings", 50))
        te = v.get("visual_temporal_embedding", {}) or {}
        self.max_temporal = int(te.get("max_temporal_embeddings", 100))
        self.feature_source = tuple(v.get(
            "image_feature_source", ("spatial_avg_pool",
                                     "temporal_avg_pool")))
        self.pad_token_id = pad_token_id

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        dt = self.cfg.dtype

        def lin(i, o, bias=True):
            d = {"weight": ((i, o), dt)}
            if bias:
                d["bias"] = ((o,), dt)
            return d

        def ln(n):
            return {"weight": ((n,), dt), "bias": ((n,), dt)}
        stages = []
        for i, dim in enumerate(self.dims):
            in_ch = 3 if i == 0 else self.dims[i - 1]
            blocks = []
            for _ in range(self.depths[i]):
                blocks.append({
                    "spatial": {
                        "conv1": {"weight": ((3, 3, 1, dim), dt),
                                  "bias": ((dim,), dt)},
                        "norm": ln(dim),
                        "qkv": lin(dim, 3 * dim),
                        "proj": lin(dim, dim),
                        "conv2": {"weight": ((3, 3, 1, dim), dt),
                                  "bias": ((dim,), dt)},
                        "ffn_norm": ln(dim),
                        "fc1": lin(dim, 4 * dim),
                        "fc2": lin(4 * dim, dim),
                    },
                    "channel": {
                        "conv1": {"weight": ((3, 3, 1, dim), dt),
                                  "bias": ((dim,), dt)},
                        "norm": ln(dim),
                        "qkv": lin(dim, 3 * dim),
                        "proj": lin(dim, dim),
                        "conv2": {"weight": ((3, 3, 1, dim), dt),
                                  "bias": ((dim,), dt)},
                        "ffn_norm": ln(dim),
                        "fc1": lin(dim, 4 * dim),
                        "fc2": lin(4 * dim, dim),
                    },
                })
            ps = self.patch_size[i]
            stages.append({
                "conv": {"weight": ((ps, ps, in_ch, dim), dt),
                         "bias": ((dim,), dt)},
                "conv_norm": ln(3 if (i == 0 and self.patch_prenorm[i])
                                else (in_ch if self.patch_prenorm[i]
                                      else dim)),
                "blocks": blocks,
            })
        c_last = self.dims[-1]
        shapes["vision"] = {
            "stages": stages,
            "image_projection": {"weight": ((c_last, self.proj_dim),
                                            dt)},
            "image_proj_norm": ln(self.proj_dim),
            "pos_row": {"weight": ((self.num_pos, c_last // 2), dt)},
            "pos_col": {"weight": ((self.num_pos,
                                    c_last - c_last // 2), dt)},
        }
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.param_shapes()["vision"],
            is_leaf=lambda v: isinstance(v, tuple) and len(v) == 2
            and isinstance(v[0], tuple))
        return specs

    # -- DaViT ---------------------------------------------------------------

    def _dwconv(self, p, x, h, w):
        """3x3 depthwise conv on [N, C] tokens of an h x w map."""
        n, c = x.shape
        img = x.reshape(1, h, w, c)
        out = jax.lax.conv_general_dilated(
            img.astype(jnp.float32),
            p["weight"].astype(jnp.float32),          # [3, 3, 1, C]
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
        out = out + p["bias"].astype(jnp.float32)
        return out.reshape(h * w, c).astype(x.dtype)

    def _window_attn(self, p, x, h, w, heads):
        """7x7 (config window) attention with edge padding."""
        ws = self.window
        n, c = x.shape
        hd = c // heads
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        img = x.reshape(h, w, c)
        img = jnp.pad(img, ((0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        win = img.reshape(hp // ws, ws, wp // ws, ws, c) \
            .transpose(0, 2, 1, 3, 4).reshape(-1, ws * ws, c)
        qkv = _linp(p["qkv"], win).reshape(-1, ws * ws, 3, heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        sc = jnp.einsum("bqhd,bkhd->bhqk",
                        q.astype(jnp.float32) * (hd ** -0.5),
                        k.astype(jnp.float32))
        pr = jax.nn.softmax(sc, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", pr.astype(v.dtype), v)
        out = _linp(p["proj"], ctx.reshape(-1, ws * ws, c))
        out = out.reshape(hp // ws, wp // ws, ws, ws, c) \
            .transpose(0, 2, 1, 3, 4).reshape(hp, wp, c)
        return out[:h, :w].reshape(h * w, c)

    def _channel_attn(self, p, x, groups):
        """grouped channel attention (reference ChannelAttention: the
        softmax runs over the Cg x Cg channel-channel matrix)."""
        n, c = x.shape
        cg = c // groups
        qkv = _linp(p["qkv"], x).reshape(n, 3, groups, cg) \
            .transpose(1, 2, 0, 3)                   # [3, g, N, cg]
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (float(n) ** -0.5)
        att = jnp.einsum("gnc,gnd->gcd", q.astype(jnp.float32),
                         k.astype(jnp.float32))
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("gcd,gnd->gnc", att.astype(v.dtype), v)
        out = out.transpose(1, 0, 2).reshape(n, c)
        return _linp(p["proj"], out)

    def _block(self, p, x, h, w, *, spatial, heads_or_groups):
        x = x + self._dwconv(p["conv1"], x, h, w)
        xn = _ln(x, p["norm"])
        if spatial:
            x = x + self._window_attn(p, xn, h, w, heads_or_groups)
        else:
            x = x + self._channel_attn(p, xn, heads_or_groups)
        x = x + self._dwconv(p["conv2"], x, h, w)
        xn = _ln(x, p["ffn_norm"])
        y = jax.nn.gelu(_linp(p["fc1"], xn).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        return x + _linp(p["fc2"], y)

    def _conv_embed(self, p, x, h, w, i):
        """stage-entry conv (reference ConvEmbed)."""
        in_ch = x.shape[-1]
        if self.patch_prenorm[i]:
            x = _ln(x, p["conv_norm"])
        img = x.reshape(1, h, w, in_ch)
        ps = self.patch_size[i]
        st = self.patch_stride[i]
        pd = self.patch_padding[i]
        out = jax.lax.conv_general_dilated(
            img.astype(jnp.float32), p["conv"]["weight"].astype(
                jnp.float32),
            window_strides=(st, st), padding=((pd, pd), (pd, pd)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out + p["conv"]["bias"].astype(jnp.float32)
        _, h2, w2, c2 = out.shape
        out = out.reshape(h2 * w2, c2).astype(x.dtype)
        if not self.patch_prenorm[i]:
            out = _ln(out, p["conv_norm"])
        return out, h2, w2

    def encode_image(self, vp: Dict, pixels: jax.Array) -> jax.Array:
        """pixels [3, H, W] -> image tokens [T_img, d_model]."""
        x = pixels.transpose(1, 2, 0)                 # [H, W, 3]
        h, w = x.shape[:2]
        x = x.reshape(h * w, 3)
        for i, st in enumerate(vp["stages"]):
            x, h, w = self._conv_embed(st, x, h, w, i)
            for bp in st["blocks"]:
                x = self._block(bp["spatial"], x, h, w, spatial=True,
                                heads_or_groups=self.heads[i])
                x = self._block(bp["channel"], x, h, w, spatial=False,
                                heads_or_groups=self.groups[i])
        c = x.shape[-1]
        # learned 2D positions: [x_col || y_row] halves
        col = vp["pos_col"]["weight"][:w]             # [w, c - c//2]
        row = vp["pos_row"]["weight"][:h]             # [h, c//2]
        pos = jnp.concatenate(
            [jnp.broadcast_to(col[None], (h, w, col.shape[-1])),
             jnp.broadcast_to(row[:, None], (h, w, row.shape[-1]))],
            axis=-1).reshape(h * w, c)
        x = x + pos.astype(x.dtype)
        # cosine temporal embedding, T = 1: row 0 added everywhere
        temporal = jnp.asarray(
            _cosine_1d(c, 1)[0], x.dtype)
        x = x + temporal[None]
        feats = []
        for src in self.feature_source:
            if src == "spatial_avg_pool":
                feats.append(x.mean(axis=0, keepdims=True))
            elif src == "temporal_avg_pool":
                feats.append(x)                       # T=1: identity
            elif src == "last_frame":
                feats.append(x)
            else:
                raise ValueError(f"unknown feature source {src}")
        x = jnp.concatenate(feats, axis=0)
        x = jnp.dot(x, vp["image_projection"]["weight"],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        return _ln(x, vp["image_proj_norm"])

    # -- encoder entry -------------------------------------------------------

    def encode_encoder_input(self, params: Dict, ids: jax.Array,
                             pixels: Optional[jax.Array] = None
                             ) -> jax.Array:
        cfg = self.cfg
        ids = ids.astype(jnp.int32)
        x = params["embed_tokens"]["weight"][ids] * jnp.asarray(
            self._scale(), cfg.dtype)
        if pixels is not None:
            img = self.encode_image(params["vision"], pixels)
            x = jnp.concatenate([img.astype(x.dtype), x], axis=0)
        return self.encode_from_embeds(params, x)
