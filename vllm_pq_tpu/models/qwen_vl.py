"""Qwen-VL (v1) — role of reference ``model_executor/models/qwen_vl.py``.

Composition: CLIP-style ViT (conv patch embed, 16x16 learned positions
bicubic-interpolated to the patch grid, pre-LN resblocks with fused
``in_proj``) → perceiver resampler ``attn_pool`` (256 learned queries +
2D sincos positions, reference ``layers/resampler.py::Resampler2``) →
``ln_post`` → ``proj`` — on the QWen v1 decoder (fused biased c_attn,
SwiGLU with halved intermediate). Span per image = n_queries pad tokens
between the <img>/</img> text tokens (reference qwen_vl.py:433
QwenVLProcessor inserts ``image_pad_id`` * 256).
"""

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
from vllm_pq_tpu.quantization.methods import LinearMethod


def _ln(x, p, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)
            * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


_BICUBIC = {}


def bicubic_1d(src: int, tgt: int) -> np.ndarray:
    """[tgt, src] interpolation matrix matching torch
    ``F.interpolate(mode="bicubic", align_corners=False)`` (cubic
    convolution kernel a=-0.75, border-replicate). Precomputed on host
    so the traced program is one constant einsum — and EXACT vs the
    reference ``resampler.py::get_abs_pos`` (jax.image.resize uses a
    different cubic kernel)."""
    key = (src, tgt)
    m = _BICUBIC.get(key)
    if m is not None:
        return m
    a = -0.75

    def kern(x):
        x = np.abs(x)
        return np.where(
            x <= 1, (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1,
            np.where(x < 2,
                     a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a,
                     0.0))

    m = np.zeros((tgt, src), np.float64)
    for t in range(tgt):
        y = (t + 0.5) * src / tgt - 0.5
        y0 = int(np.floor(y))
        for i in range(y0 - 1, y0 + 3):
            w = kern(y - i)
            m[t, min(max(i, 0), src - 1)] += w
    m = m.astype(np.float32)
    _BICUBIC[key] = m
    return m


def _interp_grid(pe: jax.Array, g0: int, side: int) -> jax.Array:
    """[g0*g0, C] -> [side*side, C] torch-exact bicubic."""
    c = pe.shape[-1]
    w1 = jnp.asarray(bicubic_1d(g0, side), jnp.float32)
    x = pe.reshape(g0, g0, c).astype(jnp.float32)
    x = jnp.einsum("ts,shc->thc", w1, x)   # rows
    x = jnp.einsum("ts,hsc->htc", w1, x)   # cols
    return x.reshape(side * side, c)


def sincos_2d(embed_dim: int, h: int, w: int) -> np.ndarray:
    """2D sincos position embedding, reference
    ``layers/resampler.py::get_2d_sincos_pos_embed`` version (2, 0):
    [h*w, embed_dim], half the channels encode the H coordinate and
    half the W coordinate, each as interleaved [sin || cos] of
    10000^(-2i/d) frequencies."""
    def one_d(dim, pos):                      # pos [n] -> [n, dim]
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("n,d->nd", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gw, gh = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    emb_h = one_d(embed_dim // 2, gh)         # meshgrid: w first
    emb_w = one_d(embed_dim // 2, gw)
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


class QwenVLModel(LlamaModel):

    def __init__(self, cfg: LlamaConfig, visual: Dict,
                 linear_method: LinearMethod):
        super().__init__(cfg, linear_method)
        self.visual = dict(visual)
        v = self.visual
        self.image_token_index = int(v.get("image_start_id",
                                           151857)) + 2  # pad id
        self.n_queries = int(v.get("n_queries", 256))

    @property
    def num_image_tokens(self) -> int:
        return self.n_queries

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        dt = self.cfg.dtype
        v = self.visual
        w = v["width"]
        od = v["output_dim"]
        mlp = int(w * v.get("mlp_ratio", 4.9231))
        # checkpoints store a 16x16 learned grid (interpolated to the
        # patch grid at encode time); tests may shrink it
        n_pos = int(v.get("pos_grid", 16)) ** 2

        def lin(i, o, bias=True):
            d = {"weight": ((i, o), dt)}
            if bias:
                d["bias"] = ((o,), dt)
            return d

        def ln(n):
            return {"weight": ((n,), dt), "bias": ((n,), dt)}
        layer = {
            "ln_1": ln(w), "ln_2": ln(w),
            "in_proj": lin(w, 3 * w),
            "out_proj": lin(w, w),
            "c_fc": lin(w, mlp), "c_proj": lin(mlp, w),
        }
        shapes["vision"] = {
            "tower": {
                "conv1": {"weight": ((v["patch_size"] ** 2 * 3, w),
                                     dt)},
                "positional_embedding": {"weight": ((n_pos, w), dt)},
                "ln_pre": ln(w),
                "layers": [dict(layer) for _ in range(v["layers"])],
            },
            "attn_pool": {
                "query": {"weight": ((self.n_queries, od), dt)},
                "pos_embed": {"weight": ((self.n_queries, od), dt)},
                "kv_proj": {"weight": ((w, od), dt)},
                "ln_q": ln(od), "ln_kv": ln(od),
                "in_proj": lin(od, 3 * od),
                "out_proj": lin(od, od),
            },
            "ln_post": ln(od),
            "proj": {"weight": ((od, od), dt)},
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
        """pixels [B, 3, S, S] -> [B, n_queries, output_dim]."""
        v = self.visual
        tw = vision_params["tower"]
        b = pixels.shape[0]
        ps = v["patch_size"]
        side = v["image_size"] // ps
        w = v["width"]
        od = v["output_dim"]

        def lin(p, u):
            y = jnp.dot(u, p["weight"],
                        preferred_element_type=jnp.float32)
            if "bias" in p:
                y = y + p["bias"].astype(jnp.float32)
            return y.astype(u.dtype)

        x = pixels.reshape(b, 3, side, ps, side, ps)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, side * side,
                                                  3 * ps * ps)
        x = jnp.dot(x, tw["conv1"]["weight"],
                    preferred_element_type=jnp.float32).astype(
            pixels.dtype)

        # learned 16x16 grid bicubic-interpolated to the patch grid
        # (reference resampler.py::get_abs_pos; torch-exact kernel)
        pe = tw["positional_embedding"]["weight"]
        g0 = int(math.isqrt(pe.shape[0]))
        if g0 != side:
            pe = _interp_grid(pe, g0, side)
        x = x + pe.reshape(1, side * side, w).astype(x.dtype)
        x = _ln(x, tw["ln_pre"])

        heads = v.get("heads", 16)
        hd = w // heads
        t = x.shape[1]
        for lp in tw["layers"]:
            h_in = _ln(x, lp["ln_1"])
            # fused in_proj is INTERLEAVED per head: [.., np, 3*hn]
            # split on the last dim (reference VisualAttention.forward)
            qkv = lin(lp["in_proj"], h_in).reshape(b, t, heads, 3, hd)
            q, k, vv = (qkv[:, :, :, 0], qkv[:, :, :, 1],
                        qkv[:, :, :, 2])
            sc = jnp.einsum("bqhd,bkhd->bhqk",
                            q.astype(jnp.float32) * (hd ** -0.5),
                            k.astype(jnp.float32))
            probs = jax.nn.softmax(sc, axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vv.dtype),
                             vv)
            x = x + lin(lp["out_proj"], ctx.reshape(b, t, w))
            h_in = _ln(x, lp["ln_2"])
            x = x + lin(lp["c_proj"],
                        jax.nn.gelu(lin(lp["c_fc"], h_in)
                                    .astype(jnp.float32),
                                    approximate=False).astype(x.dtype))

        # perceiver resampler (Resampler2, no post projection)
        rp = vision_params["attn_pool"]
        nq = self.n_queries
        rheads = max(od // 128, 1)
        rhd = od // rheads
        kv = lin(rp["kv_proj"], x)
        kv = _ln(kv, rp["ln_kv"])
        # key positions: the 16x16 sincos grid interpolated to the
        # patch grid; query positions: the grid itself
        qg = int(math.isqrt(nq))
        pos_q = rp["pos_embed"]["weight"].astype(jnp.float32)
        pos_k = pos_q
        if side != qg:
            pos_k = _interp_grid(rp["pos_embed"]["weight"], qg, side)
        q = _ln(rp["query"]["weight"].astype(kv.dtype)[None],
                rp["ln_q"])
        q = jnp.broadcast_to(q, (b, nq, od)) + pos_q[None].astype(
            kv.dtype)
        kq = kv + pos_k[None].astype(kv.dtype)

        wq, wk, wv = jnp.split(rp["in_proj"]["weight"], 3, axis=1)
        bq, bk, bv = jnp.split(rp["in_proj"]["bias"], 3, axis=0)

        def proj(u, wmat, bias):
            return (jnp.dot(u, wmat, preferred_element_type=jnp.float32)
                    + bias.astype(jnp.float32)).astype(u.dtype)
        q2 = proj(q, wq, bq).reshape(b, nq, rheads, rhd)
        k2 = proj(kq, wk, bk).reshape(b, t, rheads, rhd)
        v2 = proj(kv, wv, bv).reshape(b, t, rheads, rhd)
        sc = jnp.einsum("bqhd,bkhd->bhqk",
                        q2.astype(jnp.float32) * (rhd ** -0.5),
                        k2.astype(jnp.float32))
        probs = jax.nn.softmax(sc, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v2.dtype), v2)
        out = lin(rp["out_proj"], ctx.reshape(b, nq, od))

        out = _ln(out, vision_params["ln_post"])
        return jnp.dot(out, vision_params["proj"]["weight"],
                       preferred_element_type=jnp.float32).astype(
            out.dtype)
