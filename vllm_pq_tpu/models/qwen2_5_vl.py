"""Qwen2.5-VL: Qwen2 text decoder with MRoPE + the windowed ViT
(role of reference ``models/qwen2_5_vl.py``).

Vision deltas vs Qwen2-VL (models/qwen2_vl.py): RMSNorm (weight-only)
replaces LayerNorm in the blocks and the merger's ln_q; the MLP is a
biased SwiGLU (gate/up/down, silu); and attention is WINDOWED — tokens
are reordered into ``window_size``-pixel tiles (HF ``get_window_index``)
and every block except ``fullatt_block_indexes`` attends only within its
tile. Full-attention blocks attend within each temporal frame. The
reorder, tile assignment, and masks are all static per image grid, so
each distinct grid jits once; the merger output is inverse-permuted back
to raster order before the splice.
"""

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_pq_tpu.models.qwen2_vl import (Qwen2VLConfig, Qwen2VLModel,
                                         Qwen2VLVisionCfg)


@dataclass
class Qwen25VLVisionCfg(Qwen2VLVisionCfg):
    intermediate_size: int = 3420
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    hidden_act: str = "silu"

    @property
    def mlp_hidden(self):
        return self.intermediate_size


def window_order(t: int, h: int, w: int, merge_size: int,
                 window_size: int, patch_size: int):
    """HF ``get_window_index``: (window_index [n_merged], window id per
    merged token [n_merged]) in window order. Pure host math — shapes
    are static per grid."""
    ms = merge_size
    lh, lw = h // ms, w // ms
    wsz = window_size // ms // patch_size
    # HF pads by a FULL window when already divisible; the empty
    # windows carry no tokens so the keep-mask drops them
    pad_h = wsz - lh % wsz
    pad_w = wsz - lw % wsz
    nwh, nww = (lh + pad_h) // wsz, (lw + pad_w) // wsz
    idx = np.arange(t * lh * lw).reshape(t, lh, lw)
    padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
    padded[:, :lh, :lw] = idx
    padded = padded.reshape(t, nwh, wsz, nww, wsz) \
        .transpose(0, 1, 3, 2, 4).reshape(t * nwh * nww, wsz * wsz)
    win_id = np.repeat(np.arange(padded.shape[0]), wsz * wsz) \
        .reshape(padded.shape)
    keep = padded != -100
    return padded[keep], win_id[keep]


class Qwen25VLModel(Qwen2VLModel):

    def _vision_shapes(self):
        v = self.cfg.vision
        dt = self.cfg.dtype

        def lin(i, o):
            return {"weight": ((i, o), dt), "bias": ((o,), dt)}

        def rms(d):
            return {"weight": ((d,), dt)}

        e, m = v.embed_dim, v.mlp_hidden
        blk = {
            "norm1": rms(e), "norm2": rms(e),
            "qkv": lin(e, 3 * e), "proj": lin(e, e),
            "gate_proj": lin(e, m), "up_proj": lin(e, m),
            "down_proj": lin(m, e),
        }
        hidden = e * v.spatial_merge_size ** 2
        return {
            "patch_embed": {"weight": ((v.patch_dim, e), dt)},
            "blocks": [dict(blk) for _ in range(v.depth)],
            "merger": {
                "ln_q": rms(e),
                "mlp0": lin(hidden, hidden),
                "mlp2": lin(hidden, self.cfg.hidden_size),
            },
        }

    def encode_images(self, vp: Dict, patches: jax.Array,
                      grid_thw: Tuple[int, int, int]) -> jax.Array:
        """patches [N, patch_dim] -> merged embeddings
        [N / merge^2, text_hidden] in raster order."""
        from vllm_pq_tpu.layers.activation import ACT2FN
        v = self.cfg.vision
        t, h, w = grid_thw
        n = patches.shape[0]
        act = ACT2FN[v.hidden_act]
        ms = v.spatial_merge_size
        mu = ms * ms

        def lin(p, x):
            return (jnp.dot(x, p["weight"],
                            preferred_element_type=jnp.float32)
                    + p["bias"].astype(jnp.float32)).astype(x.dtype)

        def rms(p, x, eps=1e-6):
            xf = x.astype(jnp.float32)
            nx = xf * jax.lax.rsqrt(
                jnp.mean(xf * xf, -1, keepdims=True) + eps)
            return (nx * p["weight"].astype(jnp.float32)).astype(x.dtype)

        x = jnp.dot(patches.astype(vp["patch_embed"]["weight"].dtype),
                    vp["patch_embed"]["weight"],
                    preferred_element_type=jnp.float32).astype(
                        self.cfg.dtype)

        # 2D rotary ids in merge-block raster order (as Qwen2-VL)...
        hp = np.arange(h)[:, None] * np.ones((1, w), np.int64)
        wp = np.ones((h, 1), np.int64) * np.arange(w)[None, :]

        def merge_order(a):
            a = a.reshape(h // ms, ms, w // ms, ms)
            return a.transpose(0, 2, 1, 3).reshape(-1)
        hp = np.tile(merge_order(hp), t)
        wp = np.tile(merge_order(wp), t)

        # ...then window-reordered (HF: hidden_states[window_index])
        widx, win_of_merged = window_order(t, h, w, ms, v.window_size,
                                           v.patch_size)
        patch_perm = (widx[:, None] * mu + np.arange(mu)).reshape(-1)
        x = x[jnp.asarray(patch_perm)]
        hp, wp = hp[patch_perm], wp[patch_perm]

        d_r = v.head_dim // 2
        inv = 1.0 / (10000.0 ** (np.arange(0, d_r, 2) / d_r))
        freqs = np.concatenate([hp[:, None] * inv[None, :],
                                wp[:, None] * inv[None, :]], axis=1)
        cos = jnp.asarray(np.cos(np.concatenate([freqs, freqs], 1)),
                          jnp.float32)[:, None, :]
        sin = jnp.asarray(np.sin(np.concatenate([freqs, freqs], 1)),
                          jnp.float32)[:, None, :]

        def rot(u):
            half = u.shape[-1] // 2
            u2 = jnp.concatenate([-u[..., half:], u[..., :half]], -1)
            return (u * cos + u2 * sin).astype(u.dtype)

        # masks: window-diagonal for windowed blocks, frame-diagonal for
        # fullatt blocks (HF cu_window_seqlens / cu_seqlens)
        win_patch = np.repeat(win_of_merged, mu)
        wmask = jnp.asarray(
            np.where(win_patch[:, None] == win_patch[None, :],
                     0.0, -np.inf), jnp.float32)[None]
        frame_raster = np.repeat(np.arange(t), h * w)
        frame_patch = frame_raster[patch_perm]
        fmask = jnp.asarray(
            np.where(frame_patch[:, None] == frame_patch[None, :],
                     0.0, -np.inf), jnp.float32)[None]

        heads, d = v.num_heads, v.head_dim
        scale = 1.0 / np.sqrt(d)
        for i, bp in enumerate(vp["blocks"]):
            hnorm = rms(bp["norm1"], x)
            qkv = lin(bp["qkv"], hnorm).reshape(n, 3, heads, d)
            q, k, vv = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            q, k = rot(q.astype(jnp.float32)), rot(k.astype(jnp.float32))
            sc = jnp.einsum("qhd,khd->hqk", q * scale, k,
                            preferred_element_type=jnp.float32)
            sc = sc + (fmask if i in v.fullatt_block_indexes else wmask)
            p = jax.nn.softmax(sc, axis=-1)
            ctx = jnp.einsum("hqk,khd->qhd", p.astype(vv.dtype), vv)
            x = x + lin(bp["proj"], ctx.reshape(n, heads * d))
            hnorm = rms(bp["norm2"], x)
            gate = act(lin(bp["gate_proj"], hnorm).astype(jnp.float32))
            x = x + lin(bp["down_proj"],
                        (gate * lin(bp["up_proj"], hnorm)
                         .astype(jnp.float32)).astype(x.dtype))

        mp = vp["merger"]
        xm = rms(mp["ln_q"], x)
        xm = xm.reshape(n // mu, v.embed_dim * mu)
        xm = lin(mp["mlp0"], xm)
        xm = jax.nn.gelu(xm.astype(jnp.float32),
                         approximate=False).astype(xm.dtype)
        out = lin(mp["mlp2"], xm)
        return out[jnp.asarray(np.argsort(widx))]
