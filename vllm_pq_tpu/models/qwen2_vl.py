"""Qwen2-VL: Qwen2 text decoder with MRoPE + the Qwen2-VL vision
transformer (role of reference ``models/qwen2_vl.py`` and the MRoPE
rotary variant, ``layers/rotary_embedding.py:849``).

MRoPE: every token carries a (temporal, height, width) position triple;
the rotary frequency channels are split into ``mrope_section`` chunks,
each rotated by its component's position. Text tokens use t == h == w,
so text-only batches reduce to 1D rope shifted by the request's
``mrope_position_delta`` (the host tracks one delta per request; image
prefill chunks ship an explicit [3, T] position plan).

Vision tower: patch embed (Conv3d with stride == kernel -> one matmul),
blocks of LN / biased-qkv full attention with 2D rotary / LN / MLP,
then PatchMerger (LN + 2-layer MLP over spatial_merge_size^2 patches).
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.norm import layer_norm
from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel


@dataclass
class Qwen2VLVisionCfg:
    depth: int = 32
    embed_dim: int = 1280
    num_heads: int = 16
    mlp_ratio: float = 4.0
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    hidden_act: str = "quick_gelu"

    @property
    def head_dim(self):
        return self.embed_dim // self.num_heads

    @property
    def mlp_hidden(self):
        return int(self.embed_dim * self.mlp_ratio)

    @property
    def patch_dim(self):
        return (self.in_channels * self.temporal_patch_size *
                self.patch_size ** 2)


@dataclass
class Qwen2VLConfig(LlamaConfig):
    mrope_section: Tuple[int, ...] = (16, 24, 24)
    image_token_id: int = 151655
    vision: Qwen2VLVisionCfg = field(default_factory=Qwen2VLVisionCfg)


def apply_mrope(q: jax.Array, k: jax.Array, pos3: jax.Array,
                rope_cache: jax.Array, sections) -> Tuple[jax.Array,
                                                          jax.Array]:
    """pos3 i32[3, T]; rope_cache [max_pos, D] (cos | sin halves).

    Channel chunk s of the D/2 frequencies rotates by pos3[s]."""
    d = q.shape[-1]
    d2 = d // 2
    comp = np.zeros(d2, np.int32)
    off = 0
    for s, n in enumerate(sections):
        comp[off:off + n] = s
        off += n
    comp_j = jnp.asarray(comp)
    pos_f = pos3[comp_j, :].T                      # [T, D/2]
    fidx = jnp.arange(d2)[None, :]
    cos = rope_cache[:, :d2][pos_f, fidx][:, None, :]   # [T, 1, D/2]
    sin = rope_cache[:, d2:][pos_f, fidx][:, None, :]

    def rot(x):
        x1 = x[..., :d2]
        x2 = x[..., d2:]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)

    return rot(q), rot(k)


def mrope_positions_for_prompt(token_ids, mm_inputs, image_token_id: int,
                               max_extra: int = 0) -> Tuple[np.ndarray,
                                                            int]:
    """Host-side get_rope_index (reference modeling get_rope_index):
    returns (pos3 [3, n_prompt], mrope_delta) where delta applies to all
    positions >= n_prompt (decode)."""
    n = len(token_ids)
    pos3 = np.zeros((3, n), np.int64)
    cur = 0      # next text position value
    i = 0
    spans = sorted(mm_inputs or [], key=lambda m: m.offset)
    si = 0
    while i < n:
        if si < len(spans) and i == spans[si].offset:
            mi = spans[si]
            t, h, w = mi.grid_thw
            ms = mi.merge_size
            hh, ww = h // ms, w // ms
            ln = t * hh * ww
            tt = np.repeat(np.arange(t), hh * ww)
            hp = np.tile(np.repeat(np.arange(hh), ww), t)
            wp = np.tile(np.tile(np.arange(ww), hh), t)
            pos3[0, i:i + ln] = cur + tt
            pos3[1, i:i + ln] = cur + hp
            pos3[2, i:i + ln] = cur + wp
            cur = cur + max(t, hh, ww)
            i += ln
            si += 1
        else:
            pos3[:, i] = cur
            cur += 1
            i += 1
    delta = cur - n
    return pos3.astype(np.int32), int(delta)


class Qwen2VLModel(LlamaModel):

    def __init__(self, cfg: Qwen2VLConfig, linear_method,
                 lm_head_method=None):
        super().__init__(cfg, linear_method, lm_head_method)
        self.image_token_index = cfg.image_token_id

    # -- vision templates ---------------------------------------------------

    def _vision_shapes(self):
        v = self.cfg.vision
        dt = self.cfg.dtype

        def lin(i, o):
            return {"weight": ((i, o), dt), "bias": ((o,), dt)}

        def ln(d):
            return {"weight": ((d,), dt), "bias": ((d,), dt)}

        blk = {
            "norm1": ln(v.embed_dim), "norm2": ln(v.embed_dim),
            "qkv": lin(v.embed_dim, 3 * v.embed_dim),
            "proj": lin(v.embed_dim, v.embed_dim),
            "fc1": lin(v.embed_dim, v.mlp_hidden),
            "fc2": lin(v.mlp_hidden, v.embed_dim),
        }
        hidden = v.embed_dim * v.spatial_merge_size ** 2
        return {
            "patch_embed": {"weight": ((v.patch_dim, v.embed_dim), dt)},
            "blocks": [dict(blk) for _ in range(v.depth)],
            "merger": {
                "ln_q": ln(v.embed_dim),
                "mlp0": lin(hidden, hidden),
                "mlp2": lin(hidden, self.cfg.hidden_size),
            },
        }

    def param_shapes(self) -> Dict:
        shapes = super().param_shapes()
        shapes["vision"] = self._vision_shapes()
        return shapes

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(lambda _: P(),
                                       self._vision_shapes(),
                                       is_leaf=lambda v: isinstance(
                                           v, tuple) and len(v) == 2
                                       and isinstance(v[0], tuple))
        return specs

    # -- vision forward -----------------------------------------------------

    def encode_images(self, vp: Dict, patches: jax.Array,
                      grid_thw: Tuple[int, int, int]) -> jax.Array:
        """patches [N, patch_dim] (HF pre-patched layout) -> merged
        embeddings [N / merge^2, text_hidden]."""
        from vllm_pq_tpu.layers.activation import ACT2FN
        v = self.cfg.vision
        t, h, w = grid_thw
        n = patches.shape[0]
        act = ACT2FN[v.hidden_act]

        def lin(p, x):
            return (jnp.dot(x, p["weight"],
                            preferred_element_type=jnp.float32)
                    + p["bias"].astype(jnp.float32)).astype(x.dtype)

        x = jnp.dot(patches.astype(vp["patch_embed"]["weight"].dtype),
                    vp["patch_embed"]["weight"],
                    preferred_element_type=jnp.float32).astype(
                        self.cfg.dtype)

        # 2D rotary ids in merge-block order (reference rot_pos_emb)
        ms = v.spatial_merge_size
        hp = np.arange(h)[:, None] * np.ones((1, w), np.int64)
        wp = np.ones((h, 1), np.int64) * np.arange(w)[None, :]

        def merge_order(a):
            a = a.reshape(h // ms, ms, w // ms, ms)
            return a.transpose(0, 2, 1, 3).reshape(-1)
        hp = np.tile(merge_order(hp), t)
        wp = np.tile(merge_order(wp), t)
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

        heads, d = v.num_heads, v.head_dim
        scale = 1.0 / np.sqrt(d)
        eps = 1e-6
        for bp in vp["blocks"]:
            hnorm = layer_norm(x, bp["norm1"]["weight"],
                               bp["norm1"]["bias"], eps)
            qkv = lin(bp["qkv"], hnorm).reshape(n, 3, heads, d)
            q, k, vv = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            q, k = rot(q.astype(jnp.float32)), rot(k.astype(jnp.float32))
            sc = jnp.einsum("qhd,khd->hqk", q * scale, k,
                            preferred_element_type=jnp.float32)
            p = jax.nn.softmax(sc, axis=-1)
            ctx = jnp.einsum("hqk,khd->qhd", p.astype(vv.dtype), vv)
            x = x + lin(bp["proj"], ctx.reshape(n, heads * d))
            hnorm = layer_norm(x, bp["norm2"]["weight"],
                               bp["norm2"]["bias"], eps)
            x = x + lin(bp["fc2"], act(lin(bp["fc1"], hnorm)
                                       .astype(jnp.float32)
                                       ).astype(x.dtype))

        mp = vp["merger"]
        xm = layer_norm(x, mp["ln_q"]["weight"], mp["ln_q"]["bias"], eps)
        xm = xm.reshape(n // ms ** 2, v.embed_dim * ms ** 2)
        xm = lin(mp["mlp0"], xm)
        xm = jax.nn.gelu(xm.astype(jnp.float32),
                         approximate=False).astype(xm.dtype)
        return lin(mp["mlp2"], xm)
