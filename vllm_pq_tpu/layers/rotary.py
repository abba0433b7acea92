"""Rotary position embeddings.

Covers the reference's RotaryEmbedding + Linear / DynamicNTK / YaRN /
Phi3-LongRoPE / Llama3 scaling variants
(``layers/rotary_embedding.py:79,190,232,383,739,821``), in a functional
TPU style: cos/sin tables are precomputed host-side once and indexed by
position inside the jitted step (no data-dependent shapes). Variants
that scale attention magnitude (YaRN mscale, LongRoPE attn factor) fold
the scale into the table so the apply path stays a single gather.

Uses the *non-interleaved* (half-rotation) layout matching HF llama.
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _yarn_correction_range(low_rot: float, high_rot: float, dim: int,
                           base: float, orig_len: int):
    """Dim range over which YaRN ramps from extrapolation to
    interpolation (reference rotary_embedding.py:332-350)."""
    def corr_dim(num_rot):
        return (dim * math.log(orig_len / (num_rot * 2 * math.pi))
                ) / (2 * math.log(base))
    low = math.floor(corr_dim(low_rot))
    high = math.ceil(corr_dim(high_rot))
    return max(low, 0), min(high, dim - 1)


def _linear_ramp(low: float, high: float, n: int) -> np.ndarray:
    if low == high:
        high += 0.001  # avoid /0
    ramp = (np.arange(n, dtype=np.float64) - low) / (high - low)
    return np.clip(ramp, 0.0, 1.0)


def _yarn_mscale(scale: float, mscale: float = 1.0) -> float:
    if scale <= 1:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def compute_inv_freq(head_dim: int, base: float,
                     scaling: Optional[dict] = None) -> np.ndarray:
    inv_freq = 1.0 / (base**(np.arange(0, head_dim, 2, dtype=np.float64) /
                             head_dim))
    if scaling:
        rope_type = scaling.get("rope_type", scaling.get("type", ""))
        if rope_type == "linear":
            inv_freq = inv_freq / scaling["factor"]
        elif rope_type == "dynamic":
            # Dynamic NTK evaluated statically at full extension
            # (reference DynamicNTKScalingRotaryEmbedding,
            # rotary_embedding.py:232: the table is built once for
            # L = orig*factor, so the base multiplier is
            # factor*L/orig - (factor-1) = factor^2 - factor + 1).
            factor = scaling["factor"]
            mult = factor * factor - factor + 1.0
            nbase = base * mult**(head_dim / (head_dim - 2))
            inv_freq = 1.0 / (nbase**(
                np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
        elif rope_type == "yarn":
            factor = scaling["factor"]
            orig_len = scaling.get("original_max_position_embeddings",
                                   2048)
            beta_fast = scaling.get("beta_fast", 32)
            beta_slow = scaling.get("beta_slow", 1)
            extra = inv_freq                     # extrapolation (no scale)
            inter = inv_freq / factor            # interpolation
            low, high = _yarn_correction_range(beta_fast, beta_slow,
                                               head_dim, base, orig_len)
            extrap_w = 1.0 - _linear_ramp(low, high, head_dim // 2)
            inv_freq = inter * (1.0 - extrap_w) + extra * extrap_w
        elif rope_type == "llama3":
            # reference Llama3RotaryEmbedding (rotary_embedding.py)
            factor = scaling["factor"]
            low_freq_factor = scaling["low_freq_factor"]
            high_freq_factor = scaling["high_freq_factor"]
            old_len = scaling["original_max_position_embeddings"]
            wavelen = 2 * np.pi / inv_freq
            low_freq_wavelen = old_len / low_freq_factor
            high_freq_wavelen = old_len / high_freq_factor
            smooth = (old_len / wavelen - low_freq_factor) / (
                high_freq_factor - low_freq_factor)
            new_freq = np.where(
                wavelen < high_freq_wavelen, inv_freq,
                np.where(wavelen > low_freq_wavelen, inv_freq / factor,
                         (1 - smooth) * inv_freq / factor +
                         smooth * inv_freq))
            inv_freq = new_freq
    return inv_freq.astype(np.float64)


def build_rope_cache(max_len: int, head_dim: int, base: float = 10000.0,
                     scaling: Optional[dict] = None,
                     dtype=jnp.float32) -> jax.Array:
    """Returns [max_len, head_dim] table: first half cos, second half sin
    duplicated over both halves of the head dim (half-rotation layout).

    For linear/dynamic scaling the table is extended to orig*factor
    positions; YaRN folds its mscale and LongRoPE its attention factor
    into the table values."""
    rope_type = (scaling or {}).get("rope_type",
                                    (scaling or {}).get("type", ""))
    attn_scale = 1.0
    if rope_type in ("linear", "dynamic"):
        # HF stores the ORIGINAL length for these; usable = orig*factor
        max_len = max(max_len, int(max_len * scaling["factor"]))
    if rope_type == "yarn":
        # HF stores the EXTENDED length; cover at least orig*factor
        orig = scaling.get("original_max_position_embeddings", max_len)
        max_len = max(max_len, int(orig * scaling["factor"]))
        attn_scale = scaling.get("attention_factor")
        if attn_scale is None:
            mscale = scaling.get("mscale")
            mscale_all = scaling.get("mscale_all_dim")
            if mscale and mscale_all:
                # DeepSeek-style: ratio of the two mscales (reference
                # DeepseekScalingRotaryEmbedding, rotary_embedding.py)
                attn_scale = (_yarn_mscale(scaling["factor"], mscale)
                              / _yarn_mscale(scaling["factor"],
                                             mscale_all))
            else:
                attn_scale = _yarn_mscale(scaling["factor"],
                                          mscale or 1.0)

    if rope_type == "longrope":
        # Phi-3 LongRoPE (reference Phi3LongRoPEScaledRotaryEmbedding,
        # rotary_embedding.py:739): per-dim rescale factors. The factor
        # set switches for the WHOLE sequence when the served context
        # exceeds the pretrained length; with a static table we pick
        # once at build time from max_len (the engine's serving limit).
        # Attention factor sqrt(1 + ln(s)/ln(orig_len)) folds into the
        # table.
        orig_len = scaling["original_max_position_embeddings"]
        s = max_len / orig_len
        ext = np.asarray(scaling["long_factor" if s > 1.0
                                 else "short_factor"], dtype=np.float64)
        attn_scale = scaling.get("attention_factor")
        if attn_scale is None:
            attn_scale = (math.sqrt(1 + math.log(s) / math.log(orig_len))
                          if s > 1.0 else 1.0)
        base_freq = 1.0 / (base**(
            np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
        t = np.arange(max_len, dtype=np.float64)
        freqs = np.outer(t, base_freq / ext)
        cache = np.concatenate([np.cos(freqs), np.sin(freqs)], axis=-1)
        return jnp.asarray(cache * attn_scale, dtype=dtype)

    inv_freq = compute_inv_freq(head_dim, base, scaling)
    t = np.arange(max_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # [L, D/2]
    cos = np.cos(freqs)
    sin = np.sin(freqs)
    cache = np.concatenate([cos, sin], axis=-1) * attn_scale  # [L, D]
    return jnp.asarray(cache, dtype=dtype)


_ROT_P = {}


def _rot_perm(d: int, style: str, dtype) -> jax.Array:
    """Constant [d, d] signed-permutation matrix computing rotate_half
    as ONE dot: out = x @ P.

    Why a matmul and not slice+concat: XLA avoids minor-dim concats by
    laying the whole rope fusion out batch-minor, then pays [T, H*D]
    transposed copies into AND out of it every layer — the dominant
    term of the 6.8k-copy / 5.8 GiB-per-window layout tax
    (BENCHMARKS.md round-5 tstep A/B: concat-free body 3.62 vs 3.93
    ms/iter). The permutation dot is exact (products are ±x or ±0.0,
    f32 accumulate) and rides the MXU, which sits idle during
    bandwidth-bound decode."""
    key = (d, style)
    m = _ROT_P.get(key)
    if m is None:
        rd, full = d if isinstance(d, tuple) else (d, d)
        m = np.zeros((full, full), np.float32)
        h = rd // 2
        if style == "gptj":
            # rotate_every_two: out[2i] = -x[2i+1]; out[2i+1] = x[2i]
            ev = np.arange(0, rd, 2)
            m[ev + 1, ev] = -1.0
            m[ev, ev + 1] = 1.0
        else:
            # neox halves: out[:h] = -x[h:]; out[h:] = x[:h]
            r = np.arange(h)
            m[h + r, r] = -1.0
            m[r, h + r] = 1.0
        _ROT_P[key] = m  # cache NUMPY: a jnp constant created inside a
        # trace would leak that trace's tracer into later programs
    return jnp.asarray(m, dtype)


def apply_rope(q: jax.Array, k: jax.Array, positions: jax.Array,
               rope_cache: jax.Array, style: str = "neox"):
    """q [T, Hq, D], k [T, Hk, D], positions [T] -> rotated (q, k).

    ``style``: "neox" rotates [first half | second half] (HF llama);
    "gptj" rotates interleaved even/odd lane pairs (GPT-J
    rotate_every_two; reference rotary_embedding.py ``is_neox_style``
    False). rotate_half is a signed-permutation DOT (see _rot_perm),
    so the full rotation is x*cos_full + (x@P)*sin_full with no
    concatenate in the per-layer graph. Partial rotary (rope_cache
    narrower than head_dim) folds in for free: pass-through dims get
    cos=1 / sin=0 and zero P columns."""
    d = q.shape[-1]
    rd = rope_cache.shape[-1]             # rotary dims (<= d)
    cs = rope_cache[positions]            # [T, rd]
    c2, s2 = cs[:, :rd // 2], cs[:, rd // 2:]
    if style == "gptj":
        # interleave: lane 2i and 2i+1 share frequency i
        cos = jnp.stack([c2, c2], -1).reshape(cs.shape[0], rd)
        sin = jnp.stack([s2, s2], -1).reshape(cs.shape[0], rd)
    else:
        cos = jnp.concatenate([c2, c2], -1)
        sin = jnp.concatenate([s2, s2], -1)
    if rd < d:
        cos = jnp.pad(cos, ((0, 0), (0, d - rd)), constant_values=1.0)
        sin = jnp.pad(sin, ((0, 0), (0, d - rd)), constant_values=0.0)
    cos = cos[:, None, :]
    sin = sin[:, None, :]
    P = _rot_perm((rd, d) if rd < d else d, style, q.dtype)

    def rot(x):
        xr = jnp.einsum("thd,de->the", x, P.astype(x.dtype),
                        preferred_element_type=jnp.float32)
        return (x * cos + xr * sin).astype(x.dtype)

    def rot_cc(x):
        # classic slice+concat rotate_half — used for K ONLY: the K
        # rope feeds the decode ring's dynamic_update_slice, and the
        # P-dot's t-minor output layout made XLA relayout the WHOLE
        # ring every iteration (704 x 4 MiB/window measured). K is
        # [T, KVH, D] (tiny), so its concat copies are noise.
        if rd < d:
            xr_, xp = x[..., :rd], x[..., rd:]
        else:
            xr_, xp = x, None
        x1 = xr_[..., :rd // 2]
        x2 = xr_[..., rd // 2:]
        cs_ = cos[..., :rd]
        sn_ = sin[..., :rd]
        if style == "gptj":
            x1 = xr_[..., 0::2]
            x2 = xr_[..., 1::2]
            c2_ = cs_[..., 0::2]
            s2_ = sn_[..., 0::2]
            o1 = x1 * c2_ - x2 * s2_
            o2 = x2 * c2_ + x1 * s2_
            out = jnp.stack([o1, o2], axis=-1).reshape(xr_.shape)
        else:
            o1 = x1 * cs_[..., :rd // 2] - x2 * sn_[..., :rd // 2]
            o2 = x2 * cs_[..., rd // 2:] + x1 * sn_[..., rd // 2:]
            out = jnp.concatenate([o1, o2], axis=-1)
        out = out.astype(x.dtype)
        if xp is not None:
            out = jnp.concatenate([out, xp], axis=-1)
        return out

    return rot(q), rot_cc(k)
