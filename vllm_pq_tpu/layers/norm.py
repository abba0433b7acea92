"""Normalization layers (role of reference ``layers/layernorm.py``).

Pure functions; XLA fuses these into neighboring ops on TPU, so no
custom kernel is needed (reference needed CUDA fast paths, RMSNorm
``layernorm_kernels.cu`` — on TPU the fusion is automatic)."""

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array,
             eps: float = 1e-6) -> jax.Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    x32 = x32 * jax.lax.rsqrt(var + eps)
    return (x32 * weight.astype(jnp.float32)).astype(dtype)


def rms_norm_residual(x: jax.Array, residual: jax.Array, weight: jax.Array,
                      eps: float = 1e-6):
    """Fused add+norm: returns (normed, new_residual)."""
    r = (x.astype(jnp.float32) + residual.astype(jnp.float32))
    var = jnp.mean(r * r, axis=-1, keepdims=True)
    n = r * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return n.astype(x.dtype), r.astype(x.dtype)


def gemma_rms_norm(x: jax.Array, weight: jax.Array,
                   eps: float = 1e-6) -> jax.Array:
    """Gemma variant: scale by (1 + w) (reference GemmaRMSNorm)."""
    return rms_norm(x, weight.astype(jnp.float32) + 1.0, eps)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * weight + bias).astype(dtype)
