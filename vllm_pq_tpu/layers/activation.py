"""Activations (role of reference ``layers/activation.py``)."""

import jax
import jax.numpy as jnp


def silu_and_mul(x: jax.Array) -> jax.Array:
    """x: [..., 2*d] (gate || up) -> silu(gate) * up."""
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(gate) * up


def gelu_and_mul(x: jax.Array, approximate: bool = True) -> jax.Array:
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.gelu(gate, approximate=approximate) * up


ACT2FN = {
    "silu": jax.nn.silu,
    # HF "gelu" is the exact erf form; the tanh approximation is the
    # separate "gelu_new"/"gelu_pytorch_tanh" entries
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "relu2": lambda x: jnp.square(jax.nn.relu(x)),
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
}
