"""Pallas w8a16 matmul vs the XLA astype+dot path (interpret on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_pq_tpu.ops.int8_matmul import int8_matmul, supported


@pytest.mark.parametrize("t,k,n", [
    (1, 256, 128),        # decode single row, partial T tile
    (7, 384, 96),         # ragged everything (partial T and N tiles)
    (300, 512, 512),      # multi-tile T and K
    (16, 1280, 300),      # K needs the 256 tile; partial N
])
def test_int8_matmul_matches_xla(t, k, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.float32)
    w = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.01, 0.1, (n,)), jnp.float32)
    ref = (jnp.dot(x, w.astype(x.dtype),
                   preferred_element_type=jnp.float32)
           * scale[None, :]).astype(x.dtype)
    got = int8_matmul(x, w, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_int8_matmul_3d_and_supported():
    assert supported(11008) and supported(2048)
    assert not supported(100)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 5, 128)), jnp.float32)
    w = jnp.asarray(rng.integers(-127, 128, (128, 64)), jnp.int8)
    scale = jnp.ones((64,), jnp.float32) * 0.05
    got = int8_matmul(x, w, scale, interpret=True)
    ref = jnp.einsum("blk,kn->bln", x, w.astype(jnp.float32)) * 0.05
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_int8_linear_method_dispatch(monkeypatch):
    """Int8LinearMethod.apply routes through the kernel when forced."""
    from vllm_pq_tpu.quantization.methods import Int8LinearMethod
    m = Int8LinearMethod()
    rng = np.random.default_rng(2)
    w = rng.standard_normal((256, 96)).astype(np.float32)
    params = {k: jnp.asarray(v) for k, v in
              m.quantize(w, np.float32).items()}
    x = jnp.asarray(rng.standard_normal((9, 256)), jnp.float32)
    monkeypatch.setenv("VPQ_INT8_MM", "0")
    ref = m.apply(params, x)
    monkeypatch.setenv("VPQ_INT8_MM", "1")
    got = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
