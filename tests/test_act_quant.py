"""Fused Pallas activation quantization vs the XLA reference chain
(ops/act_quant.py; reference int8_quant_kernels.cu
dynamic_scaled_int8_quant semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_pq_tpu.ops.act_quant import quantize_rows, quantize_rows_ref


@pytest.mark.parametrize("t,h", [(16, 256), (256, 2048), (8, 128)])
def test_quantize_rows_matches_ref(t, h):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, h)).astype(np.float32))
    q, s = quantize_rows(x, interpret=True)
    qr, sr = quantize_rows_ref(x)
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(qr))


def test_quantize_rows_zero_row():
    x = jnp.zeros((32, 256), jnp.float32)
    q, s = quantize_rows(x, interpret=True)
    assert np.all(np.asarray(q) == 0)
    assert np.all(np.asarray(s) > 0)


def test_quantize_rows_bf16_tiled():
    # large enough to tile rows (> 6 MiB f32 working set)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2048, 1024)),
                    jnp.bfloat16)
    q, s = quantize_rows(x, interpret=True)
    qr, sr = quantize_rows_ref(x)
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(qr))
