"""Quantized linear methods: round-trip accuracy and apply correctness
(role of reference tests/kernels/test_{marlin_gemm,int8_quant}.py and
tests/quantization)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_pq_tpu.quantization import get_linear_method


def _rel_err(a, b):
    return np.abs(a - b).mean() / (np.abs(b).mean() + 1e-9)


# int4 tolerance: 16 levels over ~6 sigma => per-weight quant noise
# ~0.11 sigma; output error keeps that proportion (random-walk), so
# ~8-12% on gaussian weights is the information-theoretic expectation.
@pytest.mark.parametrize("name,cfg,tol", [
    ("int8", None, 0.02),
    ("int4", {"group_size": 32}, 0.12),
    ("int4", {"group_size": 128}, 0.15),
    ("w8a8", None, 0.03),
])
def test_quantized_apply_close_to_dense(name, cfg, tol):
    rng = np.random.default_rng(0)
    i, o, t = 256, 128, 4
    w = rng.standard_normal((i, o)).astype(np.float32) * 0.05
    x = rng.standard_normal((t, i)).astype(np.float32)
    m = get_linear_method(name, cfg)
    params = {k: jnp.asarray(v) for k, v in m.quantize(w, np.float32).items()}
    y = np.asarray(m.apply(params, jnp.asarray(x)))
    ref = x @ w
    assert _rel_err(y, ref) < tol, _rel_err(y, ref)


def test_int4_pack_roundtrip_exact():
    """Values exactly representable on the 4-bit grid survive."""
    rng = np.random.default_rng(1)
    i, o, g = 64, 32, 32
    m = get_linear_method("int4", {"group_size": g})
    scale = 0.1
    q = rng.integers(0, 16, (i, o))
    # pin the grid: every (group, column) must span the full 0..15 range
    # so the quantizer recovers the generating scale exactly
    q[0::g, :] = 0
    q[1::g, :] = 15
    w = (q - 8) * scale
    params = m.quantize(w.astype(np.float32), np.float32)
    deq = np.asarray(m._dequant(
        {k: jnp.asarray(v) for k, v in params.items()}, jnp.float32))
    np.testing.assert_allclose(deq, w, rtol=1e-4, atol=1e-5)


def test_param_shapes_and_specs_exist():
    for name, cfg in [("int8", None), ("int4", None), ("w8a8", None),
                      ("pq", {"num_codebooks": 2, "nbits_per_codebook": 8})]:
        m = get_linear_method(name, cfg)
        shapes = m.param_shapes(256, 128, jnp.bfloat16)
        for kind in ("column", "row"):
            specs = m.partition_specs(kind)
            assert set(specs) == set(shapes), (name, kind)
