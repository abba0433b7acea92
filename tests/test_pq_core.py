"""PQ quantization core tests (CPU; Pallas kernel in interpret mode).

Mirrors the reference's kernel-test strategy (tests/kernels/test_aqlm.py:
compare custom op vs reference semantics on random tensors)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_pq_tpu.quantization.pq import (PQConfig, pq_dequantize_ref,
                                         pq_matmul_ref, pq_param_shapes,
                                         pq_quantize_weight)
from vllm_pq_tpu.ops.pq_matmul import (pq_dequant_matmul_pallas,
                                       pq_matmul_xla)


def rand_pq(rng, cfg, in_f, out_f):
    j = in_f // cfg.in_group_size
    codes = rng.integers(0, cfg.codebook_size,
                         size=(cfg.num_codebooks, j, out_f))
    codes = codes.astype(np.uint8 if cfg.nbits_per_codebook == 8
                         else np.uint16)
    codebooks = rng.standard_normal(
        (cfg.num_codebooks, cfg.codebook_size,
         cfg.in_group_size)).astype(np.float32) * 0.1
    scales = (rng.standard_normal(out_f).astype(np.float32) * 0.2 + 1.0)
    return jnp.asarray(codes), jnp.asarray(codebooks), jnp.asarray(scales)


def test_dequant_shapes_and_semantics():
    cfg = PQConfig(num_codebooks=2, nbits_per_codebook=8)
    rng = np.random.default_rng(0)
    codes, codebooks, scales = rand_pq(rng, cfg, 32, 16)
    w = pq_dequantize_ref(codes, codebooks, scales)
    assert w.shape == (32, 16)
    # manual check of one element
    jj, pp, oo = 2, 3, 5
    expect = sum(
        float(codebooks[k, codes[k, jj, oo], pp]) for k in range(2))
    expect *= float(scales[oo])
    np.testing.assert_allclose(float(w[jj * 8 + pp, oo]), expect, rtol=1e-5)


def test_matmul_ref_matches_dense():
    cfg = PQConfig()
    rng = np.random.default_rng(1)
    codes, codebooks, scales = rand_pq(rng, cfg, 64, 32)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = pq_dequantize_ref(codes, codebooks, scales)
    np.testing.assert_allclose(
        np.asarray(pq_matmul_ref(x, codes, codebooks, scales)),
        np.asarray(x @ w), rtol=1e-4, atol=1e-4)


def test_quantizer_roundtrip_exact_when_representable():
    """If W is constructed from codebook entries, quantization must be
    able to represent it (near-)exactly after fitting."""
    cfg = PQConfig(num_codebooks=1, nbits_per_codebook=8)
    rng = np.random.default_rng(2)
    # build W from 16 distinct subvectors -> kmeans k=256 fits exactly
    basis = rng.standard_normal((16, 8)).astype(np.float32)
    picks = rng.integers(0, 16, size=(8, 24))  # J=8, O=24
    w = np.zeros((64, 24), np.float32)
    for j in range(8):
        for o in range(24):
            w[j * 8:(j + 1) * 8, o] = basis[picks[j, o]]
    arts = pq_quantize_weight(w, cfg, kmeans_iters=25)
    w2 = np.asarray(pq_dequantize_ref(
        jnp.asarray(arts["codes"]), jnp.asarray(arts["codebooks"]),
        jnp.asarray(arts["scales"])))
    err = np.abs(w2 - w).max() / (np.abs(w).max() + 1e-9)
    assert err < 0.05, err


def test_quantizer_error_reasonable():
    cfg = PQConfig(num_codebooks=2, nbits_per_codebook=8)
    rng = np.random.default_rng(3)
    w = rng.standard_normal((128, 64)).astype(np.float32)
    arts = pq_quantize_weight(w, cfg, kmeans_iters=8)
    assert arts["codes"].shape == (2, 16, 64)
    assert arts["codes"].dtype == np.uint8
    w2 = np.asarray(pq_dequantize_ref(
        jnp.asarray(arts["codes"]), jnp.asarray(arts["codebooks"]),
        jnp.asarray(arts["scales"])))
    rel = np.linalg.norm(w2 - w) / np.linalg.norm(w)
    # 2x8 additive quantization of gaussian noise: expect sizeable but
    # bounded error
    assert rel < 0.7, rel


def test_param_shapes():
    cfg = PQConfig(num_codebooks=2, nbits_per_codebook=8)
    shapes = pq_param_shapes(cfg, 4096, 1024)
    assert shapes["codes"][0] == (2, 512, 1024)
    assert shapes["codebooks"][0] == (2, 256, 8)
    assert shapes["scales"][0] == (1024,)
    with pytest.raises(ValueError):
        pq_param_shapes(cfg, 30, 8)


@pytest.mark.parametrize("variant", ["packed", "split"])
@pytest.mark.parametrize("t,i,o", [(1, 64, 128), (7, 128, 256),
                                   (32, 256, 128), (130, 64, 384)])
def test_pallas_dequant_matmul_interpret(t, i, o, variant):
    cfg = PQConfig(num_codebooks=2, nbits_per_codebook=8)
    rng = np.random.default_rng(42)
    codes, codebooks, scales = rand_pq(rng, cfg, i, o)
    x = jnp.asarray(rng.standard_normal((t, i)).astype(np.float32))
    ref = pq_matmul_xla(x, codes, codebooks, scales)
    got = pq_dequant_matmul_pallas(x, codes, codebooks, scales,
                                   interpret=True, variant=variant)
    assert got.shape == (t, o)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("variant", ["packed", "split"])
def test_pallas_one_codebook(variant):
    cfg = PQConfig(num_codebooks=1, nbits_per_codebook=8)
    rng = np.random.default_rng(5)
    codes, codebooks, scales = rand_pq(rng, cfg, 64, 128)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    ref = pq_matmul_xla(x, codes, codebooks, scales)
    got = pq_dequant_matmul_pallas(x, codes, codebooks, scales,
                                   interpret=True, variant=variant)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("variant", ["packed", "split"])
def test_pallas_dequant_full_interpret(variant):
    from vllm_pq_tpu.ops.pq_matmul import pq_dequant_full_pallas
    from vllm_pq_tpu.quantization.pq import pq_dequantize_ref
    cfg = PQConfig(num_codebooks=2, nbits_per_codebook=8)
    rng = np.random.default_rng(9)
    codes, codebooks, scales = rand_pq(rng, cfg, 96, 256)
    ref = pq_dequantize_ref(codes, codebooks, scales,
                            out_dtype=jnp.float32)
    got = pq_dequant_full_pallas(codes, codebooks, scales,
                                 out_dtype=jnp.float32, interpret=True,
                                 variant=variant)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
