"""Resident PQ transform (quantization/resident.py): PQ weights are
dequantized ONCE after load into dense (exact) or int8 (budgeted) form.

- resident dense must be token-exact vs. the fused/XLA PQ paths,
- resident int8 must round-trip within the per-channel quantization
  step and agree across row-parallel TP shards,
- the auto policy must fall back (stay PQ) when nothing fits."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TINY = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 512,
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "num_key_value_heads": 2,
    "max_position_embeddings": 512,
}

KW = dict(load_format="dummy", dtype="float32", max_model_len=128,
          max_num_seqs=8, max_num_batched_tokens=128, block_size=16,
          num_kv_blocks=64, quantization="pq")


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_resident_model")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    return str(d)


def _gen(model_dir, monkeypatch_env, **extra):
    import os
    old = {}
    for k, v in monkeypatch_env.items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        from vllm_pq_tpu import LLM, SamplingParams
        llm = LLM(model=model_dir, **KW, **extra)
        sp = SamplingParams(temperature=0.0, max_tokens=16,
                            ignore_eos=True)
        prompts = [{"prompt_token_ids": [7, 8, 9, 10, 11]},
                   {"prompt_token_ids": [3, 4, 5]}]
        outs = llm.generate(prompts, sp)
        method = type(llm.llm_engine.engine_core.worker
                      .model.linear_method).__name__
        return [o.outputs[0].token_ids for o in outs], method
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_resident_dense_token_exact(tiny_model_dir):
    ref, m_ref = _gen(tiny_model_dir, {"VPQ_PQ_RESIDENT": "0"})
    got, m_got = _gen(tiny_model_dir, {"VPQ_PQ_RESIDENT": "dense"})
    assert m_ref == "PQLinearMethod"
    assert m_got == "UnquantizedLinearMethod"
    assert got == ref


def test_resident_auto_policy_fallback(tiny_model_dir):
    # absurdly small budget: auto must keep the PQ params
    _, method = _gen(tiny_model_dir, {"VPQ_PQ_RESIDENT": "auto",
                                      "VPQ_PQ_RESIDENT_MAX_GB": "1e-9"})
    assert method == "PQLinearMethod"


def test_resident_int8_generates(tiny_model_dir):
    # default apply form: w8a8 (dynamic-act int8, MXU s8xs8)
    toks, method = _gen(tiny_model_dir, {"VPQ_PQ_RESIDENT": "int8"})
    assert method == "Int8W8A8LinearMethod"
    assert all(len(t) == 16 for t in toks)
    # w8a16 stays available (no activation quantization error)
    toks2, m2 = _gen(tiny_model_dir, {"VPQ_PQ_RESIDENT": "int8",
                                      "VPQ_INT8_APPLY": "w8a16"})
    assert m2 == "Int8LinearMethod"
    assert all(len(t) == 16 for t in toks2)


def _mk_pq_node(rng, in_f, out_f):
    from vllm_pq_tpu.quantization.methods import PQLinearMethod
    from vllm_pq_tpu.quantization.pq import PQConfig
    method = PQLinearMethod(PQConfig())
    w = rng.standard_normal((in_f, out_f)).astype(np.float32)
    return method, {k: jnp.asarray(v)
                    for k, v in method.quantize(w, np.float32).items()}


def test_int8_transform_roundtrip():
    """q*scale must match the dequantized dense weight within scale/2."""
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    from vllm_pq_tpu.quantization.pq import pq_dequantize_ref
    from vllm_pq_tpu.quantization.resident import _transform_node

    rng = np.random.default_rng(0)
    method, node = _mk_pq_node(rng, 64, 128)
    w = np.asarray(pq_dequantize_ref(node["codes"], node["codebooks"],
                                     node["scales"],
                                     out_dtype=jnp.float32))
    mesh = Mesh(np.array(jax.devices("cpu")[:1]), ("model",))
    out = _transform_node(node, P(None, None, None), mesh, "int8",
                          jnp.float32)
    q = np.asarray(out["weight"], np.int32)
    scale = np.asarray(out["scale"])
    assert np.all(np.abs(q * scale[None, :] - w) <= scale[None, :] / 2
                  + 1e-6)


def test_int8_row_parallel_scales_agree():
    """Row-parallel shards must agree on the per-column scale (pmax over
    the TP axis) so psummed partial outputs are consistent."""
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    from vllm_pq_tpu.quantization.resident import _transform_node

    rng = np.random.default_rng(1)
    method, node = _mk_pq_node(rng, 128, 128)
    devs = jax.devices("cpu")
    if len(devs) < 2:
        pytest.skip("needs >=2 virtual devices")
    mesh = Mesh(np.array(devs[:2]), ("model",))
    # row-parallel: codes sharded on the input-group axis
    out = _transform_node(node, P(None, "model", None), mesh, "int8",
                          jnp.float32)
    scale = out["scale"]
    # device shards of the (replicated-spec) scale must be identical
    shards = [np.asarray(s.data) for s in scale.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_1x16_sharded_resident_int8():
    """1x16 (Code1x16-format) checkpoints transcode through the SHARDED
    int8-resident path: column-parallel codes over a tp mesh produce
    shard-consistent int8 weights matching the unsharded dequant
    (VERDICT r3 #6; reference Code1x16 format, gemm_kernels.cu:31)."""
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    from vllm_pq_tpu.quantization.methods import PQLinearMethod
    from vllm_pq_tpu.quantization.pq import PQConfig, pq_dequantize_ref
    from vllm_pq_tpu.quantization.resident import _transform_node

    rng = np.random.default_rng(2)
    method = PQLinearMethod(PQConfig(num_codebooks=1,
                                     nbits_per_codebook=16))
    w = rng.standard_normal((64, 256)).astype(np.float32)
    node = {k: jnp.asarray(v)
            for k, v in method.quantize(w, np.float32).items()}
    assert node["codes"].dtype == jnp.uint16
    dense = np.asarray(pq_dequantize_ref(
        node["codes"], node["codebooks"], node["scales"],
        out_dtype=jnp.float32))

    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = Mesh(np.array(devs[:4]), ("model",))
    # column-parallel: codes sharded on the out axis
    out = _transform_node(node, P(None, None, "model"), mesh, "int8",
                          jnp.float32)
    q = np.asarray(out["weight"], np.float32)
    scale = np.asarray(out["scale"])
    assert q.shape == dense.shape
    assert np.all(np.abs(q * scale[None, :] - dense)
                  <= scale[None, :] / 2 + 1e-6)


def test_hbm_budget_config5():
    """70B @ pp=2 x tp=8 int8-resident + int8 KV must fit v5e; the bf16
    KV pool capacity must shrink vs int8 (worker/hbm_budget.py)."""
    from vllm_pq_tpu.worker.hbm_budget import (LLAMA2_70B, hbm_budget,
                                               max_kv_blocks)
    b = hbm_budget(LLAMA2_70B, tp=8, pp=2, resident_form="int8",
                   kv_cache_dtype="int8",
                   num_kv_blocks=32 * 128 + 64)
    assert b["fits"], b
    # 70B bf16-resident on ONE chip must NOT fit
    b1 = hbm_budget(LLAMA2_70B, tp=1, pp=1, resident_form="bf16",
                    kv_cache_dtype="auto", num_kv_blocks=0)
    assert not b1["fits"], b1
    assert (max_kv_blocks(LLAMA2_70B, tp=8, pp=2, resident_form="int8",
                          kv_cache_dtype="int8")
            > max_kv_blocks(LLAMA2_70B, tp=8, pp=2,
                            resident_form="int8",
                            kv_cache_dtype="auto"))
