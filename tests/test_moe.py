"""MoE: ragged-dot fused layer vs per-token oracle; Mixtral e2e; TP
consistency (role of reference tests/kernels/test_moe.py)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_pq_tpu.layers.moe import FusedMoE, moe_ref


def _params(moe, rng, dtype=np.float32):
    shapes = moe.param_shapes(jnp.float32)

    def init(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = init(v)
            else:
                shape, _ = v
                out[k] = jnp.asarray(
                    rng.standard_normal(shape).astype(dtype) * 0.1)
        return out
    return init(shapes)


@pytest.mark.parametrize("t,e,k", [(7, 4, 2), (16, 8, 2), (3, 4, 1)])
def test_moe_matches_oracle(t, e, k):
    rng = np.random.default_rng(0)
    moe = FusedMoE(hidden_size=32, intermediate_size=48, num_experts=e,
                   top_k=k)
    params = _params(moe, rng)
    x = jnp.asarray(rng.standard_normal((t, 32)).astype(np.float32))
    got = np.asarray(jax.jit(lambda p, x: moe(p, x, tp_axis=None))(
        params, x))
    ref = moe_ref(params, x, top_k=k)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_moe_tp_consistency(cpu_devices):
    """tp=1 vs tp=4 sharded execution must agree."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(1)
    moe = FusedMoE(hidden_size=32, intermediate_size=64, num_experts=4,
                   top_k=2)
    params = _params(moe, rng)
    x = jnp.asarray(rng.standard_normal((9, 32)).astype(np.float32))
    ref = np.asarray(jax.jit(lambda p, x: moe(p, x, tp_axis=None))(
        params, x))

    mesh = Mesh(np.array(cpu_devices[:4]).reshape(1, 4), ("data", "model"))
    specs = moe.partition_specs()
    sharded_params = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda v: isinstance(v, jax.Array))
    fn = jax.jit(jax.shard_map(
        lambda p, x: moe(p, x, tp_axis="model"),
        mesh=mesh, in_specs=(specs, P()), out_specs=P(),
        check_vma=False))
    got = np.asarray(fn(sharded_params, x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


TINY_MIXTRAL = {
    "architectures": ["MixtralForCausalLM"],
    "vocab_size": 512,
    "hidden_size": 128,
    "intermediate_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "num_key_value_heads": 2,
    "num_local_experts": 4,
    "num_experts_per_tok": 2,
    "max_position_embeddings": 512,
}


def test_mixtral_e2e(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d = tmp_path / "mixtral"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(TINY_MIXTRAL, f)
    llm = LLM(model=str(d), load_format="dummy", dtype="float32",
              max_model_len=128, max_num_seqs=4,
              max_num_batched_tokens=128, block_size=16, num_kv_blocks=64)
    outs = llm.generate(["hello there", "moe test"],
                        SamplingParams(temperature=0.0, max_tokens=8,
                                       ignore_eos=True))
    assert len(outs) == 2
    for o in outs:
        assert len(o.outputs[0].token_ids) == 8
    # determinism
    a = llm.generate(["xy"], SamplingParams(temperature=0.0, max_tokens=6,
                                            ignore_eos=True))
    b = llm.generate(["xy"], SamplingParams(temperature=0.0, max_tokens=6,
                                            ignore_eos=True))
    assert a[0].outputs[0].token_ids == b[0].outputs[0].token_ids


def test_moe_ep_consistency(cpu_devices):
    """expert-parallel (expert-dim sharding, reference expert_map EP)
    must match unsharded execution exactly."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(2)
    moe = FusedMoE(hidden_size=32, intermediate_size=64, num_experts=8,
                   top_k=2, expert_parallel=True)
    params = _params(moe, rng)
    x = jnp.asarray(rng.standard_normal((9, 32)).astype(np.float32))
    ref = np.asarray(jax.jit(lambda p, x: moe(p, x, tp_axis=None))(
        params, x))

    mesh = Mesh(np.array(cpu_devices[:4]).reshape(1, 4), ("data", "model"))
    specs = moe.partition_specs()
    sharded_params = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda v: isinstance(v, jax.Array))
    fn = jax.jit(jax.shard_map(
        lambda p, x: moe(p, x, tp_axis="model"),
        mesh=mesh, in_specs=(specs, P()), out_specs=P(),
        check_vma=False))
    got = np.asarray(fn(sharded_params, x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_moe_ep_skewed_routing(cpu_devices):
    """EP stays exact when every token routes to one shard's experts."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(3)
    moe = FusedMoE(hidden_size=32, intermediate_size=64, num_experts=4,
                   top_k=2, expert_parallel=True)
    params = _params(moe, rng)
    # bias the router so experts 0,1 (shard 0 under ep=2... ep=4 -> one
    # expert per shard) dominate
    router = np.asarray(params["router"]["weight"]).copy()
    router[:, 2:] -= 100.0
    params["router"]["weight"] = jnp.asarray(router)
    x = jnp.asarray(rng.standard_normal((6, 32)).astype(np.float32))
    ref = np.asarray(jax.jit(lambda p, x: moe(p, x, tp_axis=None))(
        params, x))

    mesh = Mesh(np.array(cpu_devices[:4]).reshape(1, 4), ("data", "model"))
    specs = moe.partition_specs()
    sharded_params = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda v: isinstance(v, jax.Array))
    fn = jax.jit(jax.shard_map(
        lambda p, x: moe(p, x, tp_axis="model"),
        mesh=mesh, in_specs=(specs, P()), out_specs=P(),
        check_vma=False))
    got = np.asarray(fn(sharded_params, x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# HF-golden parity: real checkpoint loading for the MoE families


def _hf_golden_compare(hf_model, llm, n_new=8, trials=2):
    from vllm_pq_tpu import SamplingParams
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    for _ in range(trials):
        prompt = rng.integers(5, 500, int(rng.integers(4, 20))).tolist()
        with torch.no_grad():
            exp = hf_model.generate(
                torch.tensor([prompt]), max_new_tokens=n_new,
                do_sample=False, num_beams=1,
                pad_token_id=0)[0, len(prompt):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(temperature=0.0, max_tokens=n_new,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (got, exp)


def test_mixtral_matches_hf(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM

    from vllm_pq_tpu import LLM
    cfg = MixtralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, max_position_embeddings=256,
        rms_norm_eps=1e-5)
    torch.manual_seed(0)
    hf = MixtralForCausalLM(cfg).eval().float()
    d = tmp_path / "mixtral_hf"
    hf.save_pretrained(d, safe_serialization=True)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    _hf_golden_compare(hf, llm)


def test_qwen2_moe_matches_hf(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    from vllm_pq_tpu import LLM
    cfg = Qwen2MoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, shared_expert_intermediate_size=80,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, num_experts=8, num_experts_per_tok=2,
        decoder_sparse_step=1, mlp_only_layers=[1],
        norm_topk_prob=False, max_position_embeddings=256,
        rms_norm_eps=1e-5)
    torch.manual_seed(1)
    hf = Qwen2MoeForCausalLM(cfg).eval().float()
    d = tmp_path / "qwen2moe_hf"
    hf.save_pretrained(d, safe_serialization=True)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    _hf_golden_compare(hf, llm)
