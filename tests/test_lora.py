"""Multi-LoRA serving: stacked-adapter apply, batching independence,
and adapter lifecycle (role of reference tests/lora/)."""

import json

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
          num_kv_blocks=64, enable_lora=True, max_loras=2,
          max_lora_rank=8)


def _mk_lora(llm, name, seed, scale=1.0, rank=4):
    from vllm_pq_tpu.lora.models import LoRAModel
    model = llm.llm_engine.engine_core.runner.model
    dims = {n: (i, o) for n, i, o, _ in model.lora_linear_defs()}
    return LoRAModel.from_arrays(
        name, rank, model.cfg.num_hidden_layers, list(dims), dims,
        seed=seed, scale=scale)


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_lora_model")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    from vllm_pq_tpu import LLM
    return LLM(model=str(d), **KW)


def _gen(llm, prompt, lora_request=None, tokens=10):
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=tokens,
                        ignore_eos=True)
    return llm.generate([{"prompt_token_ids": prompt}], sp,
                        lora_request=lora_request)[0].outputs[0].token_ids


def test_zero_adapter_matches_base(llm):
    from vllm_pq_tpu.lora.request import LoRARequest
    core = llm.llm_engine.engine_core
    base = _gen(llm, [5, 6, 7, 8])
    zero = _mk_lora(llm, "zero", seed=0, scale=0.0)
    core.add_lora(zero)
    got = _gen(llm, [5, 6, 7, 8], LoRARequest("zero", 1))
    assert got == base
    assert core.remove_lora("zero")


def test_adapter_changes_output_and_batch_independence(llm):
    from vllm_pq_tpu.lora.request import LoRARequest
    from vllm_pq_tpu import SamplingParams
    core = llm.llm_engine.engine_core
    core.add_lora(_mk_lora(llm, "a1", seed=1, scale=30.0))
    core.add_lora(_mk_lora(llm, "a2", seed=2, scale=30.0))
    prompt = [9, 10, 11, 12]
    base = _gen(llm, prompt)
    with_a1 = _gen(llm, prompt, LoRARequest("a1", 1))
    with_a2 = _gen(llm, prompt, LoRARequest("a2", 2))
    assert with_a1 != base
    assert with_a2 != base
    assert with_a1 != with_a2

    # batching independence: base + a1 + a2 in ONE batch must reproduce
    # the isolated runs exactly
    eng = llm.llm_engine
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    eng.add_request("rb", {"prompt_token_ids": prompt}, sp)
    eng.add_request("r1", {"prompt_token_ids": prompt}, sp,
                    lora_request=LoRARequest("a1", 1))
    eng.add_request("r2", {"prompt_token_ids": prompt}, sp,
                    lora_request=LoRARequest("a2", 2))
    results = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                results[o.request_id] = o.outputs[0].token_ids
    assert results["rb"] == base
    assert results["r1"] == with_a1
    assert results["r2"] == with_a2
    core.remove_lora("a1")
    core.remove_lora("a2")


def test_lora_slot_exhaustion(llm):
    core = llm.llm_engine.engine_core
    core.add_lora(_mk_lora(llm, "x1", seed=3))
    core.add_lora(_mk_lora(llm, "x2", seed=4))
    with pytest.raises(RuntimeError, match="slots"):
        core.add_lora(_mk_lora(llm, "x3", seed=5))
    core.remove_lora("x1")
    core.add_lora(_mk_lora(llm, "x3", seed=5))  # freed slot reusable
    core.remove_lora("x2")
    core.remove_lora("x3")


def test_lora_apply_matches_dense_reference():
    """lora_apply == x @ A @ B per token with its own adapter."""
    import jax.numpy as jnp
    from vllm_pq_tpu.lora.models import lora_apply
    rng = np.random.default_rng(0)
    t, i, o, r, n_slots = 6, 16, 12, 4, 3
    a = rng.standard_normal((n_slots, i, r)).astype(np.float32)
    b = rng.standard_normal((n_slots, r, o)).astype(np.float32)
    a[0] = 0
    b[0] = 0
    x = rng.standard_normal((t, i)).astype(np.float32)
    slots = np.array([0, 1, 2, 1, 0, 2], np.int32)
    order = np.argsort(slots, kind="stable").astype(np.int32)
    groups = np.bincount(slots, minlength=n_slots).astype(np.int32)
    got = np.asarray(lora_apply(jnp.asarray(x), jnp.asarray(a),
                                jnp.asarray(b), jnp.asarray(order),
                                jnp.asarray(groups)))
    ref = np.stack([x[k] @ a[slots[k]] @ b[slots[k]] for k in range(t)])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
