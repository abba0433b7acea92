"""End-to-end engine tests on CPU with a dummy tiny model (role of
reference tests/basic_correctness + v1/engine/test_engine_core)."""

import json
import os

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
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "max_position_embeddings": 512,
    "tie_word_embeddings": False,
}


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_model")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    return str(d)


@pytest.fixture(scope="module")
def llm(tiny_model_dir):
    from vllm_pq_tpu import LLM
    return LLM(model=tiny_model_dir, load_format="dummy",
               dtype="float32", max_model_len=128, max_num_seqs=8,
               max_num_batched_tokens=128, block_size=16,
               num_kv_blocks=64)


def test_greedy_generate(llm):
    from vllm_pq_tpu import SamplingParams
    outs = llm.generate(["Hello world", "The quick brown fox"],
                        SamplingParams(temperature=0.0, max_tokens=8))
    assert len(outs) == 2
    for o in outs:
        assert o.finished
        assert len(o.outputs[0].token_ids) == 8 or \
            o.outputs[0].finish_reason == "stop"
        assert o.outputs[0].finish_reason in ("stop", "length")


def test_greedy_deterministic(llm):
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=12)
    a = llm.generate(["determinism test"], sp)[0].outputs[0].token_ids
    b = llm.generate(["determinism test"], sp)[0].outputs[0].token_ids
    assert a == b


def test_batch_matches_single(llm):
    """Continuous batching must not change greedy outputs."""
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    prompts = [f"prompt number {i}" for i in range(5)]
    batch = llm.generate(prompts, sp)
    singles = [llm.generate([p], sp)[0] for p in prompts]
    for b, s in zip(batch, singles):
        assert b.outputs[0].token_ids == s.outputs[0].token_ids


def test_sampling_seeded_reproducible(llm):
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.8, seed=1234, max_tokens=8)
    a = llm.generate(["seeded sampling"], sp)[0].outputs[0].token_ids
    b = llm.generate(["seeded sampling"], sp)[0].outputs[0].token_ids
    assert a == b


def test_n_parallel_sampling(llm):
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.9, n=3, max_tokens=5, seed=7)
    out = llm.generate(["fan out"], sp)[0]
    assert len(out.outputs) == 3
    assert [c.index for c in out.outputs] == [0, 1, 2]


def test_max_tokens_respected(llm):
    from vllm_pq_tpu import SamplingParams
    out = llm.generate(["count"], SamplingParams(temperature=0.0,
                                                 max_tokens=3))[0]
    assert len(out.outputs[0].token_ids) <= 3


def test_logprobs(llm):
    from vllm_pq_tpu import SamplingParams
    out = llm.generate(["logprob test"],
                       SamplingParams(temperature=0.0, max_tokens=4,
                                      logprobs=3))[0]
    lps = out.outputs[0].logprobs
    assert lps is not None and len(lps) == len(out.outputs[0].token_ids)
    for tok, entry in zip(out.outputs[0].token_ids, lps):
        assert tok in entry
        assert out.outputs[0].cumulative_logprob <= 0.0


def test_long_prompt_chunked_prefill(tiny_model_dir):
    """Prompt longer than the token budget must prefill over steps."""
    from vllm_pq_tpu import LLM, SamplingParams
    llm2 = LLM(model=tiny_model_dir, load_format="dummy", dtype="float32",
               max_model_len=128, max_num_seqs=4,
               max_num_batched_tokens=32, block_size=16, num_kv_blocks=64)
    prompt = {"prompt_token_ids": list(np.arange(70) % 500)}
    out = llm2.generate([prompt],
                        SamplingParams(temperature=0.0, max_tokens=4))[0]
    assert out.finished
    assert len(out.outputs[0].token_ids) <= 4


def test_prefix_cache_consistency(llm):
    """Second identical prompt (prefix hit) must produce identical
    greedy tokens."""
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    prompt = "shared prefix for caching " * 3
    a = llm.generate([prompt], sp)[0].outputs[0].token_ids
    b = llm.generate([prompt], sp)[0].outputs[0].token_ids
    assert a == b
