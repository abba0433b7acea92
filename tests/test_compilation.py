"""Recompile control: continuous batching must settle into a BOUNDED
set of compiled step functions (role of reference
tests/tpu/test_compilation.py; SURVEY hard part #3)."""

import json

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


def test_bounded_step_function_count(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d = tmp_path / "m"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    llm = LLM(model=str(d), load_format="dummy", dtype="float32",
              max_model_len=128, max_num_seqs=8,
              max_num_batched_tokens=64, block_size=16, num_kv_blocks=64)
    runner = llm.llm_engine.engine_core.runner

    import numpy as np
    rng = np.random.default_rng(0)
    # varied lengths/batches: ragged arrivals, chunked prefills, decays
    for round_ in range(3):
        prompts = [{"prompt_token_ids":
                    rng.integers(5, 500, int(l)).tolist()}
                   for l in rng.integers(1, 100, 5)]
        llm.generate(prompts, SamplingParams(
            temperature=0.0, max_tokens=int(rng.integers(2, 12)),
            ignore_eos=True))
    n_fns = len(runner._step_fns)
    # bound: (#token buckets x decode/prefill variants); this config has
    # buckets {16, 32, 64} => at most 6 plain variants
    assert n_fns <= 2 * len(runner.token_buckets), (
        n_fns, list(runner._step_fns))


def test_bucket_ladder_covers_budget(tmp_path):
    from vllm_pq_tpu.config import CompilationConfig, SchedulerConfig
    cc = CompilationConfig()
    sc = SchedulerConfig(max_num_seqs=64, max_num_batched_tokens=1000,
                         max_model_len=2048)
    cc.derive(sc)
    assert cc.token_buckets[-1] >= 1000
    assert all(b2 > b1 for b1, b2 in zip(cc.token_buckets,
                                         cc.token_buckets[1:]))
