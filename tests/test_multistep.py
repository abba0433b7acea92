"""Multi-step decoding: N fused decode iterations per dispatch must
produce exactly the same greedy tokens (and the same seeded-sampling
streams) as single-step execution."""

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


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_ms_model")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    return str(d)


KW = dict(load_format="dummy", dtype="float32", max_model_len=128,
          max_num_seqs=8, max_num_batched_tokens=128, block_size=16,
          num_kv_blocks=64)


def _gen(model_dir, sps, prompts, **extra):
    from vllm_pq_tpu import LLM
    llm = LLM(model=model_dir, **KW, **extra)
    outs = llm.generate(prompts, sps)
    return [o.outputs[0].token_ids for o in outs]


def test_multistep_greedy_equivalence(tiny_model_dir):
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=21, ignore_eos=True)
    prompts = [{"prompt_token_ids": [7, 8, 9, 10, 11]},
               {"prompt_token_ids": [3, 4, 5]},
               {"prompt_token_ids": [100, 101, 102, 103, 104, 105, 106]}]
    ref = _gen(tiny_model_dir, sp, prompts)
    got = _gen(tiny_model_dir, sp, prompts, num_scheduler_steps=4)
    assert got == ref


def test_multistep_bucket_smaller_than_max_seqs(tiny_model_dir):
    """Few running rows pick a token bucket below max_num_seqs; the scan
    must still carry full-width [S] state."""
    from vllm_pq_tpu import LLM, SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompts = [{"prompt_token_ids": [7, 8, 9]},
               {"prompt_token_ids": [4, 5, 6]}]
    kw = dict(KW)
    kw.update(max_num_seqs=32, max_num_batched_tokens=256)
    ref = [o.outputs[0].token_ids
           for o in LLM(model=tiny_model_dir, **kw).generate(prompts, sp)]
    got = [o.outputs[0].token_ids
           for o in LLM(model=tiny_model_dir, num_scheduler_steps=4,
                        **kw).generate(prompts, sp)]
    assert got == ref


def test_multistep_seeded_equivalence(tiny_model_dir):
    """Seeded sampling streams depend only on (seed, output position), so
    they must be identical across scheduling modes."""
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.8, seed=1234, max_tokens=16,
                        ignore_eos=True)
    prompts = [{"prompt_token_ids": [5, 6, 7, 8]}]
    ref = _gen(tiny_model_dir, sp, prompts)
    got = _gen(tiny_model_dir, sp, prompts, num_scheduler_steps=4)
    assert got == ref


def test_multistep_eos_and_max_tokens(tiny_model_dir):
    """max_tokens not a multiple of N: the tail is trimmed host-side."""
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    prompts = [{"prompt_token_ids": [1, 2, 3]}]
    got = _gen(tiny_model_dir, sp, prompts, num_scheduler_steps=4)
    assert len(got[0]) == 10


def test_multistep_mixed_arrivals(tiny_model_dir):
    """Requests arriving at different times (prefill interleaved with
    decode) still produce the single-step results."""
    from vllm_pq_tpu import LLM, SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompts = [{"prompt_token_ids": [7, 8, 9, 10, 11]},
               {"prompt_token_ids": [3, 4, 5]}]
    ref = _gen(tiny_model_dir, sp, prompts)

    llm = LLM(model=tiny_model_dir, num_scheduler_steps=4, **KW)
    eng = llm.llm_engine
    eng.add_request("a", prompts[0], sp)
    # let request a decode a few multi-steps before b arrives
    outs = {}
    for _ in range(3):
        for o in eng.step():
            pass
    eng.add_request("b", prompts[1], sp)
    results = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                results[o.request_id] = o.outputs[0].token_ids
    assert results["a"] == ref[0]
    assert results["b"] == ref[1]


def test_multistep_async_composition(tiny_model_dir):
    """Round-2: multi-step windows composed with lag-1 async scheduling
    (the runner resolves window-0 input tokens on device from the
    previous dispatch's samples) must stay token-exact vs plain
    single-step sync execution."""
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=21, ignore_eos=True)
    prompts = [{"prompt_token_ids": [7, 8, 9, 10, 11]},
               {"prompt_token_ids": [3, 4, 5]},
               {"prompt_token_ids": [100, 101, 102, 103, 104, 105, 106]}]
    ref = _gen(tiny_model_dir, sp, prompts)
    got = _gen(tiny_model_dir, sp, prompts, num_scheduler_steps=4,
               async_scheduling=True)
    assert got == ref


def test_multistep_async_eos_mid_window(tiny_model_dir):
    """EOS inside a fused window under async scheduling truncates the
    window's remaining tokens, matching sync stop behavior."""
    from vllm_pq_tpu import SamplingParams
    prompts = [{"prompt_token_ids": [11, 12, 13, 14]},
               {"prompt_token_ids": [40, 41, 42]}]
    # discover each prompt's greedy stream, pick a token mid-stream as a
    # stop token so the stop fires inside a window
    sp0 = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    base = _gen(tiny_model_dir, sp0, prompts)
    stop_tok = base[0][6]
    sp = SamplingParams(temperature=0.0, max_tokens=12,
                        stop_token_ids=[stop_tok])
    ref = _gen(tiny_model_dir, sp, prompts)
    got = _gen(tiny_model_dir, sp, prompts, num_scheduler_steps=4,
               async_scheduling=True)
    assert got == ref


def test_multistep_async_max_tokens_tail(tiny_model_dir):
    """max_tokens not a multiple of N under async multi-step."""
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    prompts = [{"prompt_token_ids": [1, 2, 3]}]
    ref = _gen(tiny_model_dir, sp, prompts)
    got = _gen(tiny_model_dir, sp, prompts, num_scheduler_steps=4,
               async_scheduling=True)
    assert got == ref


def test_multistep_shared_prefix_cascade(tiny_model_dir):
    """Prefix-cached shared prompts: the cascade arena (shared KV stored
    once) must stay token-exact vs independent prompts."""
    from vllm_pq_tpu import LLM, SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    shared = list(range(10, 58))  # 3 full blocks of shared prefix
    prompts = [{"prompt_token_ids": shared + [70 + i, 80 + i]}
               for i in range(4)]
    kw = dict(model=tiny_model_dir, load_format="dummy", dtype="float32",
              max_model_len=128, max_num_seqs=8,
              max_num_batched_tokens=256, block_size=16, num_kv_blocks=64)
    ref = [o.outputs[0].token_ids
           for o in LLM(**kw).generate(prompts, sp)]
    llm = LLM(num_scheduler_steps=4, enable_prefix_caching=True,
              async_scheduling=True, **kw)
    got = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]
    assert got == ref
    # the cascade variant actually engaged (shared pages detected)
    runner = llm.llm_engine.engine_core.runner
    assert any(isinstance(k, tuple) and k and k[0] == "ms" and k[-1] >= 2
               for k in runner._step_fns), list(runner._step_fns)
