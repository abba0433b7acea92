"""Async (lag-1) scheduling: greedy outputs must be identical to sync
scheduling across decode, mixed arrivals, EOS/max_tokens, preemption
pressure, and the constrained-request sync fallback."""

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

KW = dict(load_format="dummy", dtype="float32", max_model_len=128,
          max_num_seqs=8, max_num_batched_tokens=128, block_size=16,
          num_kv_blocks=64)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_async_model")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    return str(d)


def _run(model_dir, prompts, sps, **extra):
    from vllm_pq_tpu import LLM
    llm = LLM(model=model_dir, **dict(KW, **extra))
    outs = llm.generate(prompts, sps)
    return [o.outputs[0].token_ids for o in outs]


def test_async_greedy_equivalence(model_dir):
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=17, ignore_eos=True)
    prompts = [{"prompt_token_ids": [7, 8, 9, 10, 11]},
               {"prompt_token_ids": [3, 4, 5]},
               {"prompt_token_ids": list(range(40, 70))}]
    ref = _run(model_dir, prompts, sp)
    got = _run(model_dir, prompts, sp, async_scheduling=True)
    assert got == ref


def test_async_seeded_equivalence(model_dir):
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.9, seed=42, max_tokens=12,
                        ignore_eos=True)
    prompts = [{"prompt_token_ids": [5, 6, 7]}]
    ref = _run(model_dir, prompts, sp)
    got = _run(model_dir, prompts, sp, async_scheduling=True)
    assert got == ref


def test_async_varied_max_tokens(model_dir):
    from vllm_pq_tpu import SamplingParams
    prompts = [{"prompt_token_ids": [9, 9, 9]},
               {"prompt_token_ids": [8, 8]}]
    sps = [SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True),
           SamplingParams(temperature=0.0, max_tokens=13,
                          ignore_eos=True)]
    ref = _run(model_dir, prompts, sps)
    got = _run(model_dir, prompts, sps, async_scheduling=True)
    assert got == ref
    assert [len(t) for t in got] == [5, 13]


def test_async_preemption_pressure(model_dir):
    """Tiny KV pool forces preemption; async deferred-free must keep
    results identical."""
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    prompts = [{"prompt_token_ids": list(range(10, 40))},
               {"prompt_token_ids": list(range(50, 85))},
               {"prompt_token_ids": list(range(100, 120))}]
    kw = dict(num_kv_blocks=14)
    ref = _run(model_dir, prompts, sp, **kw)
    got = _run(model_dir, prompts, sp, async_scheduling=True, **kw)
    assert got == ref


def test_async_with_constrained_fallback(model_dir):
    """A guided request forces per-iteration sync fallback; results for
    both requests still match pure-sync execution."""
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.sampling_params import GuidedDecodingParams
    sps = [SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True),
           SamplingParams(temperature=0.0, max_tokens=16,
                          guided_decoding=GuidedDecodingParams(
                              choice=["apple", "banana"]))]
    prompts = [{"prompt_token_ids": [5, 6, 7]}, "choose:"]
    ref_llm = LLM(model=model_dir, **KW)
    ref = ref_llm.generate(prompts, sps)
    llm = LLM(model=model_dir, async_scheduling=True, **KW)
    got = llm.generate(prompts, sps)
    assert [o.outputs[0].token_ids for o in got] == \
        [o.outputs[0].token_ids for o in ref]
    assert got[1].outputs[0].text in ("apple", "banana")
