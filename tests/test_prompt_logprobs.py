"""Prompt logprobs: per-prompt-position top-k + target logprobs across
chunked prefill (reference prompt_logprobs semantics)."""

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
def llm(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_plp_model")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    from vllm_pq_tpu import LLM
    # small budget forces chunked prefill across plp chunks
    return LLM(model=str(d), load_format="dummy", dtype="float32",
               max_model_len=128, max_num_seqs=8,
               max_num_batched_tokens=32, block_size=16, num_kv_blocks=64,
               enable_prefix_caching=False)


def test_prompt_logprobs_chunked(llm):
    from vllm_pq_tpu import SamplingParams
    ids = list(range(10, 50))  # 40 tokens > 32 budget => 2 chunks
    out = llm.generate(
        [{"prompt_token_ids": ids}],
        SamplingParams(temperature=0.0, max_tokens=4, prompt_logprobs=3,
                       ignore_eos=True))[0]
    plp = out.prompt_logprobs
    assert plp is not None and len(plp) == len(ids)
    assert plp[0] is None
    for i, entry in enumerate(plp[1:], 1):
        assert ids[i] in entry          # actual token always present
        assert entry[ids[i]].logprob <= 0
        assert len(entry) >= 3          # top-k included


def test_no_prompt_logprobs_by_default(llm):
    from vllm_pq_tpu import SamplingParams
    out = llm.generate(
        [{"prompt_token_ids": [5, 6, 7, 8]}],
        SamplingParams(temperature=0.0, max_tokens=4,
                       ignore_eos=True))[0]
    assert out.prompt_logprobs is None
