"""LLM entrypoint API surface: beam search, sleep/wake, collective_rpc,
apply_model (reference parity contract, SURVEY §8)."""

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
    d = tmp_path_factory.mktemp("tiny_api_model")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    from vllm_pq_tpu import LLM
    return LLM(model=str(d), load_format="dummy", dtype="float32",
               max_model_len=128, max_num_seqs=8,
               max_num_batched_tokens=128, block_size=16, num_kv_blocks=64)


def test_beam_search(llm):
    from vllm_pq_tpu.sampling_params import BeamSearchParams
    out = llm.beam_search(
        [{"prompt_token_ids": [5, 6, 7, 8]}],
        BeamSearchParams(beam_width=3, max_tokens=6, ignore_eos=True))
    assert len(out) == 1
    beams = out[0].outputs
    assert len(beams) == 3
    # beams sorted by score, all 6 tokens long (ignore_eos)
    assert all(len(b.token_ids) == 6 for b in beams)
    scores = [b.cumulative_logprob for b in beams]
    assert scores == sorted(scores, reverse=True)
    # beam 0 must beat-or-match greedy's total logprob on the same prompt
    from vllm_pq_tpu import SamplingParams
    g = llm.generate([{"prompt_token_ids": [5, 6, 7, 8]}],
                     SamplingParams(temperature=0.0, max_tokens=6,
                                    logprobs=1, ignore_eos=True))[0]
    greedy_cum = g.outputs[0].cumulative_logprob
    assert beams[0].cumulative_logprob >= greedy_cum - 1e-3


def test_sleep_wake_roundtrip(llm):
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    p = [{"prompt_token_ids": [9, 10, 11, 12]}]
    ref = llm.generate(p, sp)[0].outputs[0].token_ids
    llm.sleep(level=1)
    llm.wake_up()
    got = llm.generate(p, sp)[0].outputs[0].token_ids
    assert got == ref
    # level 2 drops weights too
    llm.sleep(level=2)
    llm.wake_up()
    got2 = llm.generate(p, sp)[0].outputs[0].token_ids
    assert got2 == ref


def test_collective_rpc_and_apply_model(llm):
    [n_blocks] = llm.collective_rpc("determine_num_kv_blocks")
    assert n_blocks > 0
    [vocab] = llm.apply_model(lambda m: m.cfg.vocab_size)
    assert vocab == 512
