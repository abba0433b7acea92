"""Per-request logits processors (reference sampling_params.py
logits_processors): host callables applied to the full logits row, with
the token re-sampled on host and overriding the in-graph sample."""

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


@pytest.fixture(scope="module", params=[False, True],
                ids=["sync", "async"])
def llm(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"tiny_lp_{request.param}")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    from vllm_pq_tpu import LLM
    return LLM(model=str(d), load_format="dummy", dtype="float32",
               max_model_len=128, max_num_seqs=4,
               max_num_batched_tokens=128, block_size=16,
               num_kv_blocks=64, async_scheduling=request.param)


def test_force_token_processor(llm):
    from vllm_pq_tpu import SamplingParams

    def force_7(output_ids, logits):
        logits[:] = -1e9
        logits[7] = 0.0
        return logits

    out = llm.generate(
        [{"prompt_token_ids": [5, 6, 7, 8]}],
        SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                       logits_processors=[force_7]))
    assert out[0].outputs[0].token_ids == [7, 7, 7, 7, 7]


def test_three_arg_processor_sees_prompt(llm):
    from vllm_pq_tpu import SamplingParams
    seen = {}

    def proc(prompt_ids, output_ids, logits):
        seen["prompt"] = list(prompt_ids)
        seen["n_out"] = len(output_ids)
        logits[:] = -1e9
        logits[9] = 0.0
        return logits

    out = llm.generate(
        [{"prompt_token_ids": [5, 6, 7]}],
        SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True,
                       logits_processors=[proc]))
    assert out[0].outputs[0].token_ids == [9, 9, 9]
    assert seen["prompt"] == [5, 6, 7]
    assert seen["n_out"] == 2  # last call saw two prior outputs


def test_mixed_batch_unaffected(llm):
    from vllm_pq_tpu import SamplingParams
    plain = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    base = llm.generate([{"prompt_token_ids": [5, 6, 7, 8]}],
                        plain)[0].outputs[0].token_ids

    def force_3(output_ids, logits):
        logits[:] = -1e9
        logits[3] = 0.0
        return logits

    outs = llm.generate(
        [{"prompt_token_ids": [5, 6, 7, 8]},
         {"prompt_token_ids": [5, 6, 7, 8]}],
        [plain,
         SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        logits_processors=[force_3])])
    assert outs[0].outputs[0].token_ids == base
    assert outs[1].outputs[0].token_ids == [3, 3, 3, 3, 3, 3]


def test_stateful_cycling_processor(llm):
    from vllm_pq_tpu import SamplingParams

    def cycle(output_ids, logits):
        target = 10 + (len(output_ids) % 3)
        logits[:] = -1e9
        logits[target] = 0.0
        return logits

    out = llm.generate(
        [{"prompt_token_ids": [5, 6]}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                       logits_processors=[cycle]))
    assert out[0].outputs[0].token_ids == [10, 11, 12, 10, 11, 12]
