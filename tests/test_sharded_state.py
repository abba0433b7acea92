"""Sharded-state save/load (reference ShardedStateLoader +
save_sharded_state example): restored engine must produce identical
outputs without re-quantizing/re-sharding."""

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

KW = dict(dtype="float32", max_model_len=128, max_num_seqs=8,
          max_num_batched_tokens=128, block_size=16, num_kv_blocks=64)


def test_sharded_state_roundtrip(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d = tmp_path / "m"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    prompts = [{"prompt_token_ids": [7, 8, 9, 10]}]

    llm = LLM(model=str(d), load_format="dummy", quantization="pq", **KW)
    ref = llm.generate(prompts, sp)[0].outputs[0].token_ids
    out_dir = str(tmp_path / "saved")
    llm.save_sharded_state(out_dir)
    del llm

    llm2 = LLM(model=out_dir, load_format="sharded_state",
               quantization="pq", **KW)
    got = llm2.generate(prompts, sp)[0].outputs[0].token_ids
    assert got == ref
