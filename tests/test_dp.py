"""Data-parallel router: replicas on disjoint device slices, identical
outputs to dp=1, load balancing (role of reference
examples/offline_inference/data_parallel.py semantics)."""

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


def test_dp2_matches_dp1(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d = tmp_path / "m"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    prompts = [{"prompt_token_ids": [7, 8, 9, 10]},
               {"prompt_token_ids": [3, 4, 5]},
               {"prompt_token_ids": [100, 101]},
               {"prompt_token_ids": [42, 43, 44, 45]}]
    ref = [o.outputs[0].token_ids
           for o in LLM(model=str(d), **KW).generate(prompts, sp)]

    llm = LLM(model=str(d), data_parallel_size=2, **KW)
    got = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]
    assert got == ref

    # both replicas must own disjoint device slices and see traffic
    eng = llm.llm_engine
    meshes = [e.engine_core.worker.mesh for e in eng.engines]
    devs0 = {d.id for d in meshes[0].devices.flatten()}
    devs1 = {d.id for d in meshes[1].devices.flatten()}
    assert devs0.isdisjoint(devs1)
    stats = eng.get_stats()
    assert stats["num_replicas"] == 2
