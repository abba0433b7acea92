"""Medusa draft heads (spec_decode/medusa.py, role of reference
models/medusa.py:37): in-graph hidden-state-conditioned proposals,
verified by the rejection sampler — output must stay token-exact."""

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

N_HEADS, N_LAYERS = 3, 1


def _write_medusa_ckpt(d, hidden, vocab, seed=0):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(seed)
    tensors = {}
    for i in range(N_HEADS):
        for j in range(N_LAYERS):
            # near-zero resblock: head output ~= lm(h)
            tensors[f"{i}.{j}.linear.weight"] = (
                rng.standard_normal((hidden, hidden)).astype(np.float32)
                * 0.01)
            tensors[f"{i}.{j}.linear.bias"] = np.zeros(hidden, np.float32)
        tensors[f"{i}.{N_LAYERS}.weight"] = (
            rng.standard_normal((vocab, hidden)).astype(np.float32) * 0.1)
    save_file(tensors, str(d / "medusa_lm_head.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({"medusa_num_heads": N_HEADS,
                   "medusa_num_layers": N_LAYERS}, f)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("medusa")
    m = base / "model"
    m.mkdir()
    with open(m / "config.json", "w") as f:
        json.dump(TINY, f)
    h = base / "heads"
    h.mkdir()
    _write_medusa_ckpt(h, TINY["hidden_size"], TINY["vocab_size"])
    return str(m), str(h)


KW = dict(load_format="dummy", dtype="float32", max_model_len=128,
          max_num_seqs=8, max_num_batched_tokens=128, block_size=16,
          num_kv_blocks=64)


def test_medusa_loader_shapes(dirs):
    import jax.numpy as jnp

    from vllm_pq_tpu.spec_decode.medusa import (load_medusa_heads,
                                                medusa_drafts)
    _, heads_dir = dirs
    heads, n = load_medusa_heads(heads_dir, jnp.float32)
    assert n == N_HEADS and len(heads) == N_HEADS
    h = jnp.ones((4, TINY["hidden_size"]), jnp.float32)
    d = medusa_drafts(heads, h)
    assert d.shape == (4, N_HEADS)


def test_medusa_token_exact_and_proposes(dirs):
    from vllm_pq_tpu import LLM, SamplingParams
    model_dir, heads_dir = dirs
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    prompts = [{"prompt_token_ids": [5, 6, 7, 8, 9]},
               {"prompt_token_ids": [30, 31, 32]}]

    ref = LLM(model=model_dir, **KW)
    exp = [o.outputs[0].token_ids for o in ref.generate(prompts, sp)]
    del ref

    llm = LLM(model=model_dir, speculative_method="medusa",
              speculative_model=heads_dir, num_speculative_tokens=2,
              **KW)
    outs = llm.generate(prompts, sp)
    got = [o.outputs[0].token_ids for o in outs]
    assert got == exp
    sched = llm.llm_engine.engine_core.scheduler
    # heads are random, so acceptance is ~0, but proposals must flow
    assert sched.spec_stats_proposed > 0


def test_medusa_requires_model_path():
    from vllm_pq_tpu.config import SpeculativeConfig
    with pytest.raises(ValueError):
        SpeculativeConfig(method="medusa", num_spec_tokens=2)
