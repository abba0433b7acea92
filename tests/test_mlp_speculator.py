"""MLP-speculator draft heads (spec_decode/mlp_speculator.py, role of
reference models/mlp_speculator.py): recurrent (hidden, token)-
conditioned in-graph proposals; greedy verification keeps output
token-exact regardless of head quality."""

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

N_PREDICT = 3


def _write_spec_ckpt(d, hidden, vocab, seed=0):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(seed)
    tensors = {}
    for i in range(N_PREDICT):
        tensors[f"emb.{i}.weight"] = (
            rng.standard_normal((vocab, hidden)).astype(np.float32) * 0.1)
        tensors[f"proj.{i}.weight"] = (
            rng.standard_normal((hidden, hidden)).astype(np.float32)
            * 0.05)
        tensors[f"head.{i}.weight"] = (
            rng.standard_normal((vocab, hidden)).astype(np.float32) * 0.1)
        tensors[f"ln.{i}.weight"] = np.ones(hidden, np.float32)
        tensors[f"ln.{i}.bias"] = np.zeros(hidden, np.float32)
    save_file(tensors, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({"n_predict": N_PREDICT, "emb_dim": hidden,
                   "inner_dim": hidden, "vocab_size": vocab,
                   "tie_weights": False, "scale_input": True}, f)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("mlpspec")
    m = base / "model"
    m.mkdir()
    with open(m / "config.json", "w") as f:
        json.dump(TINY, f)
    h = base / "spec"
    h.mkdir()
    _write_spec_ckpt(h, TINY["hidden_size"], TINY["vocab_size"])
    return str(m), str(h)


KW = dict(load_format="dummy", dtype="float32", max_model_len=128,
          max_num_seqs=8, max_num_batched_tokens=128, block_size=16,
          num_kv_blocks=64)


def test_mlp_speculator_loader_shapes(dirs):
    import jax.numpy as jnp

    from vllm_pq_tpu.spec_decode.mlp_speculator import (
        load_mlp_speculator, mlp_spec_drafts)
    _, spec_dir = dirs
    spec, n = load_mlp_speculator(spec_dir, jnp.float32)
    assert n == N_PREDICT and len(spec["heads"]) == N_PREDICT
    h = jnp.ones((4, TINY["hidden_size"]), jnp.float32)
    tok = jnp.asarray([1, 2, 3, 4], jnp.int32)
    d = mlp_spec_drafts(spec, h, tok)
    assert d.shape == (4, N_PREDICT)
    # recurrent: different last tokens give different first drafts
    d2 = mlp_spec_drafts(spec, h, jnp.asarray([5, 6, 7, 8], jnp.int32))
    assert not np.array_equal(np.asarray(d), np.asarray(d2))


def test_mlp_speculator_token_exact_and_proposes(dirs):
    from vllm_pq_tpu import LLM, SamplingParams
    model_dir, spec_dir = dirs
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    prompts = [{"prompt_token_ids": [5, 6, 7, 8, 9]},
               {"prompt_token_ids": [30, 31, 32]}]

    ref = LLM(model=model_dir, **KW)
    exp = [o.outputs[0].token_ids for o in ref.generate(prompts, sp)]
    del ref

    llm = LLM(model=model_dir, speculative_method="mlp_speculator",
              speculative_model=spec_dir, num_speculative_tokens=2,
              **KW)
    outs = llm.generate(prompts, sp)
    got = [o.outputs[0].token_ids for o in outs]
    assert got == exp
    sched = llm.llm_engine.engine_core.scheduler
    assert sched.spec_stats_proposed > 0
