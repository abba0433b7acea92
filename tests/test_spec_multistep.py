"""Speculative decoding composed WITH multi-step decode windows
(VERDICT r4 missing #5): in-graph medusa / mlp_speculator proposers
draft inside the window body, the target verifies K+1 tokens per
iteration in one multi-query forward (ops/window_attention.py::
window_attention_spec), and the fold scatters only accepted entries.

Reference analog: spec tokens scheduled through the one V1 loop
(vllm/v1/core/sched/scheduler.py:194-203)."""

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

KW = dict(load_format="dummy", dtype="float32", max_model_len=128,
          max_num_seqs=8, max_num_batched_tokens=128, block_size=16,
          num_kv_blocks=64)


def _write_medusa_ckpt(d, hidden, vocab, seed=0):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(seed)
    tensors = {}
    for i in range(N_HEADS):
        for j in range(N_LAYERS):
            tensors[f"{i}.{j}.linear.weight"] = (
                rng.standard_normal((hidden, hidden)).astype(np.float32)
                * 0.01)
            tensors[f"{i}.{j}.linear.bias"] = np.zeros(hidden,
                                                       np.float32)
        tensors[f"{i}.{N_LAYERS}.weight"] = (
            rng.standard_normal((vocab, hidden)).astype(np.float32)
            * 0.1)
    save_file(tensors, str(d / "medusa_lm_head.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({"medusa_num_heads": N_HEADS,
                   "medusa_num_layers": N_LAYERS}, f)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("specwin")
    m = base / "model"
    m.mkdir()
    with open(m / "config.json", "w") as f:
        json.dump(TINY, f)
    h = base / "heads"
    h.mkdir()
    _write_medusa_ckpt(h, TINY["hidden_size"], TINY["vocab_size"])
    return str(m), str(h)


def test_spec_window_token_exact(dirs):
    """Random heads (acceptance ~0): the composed spec window must stay
    greedily token-exact against the plain engine."""
    from vllm_pq_tpu import LLM, SamplingParams
    model_dir, heads_dir = dirs
    sp = SamplingParams(temperature=0.0, max_tokens=21, ignore_eos=True)
    prompts = [{"prompt_token_ids": [5, 6, 7, 8, 9]},
               {"prompt_token_ids": [30, 31, 32]},
               {"prompt_token_ids": [100, 101, 102, 103, 104, 105]}]

    ref = LLM(model=model_dir, **KW)
    exp = [o.outputs[0].token_ids for o in ref.generate(prompts, sp)]
    del ref

    llm = LLM(model=model_dir, speculative_method="medusa",
              speculative_model=heads_dir, num_speculative_tokens=2,
              num_scheduler_steps=4, **KW)
    got = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]
    assert got == exp
    sched = llm.llm_engine.engine_core.scheduler
    assert sched.window_spec_k == 2
    # windows ran with speculation on (stats only accrue on the
    # spec-window update path)
    assert sched.spec_stats_proposed > 0


def test_spec_window_accepts_and_advances(tmp_path):
    """Positive control: degenerate repeat-token model + tied medusa
    head — drafts match the model exactly, so windows must advance
    multiple positions per iteration with correct output."""
    from safetensors.numpy import save_file

    from vllm_pq_tpu import LLM, SamplingParams
    rng = np.random.default_rng(3)
    V, H, L = 512, 128, 2
    cfg = dict(TINY)
    cfg["tie_word_embeddings"] = True
    m = tmp_path / "model"
    m.mkdir()
    json.dump(cfg, open(m / "config.json", "w"))
    emb = rng.standard_normal((V, H)).astype(np.float32)
    t = {"model.embed_tokens.weight": emb,
         "model.norm.weight": np.ones(H, np.float32)}
    for li in range(L):
        p = f"model.layers.{li}."
        t[p + "self_attn.q_proj.weight"] = (
            rng.standard_normal((H, H)).astype(np.float32) * 0.02)
        t[p + "self_attn.k_proj.weight"] = (
            rng.standard_normal((H, H)).astype(np.float32) * 0.02)
        t[p + "self_attn.v_proj.weight"] = (
            rng.standard_normal((H, H)).astype(np.float32) * 0.02)
        t[p + "self_attn.o_proj.weight"] = np.zeros((H, H), np.float32)
        t[p + "mlp.gate_proj.weight"] = (
            rng.standard_normal((256, H)).astype(np.float32) * 0.02)
        t[p + "mlp.up_proj.weight"] = (
            rng.standard_normal((256, H)).astype(np.float32) * 0.02)
        t[p + "mlp.down_proj.weight"] = np.zeros((H, 256), np.float32)
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(H,
                                                           np.float32)
    save_file(t, str(m / "model.safetensors"))

    h = tmp_path / "heads"
    h.mkdir()
    heads = {}
    for i in range(N_HEADS):
        for j in range(N_LAYERS):
            heads[f"{i}.{j}.linear.weight"] = np.zeros((H, H),
                                                       np.float32)
            heads[f"{i}.{j}.linear.bias"] = np.zeros(H, np.float32)
        heads[f"{i}.{N_LAYERS}.weight"] = emb
    save_file(heads, str(h / "medusa_lm_head.safetensors"))
    json.dump({"medusa_num_heads": N_HEADS,
               "medusa_num_layers": N_LAYERS},
              open(h / "config.json", "w"))

    kw = dict(KW)
    kw.pop("load_format")
    llm = LLM(model=str(m), speculative_method="medusa",
              speculative_model=str(h), num_speculative_tokens=2,
              num_scheduler_steps=4, **kw)
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": [17, 23, 42]},
                         {"prompt_token_ids": [9, 11]}], sp)
    toks = [o.outputs[0].token_ids for o in outs]
    assert toks[0] == [42] * 24, toks[0]
    assert toks[1] == [11] * 24, toks[1]
    sched = llm.llm_engine.engine_core.scheduler
    assert sched.spec_stats_proposed > 0
    assert sched.spec_stats_accepted >= \
        sched.spec_stats_proposed * 0.6, (
            sched.spec_stats_accepted, sched.spec_stats_proposed)


def test_spec_window_sliding_window_model(tmp_path, dirs):
    """Sliding-window attention composes: the spec window's per-entry
    position masks must respect the layer window."""
    from vllm_pq_tpu import LLM, SamplingParams
    _, heads_dir = dirs
    cfg = dict(TINY)
    cfg["sliding_window"] = 24
    m = tmp_path / "swmodel"
    m.mkdir()
    json.dump(cfg, open(m / "config.json", "w"))
    sp = SamplingParams(temperature=0.0, max_tokens=21, ignore_eos=True)
    prompts = [{"prompt_token_ids": [7, 8, 9, 10, 11]},
               {"prompt_token_ids": [3, 4, 5]}]
    ref = LLM(model=str(m), **KW)
    exp = [o.outputs[0].token_ids for o in ref.generate(prompts, sp)]
    del ref
    llm = LLM(model=str(m), speculative_method="medusa",
              speculative_model=heads_dir, num_speculative_tokens=2,
              num_scheduler_steps=4, **KW)
    got = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]
    assert got == exp


def test_spec_window_prefix_caching(dirs):
    """Prefix caching on: over-allocated window slots and the
    device-computed fold must keep the block pool consistent."""
    from vllm_pq_tpu import LLM, SamplingParams
    model_dir, heads_dir = dirs
    kw = dict(KW)
    kw["enable_prefix_caching"] = True
    llm = LLM(model=model_dir, speculative_method="medusa",
              speculative_model=heads_dir, num_speculative_tokens=2,
              num_scheduler_steps=4, **kw)
    sp = SamplingParams(temperature=0.0, max_tokens=18, ignore_eos=True)
    shared = list(range(40, 60))
    prompts = [{"prompt_token_ids": shared + [7]},
               {"prompt_token_ids": shared + [9]}]
    outs1 = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]
    outs2 = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]
    assert outs1 == outs2
    pool = llm.llm_engine.engine_core.scheduler \
        .kv_cache_manager.block_pool
    # cached blocks stay allocated by design; nothing leaks beyond them
    assert pool.get_num_free_blocks() > 0


def test_spec_window_sampled_smoke(dirs):
    """Non-greedy rows go through rejection sampling inside the window;
    streams differ from single-step (drafts change the accept path) but
    generation must complete with the right counts."""
    from vllm_pq_tpu import LLM, SamplingParams
    model_dir, heads_dir = dirs
    llm = LLM(model=model_dir, speculative_method="medusa",
              speculative_model=heads_dir, num_speculative_tokens=2,
              num_scheduler_steps=4, **KW)
    sp = SamplingParams(temperature=0.9, seed=7, max_tokens=16,
                        ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": [1, 2, 3, 4]}], sp)
    assert len(outs[0].outputs[0].token_ids) == 16
