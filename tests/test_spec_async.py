"""Speculative decoding composed WITH async (lag-1) scheduling:
in-graph proposers ride device-resolved sentinel drafts
(core/scheduler.py device_spec_k + the runner's prev_assumed position
correction). Output must stay token-exact vs the plain engine.
Reference role: V1 schedules spec tokens inside its normal loop
(vllm/v1/core/scheduler.py:194-203)."""

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
    base = tmp_path_factory.mktemp("spec_async")
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


def test_medusa_async_token_exact(dirs):
    from vllm_pq_tpu import LLM, SamplingParams
    model_dir, heads_dir = dirs
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    prompts = [{"prompt_token_ids": [5, 6, 7, 8, 9]},
               {"prompt_token_ids": [30, 31, 32]},
               {"prompt_token_ids": [100, 101, 102, 103]}]

    ref = LLM(model=model_dir, **KW)
    exp = [o.outputs[0].token_ids for o in ref.generate(prompts, sp)]
    del ref

    llm = LLM(model=model_dir, speculative_method="medusa",
              speculative_model=heads_dir, num_speculative_tokens=2,
              async_scheduling=True, **KW)
    eng = llm.llm_engine
    sched = eng.engine_core.scheduler
    assert sched.device_spec_k == 2  # composition actually enabled
    outs = llm.generate(prompts, sp)
    got = [o.outputs[0].token_ids for o in outs]
    assert got == exp, (got, exp)
    assert sched.spec_stats_proposed > 0
    # every request ends complete, no leaked placeholders
    for o in outs:
        assert len(o.outputs[0].token_ids) == 24
        assert -1 not in o.outputs[0].token_ids


def test_medusa_async_drafts_resolve_and_accept(tmp_path):
    """Positive control for the device-side sentinel resolution: a
    degenerate repeat-token model (zero o_proj/down_proj, tied lm_head)
    whose medusa head shares the embedding matrix proposes EXACTLY the
    model's next token — full acceptance proves the drafts crossing
    dispatches on device carry real values, not sentinels."""
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
        heads[f"{i}.{N_LAYERS}.weight"] = emb  # [V, H], same as lm
    save_file(heads, str(h / "medusa_lm_head.safetensors"))
    json.dump({"medusa_num_heads": N_HEADS,
               "medusa_num_layers": N_LAYERS},
              open(h / "config.json", "w"))

    kw = dict(KW)
    kw.pop("load_format")
    llm = LLM(model=str(m), speculative_method="medusa",
              speculative_model=str(h), num_speculative_tokens=2,
              async_scheduling=True, **kw)
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": [17, 23, 42]}], sp)
    toks = outs[0].outputs[0].token_ids
    # degenerate model repeats its last token
    assert toks == [42] * 20, toks
    sched = llm.llm_engine.engine_core.scheduler
    assert sched.spec_stats_proposed > 0
    # device-resolved drafts == the true next token: high acceptance
    assert sched.spec_stats_accepted >= \
        sched.spec_stats_proposed * 0.8, (
            sched.spec_stats_accepted, sched.spec_stats_proposed)


def test_medusa_async_varied_lengths(dirs):
    """Mixed max_tokens force park/un-park reconciliation at the caps
    (the optimistic advance parks early, finalize rolls back)."""
    from vllm_pq_tpu import LLM, SamplingParams
    model_dir, heads_dir = dirs
    prompts = [{"prompt_token_ids": [7, 8, 9]},
               {"prompt_token_ids": [40, 41, 42, 43]}]
    sps = [SamplingParams(temperature=0.0, max_tokens=5,
                          ignore_eos=True),
           SamplingParams(temperature=0.0, max_tokens=17,
                          ignore_eos=True)]

    ref = LLM(model=model_dir, **KW)
    exp = [o.outputs[0].token_ids for o in ref.generate(prompts, sps)]
    del ref

    llm = LLM(model=model_dir, speculative_method="medusa",
              speculative_model=heads_dir, num_speculative_tokens=2,
              async_scheduling=True, **KW)
    got = [o.outputs[0].token_ids
           for o in llm.generate(prompts, sps)]
    assert got == exp, (got, exp)
    assert [len(t) for t in got] == [5, 17]
