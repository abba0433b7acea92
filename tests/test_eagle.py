"""EAGLE speculative decoding: hidden-conditioned draft proposer.

Greedy exactness is the load-bearing invariant: whatever the draft
proposes, verification must reproduce the non-speculative greedy stream
token for token (reference guarantee of the rejection framework,
vllm/spec_decode/ + tests/spec_decode/e2e/test_eagle_correctness.py).
"""

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
    "rms_norm_eps": 1e-5,
    "max_position_embeddings": 512,
}


def _write_eagle_ckpt(d, *, style="eagle", vocab=512, h=128, inter=256,
                      with_lm_head=True):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(7)

    def w(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    cfg = dict(TINY, num_hidden_layers=1, vocab_size=vocab,
               hidden_size=h, intermediate_size=inter)
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    t = {
        "embed_tokens.weight": w(vocab, h),
        "layers.0.self_attn.q_proj.weight": w(h, h),
        "layers.0.self_attn.k_proj.weight": w(h, h),
        "layers.0.self_attn.v_proj.weight": w(h, h),
        "layers.0.self_attn.o_proj.weight": w(h, h),
        "layers.0.mlp.gate_proj.weight": w(inter, h),
        "layers.0.mlp.up_proj.weight": w(inter, h),
        "layers.0.mlp.down_proj.weight": w(h, inter),
        "layers.0.post_attention_layernorm.weight":
            np.ones(h, np.float32),
    }
    if style == "eagle":
        # EAGLE-1: no layers.0.input_layernorm, no final norm in ckpt
        t["fc.weight"] = w(h, 2 * h)
    else:
        t["layers.0.input_layernorm.weight"] = np.ones(h, np.float32)
        t["enorm.weight"] = np.ones(h, np.float32)
        t["hnorm.weight"] = np.ones(h, np.float32)
        t["shared_head.norm.weight"] = np.ones(h, np.float32)
        t["eh_proj.weight"] = w(h, 2 * h)
    if with_lm_head:
        t["lm_head.weight"] = w(vocab, h)
    save_file(t, str(d / "model.safetensors"))
    return str(d)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    td = tmp_path_factory.mktemp("eagle_target")
    with open(td / "config.json", "w") as f:
        json.dump(TINY, f)
    ed = tmp_path_factory.mktemp("eagle_draft")
    _write_eagle_ckpt(ed)
    md = tmp_path_factory.mktemp("mtp_draft")
    _write_eagle_ckpt(md, style="mtp")
    return str(td), str(ed), str(md)


def test_load_eagle_draft_structure(dirs):
    import jax.numpy as jnp
    from vllm_pq_tpu.spec_decode.eagle import load_eagle_draft
    _, ed, md = dirs
    model, params = load_eagle_draft(ed, "float32")
    assert model.needs_hidden_cond
    assert 0 in model.identity_input_norm_layers
    assert params["fc"]["weight"].shape == (256, 128)
    assert params["lm_head"]["weight"].shape == (128, 512)
    m2, p2 = load_eagle_draft(md, "float32", style="mtp")
    assert m2.style == "mtp"
    assert "enorm" in p2 and "head_norm" in p2
    assert not m2.identity_input_norm_layers
    assert p2["fc"]["weight"].dtype == jnp.float32


@pytest.mark.parametrize("method,draft_idx", [("eagle", 1),
                                              ("deepseek_mtp", 2)])
def test_e2e_eagle_greedy_exactness(dirs, method, draft_idx):
    from vllm_pq_tpu import LLM, SamplingParams
    target = dirs[0]
    draft = dirs[draft_idx]
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    prompts = [
        {"prompt_token_ids": [7, 8, 9, 10, 11]},
        {"prompt_token_ids": [3, 4, 5]},
        {"prompt_token_ids": [100, 101, 102, 103, 104, 105, 106]},
    ]
    kwargs = dict(model=target, load_format="dummy",
                  dtype="float32", max_model_len=128, max_num_seqs=8,
                  max_num_batched_tokens=128, block_size=16,
                  num_kv_blocks=64)
    base = LLM(**kwargs)
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    del base

    spec = LLM(speculative_method=method, speculative_model=draft,
               num_speculative_tokens=2, **kwargs)
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    stats = spec.llm_engine.engine_core.make_stats()
    assert got == ref
    assert stats["spec_tokens_proposed"] > 0


def test_e2e_eagle_multi_round(dirs):
    """Several scheduling rounds with ragged prompts + chunked prefill
    keep the draft mirror's flat-offset gather aligned."""
    from vllm_pq_tpu import LLM, SamplingParams
    target, ed, _ = dirs
    kwargs = dict(model=target, load_format="dummy",
                  dtype="float32", max_model_len=128, max_num_seqs=4,
                  max_num_batched_tokens=32, block_size=16,
                  num_kv_blocks=64)
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompts = [{"prompt_token_ids": list(range(10, 10 + n))}
               for n in (25, 3, 17, 40, 8)]
    base = LLM(**kwargs)
    ref = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    del base
    spec = LLM(speculative_method="eagle", speculative_model=ed,
               num_speculative_tokens=3, **kwargs)
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    assert got == ref
