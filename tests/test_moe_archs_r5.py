"""Grok-1 and DeepSeek-v1 MoE rows: name mapping + layer-grid
structure + deterministic generation (no transformers classes exist for
these archs; the shared MoE math is HF-goldened in test_moe*.py)."""

import json

import numpy as np
import pytest

pytest.importorskip("torch")


def _gen(llm, prompt, n=6):
    from vllm_pq_tpu import SamplingParams
    return llm.generate(
        [{"prompt_token_ids": prompt}],
        SamplingParams(temperature=0.0, max_tokens=n,
                       ignore_eos=True))[0].outputs[0].token_ids


def test_grok1_loads_and_maps(tmp_path):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(9)
    h, heads, inner, L, vocab, E = 64, 4, 96, 2, 256, 4
    out = {"model.embed_tokens.weight":
           (rng.standard_normal((vocab, h)) * 0.05).astype(np.float32),
           "model.norm.weight": np.ones(h, np.float32)}
    gate_ref = None
    for li in range(L):
        o = f"model.layers.{li}."
        for p in ("q_proj", "k_proj", "v_proj", "o_proj"):
            out[o + f"attn.{p}.weight"] = \
                (rng.standard_normal((h, h)) * 0.05).astype(np.float32)
        gw = (rng.standard_normal((E, h)) * 0.05).astype(np.float32)
        if li == 0:
            gate_ref = gw
        out[o + "moe_block.gate.weight"] = gw
        for e in range(E):
            out[o + f"moe_block.experts.{e}.linear.weight"] = \
                (rng.standard_normal((inner, h)) * 0.05).astype(
                    np.float32)
            out[o + f"moe_block.experts.{e}.linear_v.weight"] = \
                (rng.standard_normal((inner, h)) * 0.05).astype(
                    np.float32)
            out[o + f"moe_block.experts.{e}.linear_1.weight"] = \
                (rng.standard_normal((h, inner)) * 0.05).astype(
                    np.float32)
        for n in ("pre_attn_norm", "post_attn_norm", "pre_moe_norm",
                  "post_moe_norm"):
            out[o + n + ".weight"] = np.ones(h, np.float32)
    d = tmp_path / "grok1"
    d.mkdir()
    save_file(out, str(d / "model.safetensors"))
    json.dump({"architectures": ["Grok1ModelForCausalLM"],
               "model_type": "grok-1",
               "vocab_size": vocab, "hidden_size": h,
               "intermediate_size": inner, "num_hidden_layers": L,
               "num_attention_heads": heads, "num_key_value_heads": heads,
               "num_experts": E, "num_experts_per_tok": 2,
               "max_position_embeddings": 256, "rms_norm_eps": 1e-5,
               "embedding_multiplier_scale": 2.0,
               "attn_output_multiplier": 0.5,
               "output_multiplier_scale": 0.25,
               "tie_word_embeddings": True},
              open(d / "config.json", "w"))

    from vllm_pq_tpu import LLM
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    import jax
    params = jax.device_get(llm.llm_engine.engine_core.runner.params)
    L0 = params["layers"][0]
    np.testing.assert_allclose(L0["moe"]["router"]["weight"],
                               gate_ref.T, rtol=1e-6)
    assert L0["moe"]["experts"]["w1"].shape == (4, h, inner)
    assert "pre_feedforward_layernorm" in L0
    got = _gen(llm, [4, 9, 2, 77])
    got2 = _gen(llm, [4, 9, 2, 77])
    assert got == got2 and len(got) == 6


def test_arctic_loads_and_maps(tmp_path):
    """Arctic: alternating dense / residual-MoE layers, merged w13
    splits, parallel-branch decoder."""
    from safetensors.numpy import save_file
    rng = np.random.default_rng(11)
    h, heads, inner, vocab, E = 64, 4, 96, 256, 4
    L = 2  # layer 0 dense, layer 1 residual-MoE (freq 2)
    out = {"model.embed_tokens.weight":
           (rng.standard_normal((vocab, h)) * 0.05).astype(np.float32),
           "model.norm.weight": np.ones(h, np.float32),
           "lm_head.weight":
           (rng.standard_normal((vocab, h)) * 0.05).astype(np.float32)}
    w13_ref = None
    for li in range(L):
        o = f"model.layers.{li}."
        for p in ("q_proj", "k_proj", "v_proj", "o_proj"):
            out[o + f"self_attn.{p}.weight"] = \
                (rng.standard_normal((h, h)) * 0.05).astype(np.float32)
        out[o + "input_layernorm.weight"] = np.ones(h, np.float32)
        out[o + "post_attention_layernorm.weight"] = \
            np.ones(h, np.float32)
        if li == 0:  # dense layer: block_sparse_moe.mlp
            out[o + "block_sparse_moe.mlp.w13.weight"] = \
                (rng.standard_normal((2 * inner, h)) * 0.05).astype(
                    np.float32)
            out[o + "block_sparse_moe.mlp.w2.weight"] = \
                (rng.standard_normal((h, inner)) * 0.05).astype(
                    np.float32)
        else:
            out[o + "block_sparse_moe.gate.weight"] = \
                (rng.standard_normal((E, h)) * 0.05).astype(np.float32)
            for e in range(E):
                out[o + f"block_sparse_moe.experts.{e}.w1.weight"] = \
                    (rng.standard_normal((inner, h)) * 0.05).astype(
                        np.float32)
                out[o + f"block_sparse_moe.experts.{e}.w3.weight"] = \
                    (rng.standard_normal((inner, h)) * 0.05).astype(
                        np.float32)
                out[o + f"block_sparse_moe.experts.{e}.w2.weight"] = \
                    (rng.standard_normal((h, inner)) * 0.05).astype(
                        np.float32)
            w13 = (rng.standard_normal((2 * h, h)) * 0.05).astype(
                np.float32)
            w13_ref = w13
            out[o + "residual_mlp.w13.weight"] = w13
            out[o + "residual_mlp.w2.weight"] = \
                (rng.standard_normal((h, h)) * 0.05).astype(np.float32)
            out[o + "residual_layernorm.weight"] = np.ones(h, np.float32)
    d = tmp_path / "arctic"
    d.mkdir()
    save_file(out, str(d / "model.safetensors"))
    json.dump({"architectures": ["ArcticForCausalLM"],
               "model_type": "arctic",
               "vocab_size": vocab, "hidden_size": h,
               "intermediate_size": inner, "num_hidden_layers": L,
               "num_attention_heads": heads, "num_key_value_heads": heads,
               "num_local_experts": E, "num_experts_per_tok": 2,
               "moe_layer_frequency": 2, "use_residual": True,
               "max_position_embeddings": 256, "rms_norm_eps": 1e-5,
               "tie_word_embeddings": False},
              open(d / "config.json", "w"))

    from vllm_pq_tpu import LLM
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    import jax
    params = jax.device_get(llm.llm_engine.engine_core.runner.params)
    assert "gate_proj" in params["layers"][0]          # dense layer
    assert "moe" in params["layers"][1]                # moe layer
    np.testing.assert_allclose(
        params["layers"][1]["residual_gate_proj"]["weight"],
        w13_ref[:h].T, rtol=1e-6)
    got = _gen(llm, [4, 9, 2])
    got2 = _gen(llm, [4, 9, 2])
    assert got == got2 and len(got) == 6


def test_minicpm3_mla_builds_and_generates(tmp_path):
    """MiniCPM3: MLA attention with all-dense MLPs + muP scalings
    (dummy weights; MLA math is HF-goldened in test_deepseek.py)."""
    json_cfg = {"architectures": ["MiniCPM3ForCausalLM"],
                "model_type": "minicpm3",
                "vocab_size": 256, "hidden_size": 64,
                "intermediate_size": 128, "num_hidden_layers": 2,
                "num_attention_heads": 4,
                "q_lora_rank": 32, "kv_lora_rank": 32,
                "qk_nope_head_dim": 16, "qk_rope_head_dim": 16,
                "v_head_dim": 16,
                "scale_emb": 12.0, "scale_depth": 1.4,
                "dim_model_base": 32,
                "max_position_embeddings": 256, "rms_norm_eps": 1e-5,
                "tie_word_embeddings": False}
    d = tmp_path / "minicpm3"
    d.mkdir()
    json.dump(json_cfg, open(d / "config.json", "w"))
    from vllm_pq_tpu import LLM
    llm = LLM(model=str(d), load_format="dummy", dtype="float32",
              max_model_len=128, max_num_seqs=2,
              max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    model = llm.llm_engine.engine_core.runner.model
    assert model.cfg.q_lora_rank == 32
    assert abs(model.cfg.residual_multiplier - 1.4 / np.sqrt(2)) < 1e-6
    assert abs(model.cfg.logit_scale - 0.5) < 1e-9
    got = _gen(llm, [4, 9, 2])
    got2 = _gen(llm, [4, 9, 2])
    assert got == got2 and len(got) == 6


def test_deepseek_v1_layer_grid_and_names(tmp_path):
    """first_k_dense_replace dense layers, plural shared_experts names,
    ungated shared expert."""
    from safetensors.numpy import save_file
    rng = np.random.default_rng(10)
    h, heads, inner, moe_i, L, vocab, E = 64, 4, 96, 32, 3, 256, 4
    out = {"model.embed_tokens.weight":
           (rng.standard_normal((vocab, h)) * 0.05).astype(np.float32),
           "model.norm.weight": np.ones(h, np.float32),
           "lm_head.weight":
           (rng.standard_normal((vocab, h)) * 0.05).astype(np.float32)}
    for li in range(L):
        o = f"model.layers.{li}."
        for p in ("q_proj", "k_proj", "v_proj", "o_proj"):
            out[o + f"self_attn.{p}.weight"] = \
                (rng.standard_normal((h, h)) * 0.05).astype(np.float32)
        if li == 0:  # first_k_dense_replace=1: dense mlp
            for p, shp in (("gate_proj", (inner, h)),
                           ("up_proj", (inner, h)),
                           ("down_proj", (h, inner))):
                out[o + f"mlp.{p}.weight"] = \
                    (rng.standard_normal(shp) * 0.05).astype(np.float32)
        else:
            out[o + "mlp.gate.weight"] = \
                (rng.standard_normal((E, h)) * 0.05).astype(np.float32)
            for e in range(E):
                for p, shp in (("gate_proj", (moe_i, h)),
                               ("up_proj", (moe_i, h)),
                               ("down_proj", (h, moe_i))):
                    out[o + f"mlp.experts.{e}.{p}.weight"] = \
                        (rng.standard_normal(shp) * 0.05).astype(
                            np.float32)
            for p, shp in (("gate_proj", (2 * moe_i, h)),
                           ("up_proj", (2 * moe_i, h)),
                           ("down_proj", (h, 2 * moe_i))):
                out[o + f"mlp.shared_experts.{p}.weight"] = \
                    (rng.standard_normal(shp) * 0.05).astype(np.float32)
        out[o + "input_layernorm.weight"] = np.ones(h, np.float32)
        out[o + "post_attention_layernorm.weight"] = \
            np.ones(h, np.float32)
    d = tmp_path / "dsv1"
    d.mkdir()
    save_file(out, str(d / "model.safetensors"))
    json.dump({"architectures": ["DeepseekForCausalLM"],
               "model_type": "deepseek",
               "vocab_size": vocab, "hidden_size": h,
               "intermediate_size": inner,
               "moe_intermediate_size": moe_i,
               "num_hidden_layers": L, "num_attention_heads": heads,
               "num_key_value_heads": heads,
               "n_routed_experts": E, "num_experts_per_tok": 2,
               "n_shared_experts": 2, "first_k_dense_replace": 1,
               "moe_layer_freq": 1, "norm_topk_prob": False,
               "max_position_embeddings": 256, "rms_norm_eps": 1e-5,
               "tie_word_embeddings": False},
              open(d / "config.json", "w"))

    from vllm_pq_tpu import LLM
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    model = llm.llm_engine.engine_core.runner.model
    assert not model.is_sparse(0) and model.is_sparse(1)
    assert model.cfg.shared_expert_gate is False
    got = _gen(llm, [4, 9, 2])
    got2 = _gen(llm, [4, 9, 2])
    assert got == got2 and len(got) == 6
