"""Chameleon (HF golden) and JAIS (synthetic checkpoint) text archs."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_chameleon_matches_hf(tmp_path):
    """Chameleon: llama + per-head non-affine-LN qk-norm with learned
    per-head scale/bias (reference models/chameleon.py)."""
    from transformers import (ChameleonConfig,
                              ChameleonForConditionalGeneration)
    torch.manual_seed(0)
    cfg = ChameleonConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=256,
        model_vocab_size=256, tie_word_embeddings=False,
        vq_config=dict(embed_dim=32, num_embeddings=16,
                       latent_channels=32, resolution=16,
                       in_channels=3, base_channels=32,
                       channel_multiplier=[1, 1]),
        vocabulary_map={"<image>": 255})
    hf = ChameleonForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "chameleon"
    hf.save_pretrained(d, safe_serialization=True)

    from vllm_pq_tpu import LLM, SamplingParams
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(7)
    for trial in range(2):
        prompt = rng.integers(5, 250, 7).tolist()
        with torch.no_grad():
            out = hf.generate(torch.tensor([prompt]), max_new_tokens=8,
                              do_sample=False, num_beams=1,
                              pad_token_id=0)
        exp = out[0, len(prompt):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (trial, got, exp)


def test_jais_loads_and_maps(tmp_path):
    """JAIS: GPT-2 Conv1D tree with ALiBi + SwiGLU + muP scalings. The
    c_attn column split is checked against the loaded tree; generation
    is deterministic."""
    from safetensors.numpy import save_file
    rng = np.random.default_rng(8)
    h, heads, inner, L, vocab = 64, 4, 96, 2, 256
    out = {"transformer.wte.weight":
           (rng.standard_normal((vocab, h)) * 0.05).astype(np.float32),
           "transformer.ln_f.weight": np.ones(h, np.float32),
           "transformer.ln_f.bias": np.zeros(h, np.float32)}
    c_attn_ref = None
    for li in range(L):
        o = f"transformer.h.{li}."
        ca = (rng.standard_normal((h, 3 * h)) * 0.05).astype(np.float32)
        if li == 0:
            c_attn_ref = ca
        out[o + "attn.c_attn.weight"] = ca
        out[o + "attn.c_attn.bias"] = \
            (rng.standard_normal(3 * h) * 0.02).astype(np.float32)
        out[o + "attn.c_proj.weight"] = \
            (rng.standard_normal((h, h)) * 0.05).astype(np.float32)
        out[o + "attn.c_proj.bias"] = \
            (rng.standard_normal(h) * 0.02).astype(np.float32)
        out[o + "mlp.c_fc.weight"] = \
            (rng.standard_normal((h, inner)) * 0.05).astype(np.float32)
        out[o + "mlp.c_fc.bias"] = \
            (rng.standard_normal(inner) * 0.02).astype(np.float32)
        out[o + "mlp.c_fc2.weight"] = \
            (rng.standard_normal((h, inner)) * 0.05).astype(np.float32)
        out[o + "mlp.c_fc2.bias"] = \
            (rng.standard_normal(inner) * 0.02).astype(np.float32)
        out[o + "mlp.c_proj.weight"] = \
            (rng.standard_normal((inner, h)) * 0.05).astype(np.float32)
        out[o + "mlp.c_proj.bias"] = \
            (rng.standard_normal(h) * 0.02).astype(np.float32)
        out[o + "ln_1.weight"] = np.ones(h, np.float32)
        out[o + "ln_1.bias"] = np.zeros(h, np.float32)
        out[o + "ln_2.weight"] = np.ones(h, np.float32)
        out[o + "ln_2.bias"] = np.zeros(h, np.float32)
    d = tmp_path / "jais"
    d.mkdir()
    save_file(out, str(d / "model.safetensors"))
    json.dump({"architectures": ["JAISLMHeadModel"],
               "model_type": "jais",
               "vocab_size": vocab, "n_embd": h, "n_layer": L,
               "n_head": heads, "n_inner": inner, "n_positions": 256,
               "activation_function": "swiglu",
               "position_embedding_type": "alibi",
               "layer_norm_epsilon": 1e-5,
               "mup_embeddings_scale": 9.1705785388303,
               "mup_output_alpha": 1.09518349815769,
               "mup_width_scale": 0.0390625,
               "mup_scale_qk_dot_by_d": True},
              open(d / "config.json", "w"))

    from vllm_pq_tpu import LLM, SamplingParams
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    import jax
    params = jax.device_get(llm.llm_engine.engine_core.runner.params)
    np.testing.assert_allclose(
        params["layers"][0]["q_proj"]["weight"], c_attn_ref[:, :h],
        rtol=1e-6)
    np.testing.assert_allclose(
        params["layers"][0]["v_proj"]["weight"], c_attn_ref[:, 2 * h:],
        rtol=1e-6)
    got = llm.generate(
        [{"prompt_token_ids": [4, 9, 2, 77]}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0].outputs[0].token_ids
    got2 = llm.generate(
        [{"prompt_token_ids": [4, 9, 2, 77]}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == got2 and len(got) == 6
