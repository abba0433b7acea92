"""Round-5 registry batch: Solar bskcn, TeleChat2, fairseq2-llama,
Qwen v1, and the TransformersModel fallback row.

Strategy: most of these archs have no transformers class (trust_remote_
code), so equivalence is proven by TRANSCODING — the same underlying
weights saved in the family's published layout must generate token-
identically to the plain llama/qwen2-format run (this exercises the
name mapping, fused-weight splitting, and rotary de-interleaving
exactly)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _mk_llama_ckpt(d, seed=0, **cfg_over):
    """Tiny standard-llama checkpoint via transformers."""
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=4, max_position_embeddings=256,
               rms_norm_eps=1e-5, tie_word_embeddings=False)
    cfg.update(cfg_over)
    torch.manual_seed(seed)
    hf = LlamaForCausalLM(LlamaConfig(**cfg)).eval().float()
    d.mkdir(parents=True, exist_ok=True)
    hf.save_pretrained(d, safe_serialization=True)
    return hf, cfg


def _gen(d, prompt, n=8, **kw):
    from vllm_pq_tpu import LLM, SamplingParams
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False, **kw)
    return llm.generate(
        [{"prompt_token_ids": prompt}],
        __import__("vllm_pq_tpu").SamplingParams(
            temperature=0.0, max_tokens=n,
            ignore_eos=True))[0].outputs[0].token_ids


def test_transformers_fallback_row(tmp_path):
    """An unknown near-llama arch runs via the TransformersModel-role
    fallback and matches the explicit-llama run token-exactly."""
    d1 = tmp_path / "llama"
    hf, cfg = _mk_llama_ckpt(d1)
    prompt = [3, 17, 9, 44, 2]
    want = _gen(d1, prompt)

    d2 = tmp_path / "unknown"
    hf.save_pretrained(d2, safe_serialization=True)
    raw = json.load(open(d2 / "config.json"))
    raw["architectures"] = ["FrobnicatorForCausalLM"]
    json.dump(raw, open(d2 / "config.json", "w"))
    got = _gen(d2, prompt)
    assert got == want, (got, want)


def test_solar_bskcn(tmp_path):
    """tv=0 blending is exactly llama; tv>0 changes the computation and
    stays deterministic (reference models/solar.py bskcn semantics)."""
    d = tmp_path / "solar0"
    hf, cfg = _mk_llama_ckpt(d, seed=1)
    prompt = [5, 9, 30, 2]
    want = _gen(d, prompt)

    raw = json.load(open(d / "config.json"))
    raw["architectures"] = ["SolarForCausalLM"]
    raw.update(bskcn_1=[0], bskcn_3=[1], bskcn_tv=[0.1, 0.0])
    json.dump(raw, open(d / "config.json", "w"))
    got0 = _gen(d, prompt)
    assert got0 == want, (got0, want)

    raw["bskcn_tv"] = [0.1, 0.25]
    json.dump(raw, open(d / "config.json", "w"))
    got = _gen(d, prompt)
    got2 = _gen(d, prompt)
    assert got == got2
    assert len(got) == 8


def test_fairseq2_llama_roundtrip(tmp_path):
    """fairseq2 layout (wrapped .pt, interleaved-rotary q/k) generates
    identically to the same weights in standard llama format."""
    d1 = tmp_path / "llama"
    hf, cfg = _mk_llama_ckpt(d1, seed=2)
    prompt = [11, 3, 77, 40]
    want = _gen(d1, prompt)

    d2 = tmp_path / "fs2"
    d2.mkdir()
    heads, kvh = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    dd = cfg["hidden_size"] // heads

    def inv_permute(w, n):
        # half-split -> interleaved (inverse of the loader's permute)
        return (w.reshape(n, 2, dd // 2, -1).transpose(0, 2, 1, 3)
                .reshape(n * dd, -1))
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    out = {}
    for k, v in sd.items():
        k = k[len("model."):] if k.startswith("model.") else k
        if k == "embed_tokens.weight":
            out["decoder_frontend.embed.weight"] = v
        elif k == "norm.weight":
            out["decoder.layer_norm.weight"] = v
        elif k == "lm_head.weight":
            out["final_proj.weight"] = v
        elif k.startswith("layers."):
            parts = k.split(".")
            li, leaf = parts[1], parts[-1]
            sub = ".".join(parts[2:-1])
            m = {"self_attn.q_proj": "self_attn.q_proj",
                 "self_attn.k_proj": "self_attn.k_proj",
                 "self_attn.v_proj": "self_attn.v_proj",
                 "self_attn.o_proj": "self_attn.output_proj",
                 "mlp.gate_proj": "ffn.gate_proj",
                 "mlp.up_proj": "ffn.inner_proj",
                 "mlp.down_proj": "ffn.output_proj",
                 "input_layernorm": "self_attn_layer_norm",
                 "post_attention_layernorm": "ffn_layer_norm"}
            if sub == "self_attn.q_proj":
                v = inv_permute(v, heads)
            elif sub == "self_attn.k_proj":
                v = inv_permute(v, kvh)
            out[f"decoder.layers.{li}.{m[sub]}.{leaf}"] = v
    torch.save({"model_key": "llama",
                "llama": {k: torch.tensor(v) for k, v in out.items()}},
               d2 / "model.pt")
    raw = json.load(open(d1 / "config.json"))
    raw["architectures"] = ["Fairseq2LlamaForCausalLM"]
    json.dump(raw, open(d2 / "config.json", "w"))
    got = _gen(d2, prompt)
    assert got == want, (got, want)


def test_qwen_v1_matches_qwen2(tmp_path):
    """Qwen-v1 layout (fused biased c_attn, w2/w1/c_proj SwiGLU)
    generates identically to the same weights as a Qwen2 checkpoint."""
    from transformers import Qwen2Config, Qwen2ForCausalLM
    torch.manual_seed(3)
    cfg = Qwen2Config(vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=256, rms_norm_eps=1e-6,
                      tie_word_embeddings=False)
    hf = Qwen2ForCausalLM(cfg).eval().float()
    d1 = tmp_path / "qwen2"
    hf.save_pretrained(d1, safe_serialization=True)
    prompt = [8, 120, 33, 9]
    want = _gen(d1, prompt)

    from safetensors.numpy import save_file
    d2 = tmp_path / "qwen_v1"
    d2.mkdir()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    out = {"transformer.wte.weight": sd["model.embed_tokens.weight"],
           "transformer.ln_f.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    for li in range(2):
        p = f"model.layers.{li}."
        o = f"transformer.h.{li}."
        out[o + "attn.c_attn.weight"] = np.concatenate(
            [sd[p + "self_attn.q_proj.weight"],
             sd[p + "self_attn.k_proj.weight"],
             sd[p + "self_attn.v_proj.weight"]], 0)
        out[o + "attn.c_attn.bias"] = np.concatenate(
            [sd[p + "self_attn.q_proj.bias"],
             sd[p + "self_attn.k_proj.bias"],
             sd[p + "self_attn.v_proj.bias"]], 0)
        out[o + "attn.c_proj.weight"] = sd[p + "self_attn.o_proj.weight"]
        out[o + "mlp.w2.weight"] = sd[p + "mlp.gate_proj.weight"]
        out[o + "mlp.w1.weight"] = sd[p + "mlp.up_proj.weight"]
        out[o + "mlp.c_proj.weight"] = sd[p + "mlp.down_proj.weight"]
        out[o + "ln_1.weight"] = sd[p + "input_layernorm.weight"]
        out[o + "ln_2.weight"] = sd[p + "post_attention_layernorm.weight"]
    save_file(out, str(d2 / "model.safetensors"))
    json.dump({"architectures": ["QWenLMHeadModel"],
               "model_type": "qwen",
               "vocab_size": 256, "hidden_size": 64,
               "intermediate_size": 256,  # BOTH halves (v1 convention)
               "num_hidden_layers": 2, "num_attention_heads": 4,
               "layer_norm_epsilon": 1e-6, "rotary_emb_base": 10000,
               "max_position_embeddings": 256},
              open(d2 / "config.json", "w"))
    got = _gen(d2, prompt)
    assert got == want, (got, want)


def test_decilm_variable_gqa(tmp_path):
    """DeciLM per-layer kv heads == uniform GQA with repeated k/v head
    blocks (the reference's own normalization, decilm.py:108)."""
    from safetensors import safe_open
    from safetensors.numpy import save_file
    d1 = tmp_path / "llama"
    hf, cfg = _mk_llama_ckpt(d1, seed=6, num_key_value_heads=4)
    heads, kvh, h = 4, 4, cfg["hidden_size"]
    dd = h // heads
    # overwrite each layer's k/v with a 2-head tensor repeated -> the
    # llama run IS the degrouped computation
    sd = {}
    with safe_open(d1 / "model.safetensors", framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)
    import numpy as np
    rng = np.random.default_rng(20)
    small = {}
    for li in range(cfg["num_hidden_layers"]):
        for p in ("k_proj", "v_proj"):
            w2 = (rng.standard_normal((2 * dd, h)) * 0.05).astype(
                np.float32)
            small[(li, p)] = w2
            sd[f"model.layers.{li}.self_attn.{p}.weight"] = np.repeat(
                w2.reshape(2, dd, h), 2, axis=0).reshape(4 * dd, h)
    save_file(sd, str(d1 / "model.safetensors"))
    prompt = [5, 40, 9, 77]
    want = _gen(d1, prompt)

    d2 = tmp_path / "decilm"
    d2.mkdir()
    sd2 = dict(sd)
    for (li, p), w2 in small.items():
        sd2[f"model.layers.{li}.self_attn.{p}.weight"] = w2
    save_file(sd2, str(d2 / "model.safetensors"))
    raw = json.load(open(d1 / "config.json"))
    raw["architectures"] = ["DeciLMForCausalLM"]
    raw.pop("num_key_value_heads", None)
    raw["num_key_value_heads_per_layer"] = [2] * cfg["num_hidden_layers"]
    json.dump(raw, open(d2 / "config.json", "w"))
    got = _gen(d2, prompt)
    assert got == want, (got, want)


def test_telechat2_loads_and_maps(tmp_path):
    """TeleChat2 layout: the per-head-interleaved key_value splits into
    the right K/V (checked against the loaded tree), and the model
    generates deterministically with the o_proj/down biases applied."""
    from safetensors.numpy import save_file
    rng = np.random.default_rng(4)
    h, heads, inter, L, vocab = 64, 4, 128, 2, 256
    d = h // heads
    out = {"transformer.word_embeddings.weight":
           (rng.standard_normal((vocab, h)) * 0.05).astype(np.float32),
           "transformer.ln_f.weight": np.ones(h, np.float32),
           "lm_head.weight":
           (rng.standard_normal((vocab, h)) * 0.05).astype(np.float32)}
    kv_ref = {}
    for li in range(L):
        o = f"transformer.h.{li}."
        kv = (rng.standard_normal((2 * h, h)) * 0.05).astype(np.float32)
        kv_ref[li] = kv
        out[o + "self_attention.key_value.weight"] = kv
        out[o + "self_attention.query.weight"] = \
            (rng.standard_normal((h, h)) * 0.05).astype(np.float32)
        out[o + "self_attention.dense.weight"] = \
            (rng.standard_normal((h, h)) * 0.05).astype(np.float32)
        out[o + "self_attention.dense.bias"] = \
            (rng.standard_normal(h) * 0.02).astype(np.float32)
        out[o + "mlp.gate_proj.weight"] = \
            (rng.standard_normal((inter, h)) * 0.05).astype(np.float32)
        out[o + "mlp.up_proj.weight"] = \
            (rng.standard_normal((inter, h)) * 0.05).astype(np.float32)
        out[o + "mlp.down_proj.weight"] = \
            (rng.standard_normal((h, inter)) * 0.05).astype(np.float32)
        out[o + "mlp.down_proj.bias"] = \
            (rng.standard_normal(h) * 0.02).astype(np.float32)
        out[o + "input_layernorm.weight"] = np.ones(h, np.float32)
        out[o + "post_attention_layernorm.weight"] = \
            np.ones(h, np.float32)
    dd = tmp_path / "telechat2"
    dd.mkdir()
    save_file(out, str(dd / "model.safetensors"))
    json.dump({"architectures": ["TeleChat2ForCausalLM"],
               "model_type": "telechat",
               "vocab_size": vocab, "hidden_size": h, "n_layer": L,
               "n_head": heads, "ffn_hidden_size": inter,
               "layer_norm_epsilon": 1e-5, "seq_length": 256},
              open(dd / "config.json", "w"))

    from vllm_pq_tpu import LLM, SamplingParams
    llm = LLM(model=str(dd), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    # the loaded K must equal the even head-blocks, V the odd ones
    import jax
    params = jax.device_get(llm.llm_engine.engine_core.runner.params)
    kv = kv_ref[0].reshape(heads, 2, d, h)
    np.testing.assert_allclose(
        params["layers"][0]["k_proj"]["weight"],
        kv[:, 0].reshape(h, h).T, rtol=1e-6)
    np.testing.assert_allclose(
        params["layers"][0]["v_proj"]["weight"],
        kv[:, 1].reshape(h, h).T, rtol=1e-6)
    got = llm.generate(
        [{"prompt_token_ids": [4, 9, 2]}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0].outputs[0].token_ids
    got2 = llm.generate(
        [{"prompt_token_ids": [4, 9, 2]}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == got2 and len(got) == 6
