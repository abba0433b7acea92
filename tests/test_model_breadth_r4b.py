"""Round-4 registry breadth batch: pooling/embedding aliases
(Qwen2EmbeddingModel, Gemma2Model, BertEmbeddingModel, Roberta rows),
spec-draft architecture rows (reference registry.py
_SPECULATIVE_DECODING_MODELS), InternLM2 reward head and the
InternLM2-VE / Mantis / Stablelm alias rows."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _registry():
    import importlib
    import pkgutil

    import vllm_pq_tpu.models as M
    import vllm_pq_tpu.models.registry as r
    for mi in pkgutil.iter_modules(M.__path__):
        importlib.import_module("vllm_pq_tpu.models." + mi.name)
    return r._REGISTRY


def test_new_alias_archs_resolve():
    reg = _registry()
    for name in ("Qwen2EmbeddingModel", "Gemma2Model",
                 "BertEmbeddingModel", "RobertaModel",
                 "RobertaEmbeddingModel", "XLMRobertaModel",
                 "StablelmForCausalLM", "InternLM2VEForCausalLM",
                 "InternLM2ForRewardModel",
                 "MantisForConditionalGeneration", "MedusaModel",
                 "EAGLEModel", "MLPSpeculatorPreTrainedModel",
                 "DeepSeekMTPModel"):
        assert name in reg, name


def test_spec_draft_arch_raises_with_guidance(tmp_path):
    d = tmp_path / "medusa"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "architectures": ["MedusaModel"], "hidden_size": 64,
        "vocab_size": 128, "num_hidden_layers": 1}))
    from vllm_pq_tpu import LLM
    with pytest.raises(ValueError, match="speculative"):
        LLM(model=str(d), dtype="float32", max_model_len=32,
            max_num_seqs=1, max_num_batched_tokens=32, block_size=16,
            num_kv_blocks=8)


def test_xlm_roberta_embedding_matches_hf(tmp_path):
    from transformers import XLMRobertaConfig, XLMRobertaModel
    cfg = XLMRobertaConfig(vocab_size=256, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=2,
                           max_position_embeddings=130, pad_token_id=1,
                           type_vocab_size=1)
    torch.manual_seed(0)
    hf = XLMRobertaModel(cfg).eval().float()
    d = tmp_path / "xlmr"
    hf.save_pretrained(d, safe_serialization=True)
    from vllm_pq_tpu import LLM
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64)
    prompt = [5, 7, 42, 99, 201, 6]
    with torch.no_grad():
        want = hf(torch.tensor([prompt])).last_hidden_state[0, 0].numpy()
    got = llm.embed([{"prompt_token_ids": prompt}])[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                               atol=2e-4)


def _internlm2_checkpoint_from_llama(hf, v_head, d):
    """Rename a tiny HF llama state dict into InternLM2 naming (grouped
    wqkv, wo/w1/w3/w2, attention_norm/ffn_norm, tok_embeddings) plus a
    scalar v_head, as InternLM2ForRewardModel checkpoints ship."""
    from safetensors.torch import save_file
    cfg = hf.config
    kvh = cfg.num_key_value_heads
    rep = cfg.num_attention_heads // kvh
    hd = cfg.hidden_size // cfg.num_attention_heads
    sd = hf.state_dict()
    out = {"model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
           "model.norm.weight": sd["model.norm.weight"],
           "v_head.weight": v_head}
    for li in range(cfg.num_hidden_layers):
        p = f"model.layers.{li}."
        q = sd[p + "self_attn.q_proj.weight"].reshape(kvh, rep, hd, -1)
        k = sd[p + "self_attn.k_proj.weight"].reshape(kvh, 1, hd, -1)
        v = sd[p + "self_attn.v_proj.weight"].reshape(kvh, 1, hd, -1)
        out[p + "attention.wqkv.weight"] = torch.cat(
            [q, k, v], dim=1).reshape(kvh * (rep + 2) * hd, -1)
        out[p + "attention.wo.weight"] = sd[p + "self_attn.o_proj.weight"]
        out[p + "feed_forward.w1.weight"] = sd[p + "mlp.gate_proj.weight"]
        out[p + "feed_forward.w3.weight"] = sd[p + "mlp.up_proj.weight"]
        out[p + "feed_forward.w2.weight"] = sd[p + "mlp.down_proj.weight"]
        out[p + "attention_norm.weight"] = sd[
            p + "input_layernorm.weight"]
        out[p + "ffn_norm.weight"] = sd[
            p + "post_attention_layernorm.weight"]
    d.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in out.items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "architectures": ["InternLM2ForRewardModel"],
        "model_type": "internlm2",
        "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": kvh,
        "max_position_embeddings": cfg.max_position_embeddings,
        "rms_norm_eps": cfg.rms_norm_eps, "bias": False,
        "rope_theta": cfg.rope_theta}))


def _chatglm_checkpoint_from_glm(hf, d):
    """Write a tiny transformers GlmForCausalLM as a legacy ChatGLM
    checkpoint (the inverse of HF's glm conversion script): fused
    query_key_value / dense_h_to_4h under transformer.encoder.*, THUDM
    config keys. Golden-tests our chatglm builder + loader against the
    HF glm math, which IS the chatglm math (interleaved half-rope, MQA,
    gate-first swiglu)."""
    from safetensors.torch import save_file
    cfg = hf.config
    sd = hf.state_dict()
    out = {
        "transformer.embedding.word_embeddings.weight":
            sd["model.embed_tokens.weight"],
        "transformer.encoder.final_layernorm.weight":
            sd["model.norm.weight"],
        "transformer.output_layer.weight": sd["lm_head.weight"],
    }
    for li in range(cfg.num_hidden_layers):
        src = f"model.layers.{li}."
        dst = f"transformer.encoder.layers.{li}."
        out[dst + "self_attention.query_key_value.weight"] = torch.cat(
            [sd[src + "self_attn.q_proj.weight"],
             sd[src + "self_attn.k_proj.weight"],
             sd[src + "self_attn.v_proj.weight"]], dim=0)
        out[dst + "self_attention.query_key_value.bias"] = torch.cat(
            [sd[src + "self_attn.q_proj.bias"],
             sd[src + "self_attn.k_proj.bias"],
             sd[src + "self_attn.v_proj.bias"]], dim=0)
        out[dst + "self_attention.dense.weight"] = sd[
            src + "self_attn.o_proj.weight"]
        out[dst + "mlp.dense_h_to_4h.weight"] = sd[
            src + "mlp.gate_up_proj.weight"]
        out[dst + "mlp.dense_4h_to_h.weight"] = sd[
            src + "mlp.down_proj.weight"]
        out[dst + "input_layernorm.weight"] = sd[
            src + "input_layernorm.weight"]
        out[dst + "post_attention_layernorm.weight"] = sd[
            src + "post_attention_layernorm.weight"]
    d.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in out.items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "architectures": ["ChatGLMModel"], "model_type": "chatglm",
        "padded_vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "ffn_hidden_size": cfg.intermediate_size,
        "num_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "multi_query_attention": True,
        "multi_query_group_num": cfg.num_key_value_heads,
        "kv_channels": cfg.head_dim,
        "layernorm_epsilon": cfg.rms_norm_eps,
        "rope_ratio": cfg.rope_theta / 10000.0,
        "seq_length": cfg.max_position_embeddings,
        "add_qkv_bias": True, "add_bias_linear": False,
        "rmsnorm": True, "tie_word_embeddings": False}))


def test_chatglm_matches_hf_glm(tmp_path):
    from transformers import GlmConfig, GlmForCausalLM
    cfg = GlmConfig(vocab_size=256, hidden_size=64,
                    intermediate_size=128, num_hidden_layers=2,
                    num_attention_heads=4, num_key_value_heads=2,
                    head_dim=16, partial_rotary_factor=0.5,
                    max_position_embeddings=256, attention_bias=True,
                    tie_word_embeddings=False, pad_token_id=0,
                    eos_token_id=1, bos_token_id=2)
    torch.manual_seed(5)
    hf = GlmForCausalLM(cfg).eval().float()
    d = tmp_path / "chatglm"
    _chatglm_checkpoint_from_glm(hf, d)
    from vllm_pq_tpu import LLM, SamplingParams
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(4)
    for _ in range(2):
        ids = rng.integers(2, 250, int(rng.integers(4, 16))).tolist()
        with torch.no_grad():
            exp = hf.generate(
                torch.tensor([ids]), max_new_tokens=8, do_sample=False,
                num_beams=1, pad_token_id=0)[0, len(ids):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": ids}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (got, exp)


def test_internlm2_reward_matches_golden(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=256)
    torch.manual_seed(1)
    hf = LlamaForCausalLM(cfg).eval().float()
    v_head = torch.randn(1, cfg.hidden_size) * 0.2
    d = tmp_path / "ilm2rm"
    _internlm2_checkpoint_from_llama(hf, v_head, d)
    from vllm_pq_tpu import LLM
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32)
    rng = np.random.default_rng(3)
    for _ in range(2):
        ids = rng.integers(2, 250, int(rng.integers(3, 14))).tolist()
        got = llm.classify([{"prompt_token_ids": ids}])[0]
        with torch.no_grad():
            h = hf.model(torch.tensor([ids])).last_hidden_state[0, -1]
            want = (h @ v_head.T[:, 0]).reshape(1).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4,
                                   atol=3e-4)
