"""Golden parity vs HuggingFace transformers (the reference's core
model-test strategy: HfRunner vs VllmRunner, tests/conftest.py:252,662):
build a tiny model in transformers, save real safetensors, load it with
this engine, and require matching greedy generations and logits."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _save_hf_llama(tmp_path, seed=0):
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(vocab_size=512, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512, rms_norm_eps=1e-5,
                      rope_theta=10000.0, tie_word_embeddings=False,
                      attention_bias=False)
    torch.manual_seed(seed)
    model = LlamaForCausalLM(cfg).eval().float()
    d = tmp_path / "hf_llama"
    model.save_pretrained(d, safe_serialization=True)
    with open(d / "config.json") as f:
        raw = json.load(f)
    return d, model, raw


@pytest.fixture(scope="module")
def hf_and_ours(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hf_parity")
    d, hf_model, _ = _save_hf_llama(tmp)
    from vllm_pq_tpu import LLM
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    return hf_model, llm


def test_greedy_matches_hf(hf_and_ours):
    hf_model, llm = hf_and_ours
    from vllm_pq_tpu import SamplingParams
    rng = np.random.default_rng(0)
    for trial in range(3):
        prompt = rng.integers(5, 500, int(rng.integers(4, 20))).tolist()
        n_new = 12
        with torch.no_grad():
            hf_out = hf_model.generate(
                torch.tensor([prompt]), max_new_tokens=n_new,
                do_sample=False, num_beams=1,
                pad_token_id=0)
        expected = hf_out[0, len(prompt):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(temperature=0.0, max_tokens=n_new,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == expected, (trial, got, expected)


@pytest.mark.parametrize("family", ["opt", "gpt2", "qwen2"])
def test_greedy_matches_hf_other_families(family, tmp_path):
    torch.manual_seed(1)
    if family == "opt":
        from transformers import OPTConfig, OPTForCausalLM
        cfg = OPTConfig(vocab_size=512, hidden_size=128, ffn_dim=256,
                        num_hidden_layers=2, num_attention_heads=4,
                        max_position_embeddings=512,
                        do_layer_norm_before=True, word_embed_proj_dim=128)
        hf_model = OPTForCausalLM(cfg).eval().float()
    elif family == "gpt2":
        from transformers import GPT2Config, GPT2LMHeadModel
        cfg = GPT2Config(vocab_size=512, n_embd=128, n_layer=2, n_head=4,
                         n_positions=512)
        hf_model = GPT2LMHeadModel(cfg).eval().float()
    else:
        from transformers import Qwen2Config, Qwen2ForCausalLM
        cfg = Qwen2Config(vocab_size=512, hidden_size=128,
                          intermediate_size=256, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2,
                          max_position_embeddings=512,
                          tie_word_embeddings=False)
        hf_model = Qwen2ForCausalLM(cfg).eval().float()
    d = tmp_path / family
    hf_model.save_pretrained(d, safe_serialization=True)

    from vllm_pq_tpu import LLM, SamplingParams
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    rng = np.random.default_rng(7)
    prompt = rng.integers(5, 500, 9).tolist()
    with torch.no_grad():
        hf_out = hf_model.generate(torch.tensor([prompt]),
                                   max_new_tokens=10, do_sample=False,
                                   num_beams=1, pad_token_id=0)
    expected = hf_out[0, len(prompt):].tolist()
    got = llm.generate([{"prompt_token_ids": prompt}],
                       SamplingParams(temperature=0.0, max_tokens=10,
                                      ignore_eos=True)
                       )[0].outputs[0].token_ids
    assert got == expected, (family, got, expected)


def test_prompt_logprobs_match_hf(hf_and_ours):
    hf_model, llm = hf_and_ours
    from vllm_pq_tpu import SamplingParams
    prompt = [11, 45, 99, 123, 7, 300]
    with torch.no_grad():
        logits = hf_model(torch.tensor([prompt])).logits[0]
    hf_logp = torch.log_softmax(logits.float(), dim=-1)
    out = llm.generate(
        [{"prompt_token_ids": prompt}],
        SamplingParams(temperature=0.0, max_tokens=1, prompt_logprobs=2,
                       ignore_eos=True))[0]
    plp = out.prompt_logprobs
    assert plp is not None and plp[0] is None
    for pos in range(1, len(prompt)):
        ours = plp[pos][prompt[pos]].logprob
        ref = float(hf_logp[pos - 1, prompt[pos]])
        assert abs(ours - ref) < 2e-3, (pos, ours, ref)


def _tiny_kw():
    return dict(vocab_size=512, hidden_size=128, intermediate_size=256,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=512)


def _build_round2_family(family):
    """Tiny HF reference models for the round-2 breadth families."""
    kw = _tiny_kw()
    if family == "qwen3":
        from transformers import Qwen3Config, Qwen3ForCausalLM
        return Qwen3ForCausalLM(Qwen3Config(**kw, head_dim=32))
    if family == "granite":
        from transformers import GraniteConfig, GraniteForCausalLM
        return GraniteForCausalLM(GraniteConfig(
            **kw, embedding_multiplier=2.0, residual_multiplier=0.5,
            attention_multiplier=0.15, logits_scaling=3.0))
    if family == "cohere":
        from transformers import CohereConfig, CohereForCausalLM
        return CohereForCausalLM(CohereConfig(
            **kw, logit_scale=0.25, use_qk_norm=False,
            layer_norm_eps=1e-5))
    if family == "cohere_qknorm":
        from transformers import CohereConfig, CohereForCausalLM
        return CohereForCausalLM(CohereConfig(
            **kw, logit_scale=0.0625, use_qk_norm=True,
            layer_norm_eps=1e-5))
    if family == "gptj":
        from transformers import GPTJConfig, GPTJForCausalLM
        return GPTJForCausalLM(GPTJConfig(
            vocab_size=512, n_embd=128, n_layer=2, n_head=4,
            n_positions=512, rotary_dim=16))
    if family == "olmo":
        from transformers import OlmoConfig, OlmoForCausalLM
        return OlmoForCausalLM(OlmoConfig(**kw, clip_qkv=8.0))
    if family == "olmo2":
        from transformers import Olmo2Config, Olmo2ForCausalLM
        return Olmo2ForCausalLM(Olmo2Config(**kw))
    if family == "glm":
        from transformers import GlmConfig, GlmForCausalLM
        return GlmForCausalLM(GlmConfig(
            **kw, partial_rotary_factor=0.5, attention_bias=True,
            head_dim=32, pad_token_id=0, eos_token_id=1,
            bos_token_id=2))
    if family == "gpt_bigcode":
        from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM
        return GPTBigCodeForCausalLM(GPTBigCodeConfig(
            vocab_size=512, n_embd=128, n_layer=2, n_head=4,
            n_positions=512, multi_query=True,
            activation_function="gelu_pytorch_tanh"))
    if family == "ministral":
        from transformers import MinistralConfig, MinistralForCausalLM
        return MinistralForCausalLM(MinistralConfig(
            **kw, sliding_window=8, head_dim=32, pad_token_id=0))
    if family == "glm4":
        from transformers import Glm4Config, Glm4ForCausalLM
        return Glm4ForCausalLM(Glm4Config(
            **kw, head_dim=32, partial_rotary_factor=0.5,
            attention_bias=True, pad_token_id=0, eos_token_id=1,
            bos_token_id=2))
    if family == "nemotron":
        from transformers import NemotronConfig, NemotronForCausalLM
        return NemotronForCausalLM(NemotronConfig(
            **kw, hidden_act="relu2", norm_eps=1e-5,
            partial_rotary_factor=0.5, tie_word_embeddings=False))
    if family == "smollm3":
        from transformers import SmolLM3Config, SmolLM3ForCausalLM
        return SmolLM3ForCausalLM(SmolLM3Config(
            **kw, no_rope_layers=[1, 0], layer_types=None,
            pad_token_id=0))
    if family == "persimmon":
        from transformers import PersimmonConfig, PersimmonForCausalLM
        return PersimmonForCausalLM(PersimmonConfig(
            **kw, hidden_act="relu2", qk_layernorm=True,
            partial_rotary_factor=0.5, layer_norm_eps=1e-5,
            rope_theta=25000.0, tie_word_embeddings=False))
    if family == "bloom":
        from transformers import BloomConfig, BloomForCausalLM
        return BloomForCausalLM(BloomConfig(
            vocab_size=512, hidden_size=128, n_layer=2, n_head=4))
    if family == "mpt":
        from transformers import MptConfig, MptForCausalLM
        from transformers.models.mpt.configuration_mpt import \
            MptAttentionConfig
        return MptForCausalLM(MptConfig(
            vocab_size=512, d_model=128, n_layers=2, n_heads=4,
            max_seq_len=512, expansion_ratio=2, no_bias=True,
            attn_config=MptAttentionConfig(alibi=True)))
    raise ValueError(family)


@pytest.mark.parametrize("family", [
    "qwen3", "granite", "cohere", "cohere_qknorm", "gptj", "olmo",
    "olmo2", "glm", "bloom", "mpt", "persimmon", "glm4", "nemotron",
    "smollm3", "ministral", "gpt_bigcode"])
def test_greedy_matches_hf_round2_families(family, tmp_path):
    """Round-2 breadth: each new family pins greedy tokens to HF."""
    torch.manual_seed(3)
    hf_model = _build_round2_family(family).eval().float()
    d = tmp_path / family
    hf_model.save_pretrained(d, safe_serialization=True)

    from vllm_pq_tpu import LLM, SamplingParams
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    rng = np.random.default_rng(11)
    prompt = rng.integers(5, 500, 9).tolist()
    with torch.no_grad():
        hf_out = hf_model.generate(torch.tensor([prompt]),
                                   max_new_tokens=10, do_sample=False,
                                   num_beams=1, pad_token_id=0)
    expected = hf_out[0, len(prompt):].tolist()
    got = llm.generate([{"prompt_token_ids": prompt}],
                       SamplingParams(temperature=0.0, max_tokens=10,
                                      ignore_eos=True)
                       )[0].outputs[0].token_ids
    assert got == expected, (family, got, expected)


@pytest.mark.parametrize("family", ["dbrx", "phimoe"])
def test_greedy_matches_hf_moe_families(family, tmp_path):
    """Round-2 MoE breadth: DBRX and Phi-3.5-MoE pin greedy tokens."""
    torch.manual_seed(5)
    if family == "dbrx":
        from transformers import DbrxConfig, DbrxForCausalLM
        from transformers.models.dbrx.configuration_dbrx import (
            DbrxAttentionConfig, DbrxFFNConfig)
        cfg = DbrxConfig(
            d_model=128, n_heads=4, n_layers=2, max_seq_len=512,
            vocab_size=512,
            attn_config=DbrxAttentionConfig(kv_n_heads=2, clip_qkv=8.0,
                                            rope_theta=10000.0),
            ffn_config=DbrxFFNConfig(ffn_hidden_size=256,
                                     moe_num_experts=4, moe_top_k=2))
        hf_model = DbrxForCausalLM(cfg).eval().float()
    else:
        from transformers import PhimoeConfig, PhimoeForCausalLM
        cfg = PhimoeConfig(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=512,
            num_local_experts=4, num_experts_per_tok=2,
            attention_bias=True, lm_head_bias=True,
            rope_scaling=None)
        hf_model = PhimoeForCausalLM(cfg).eval().float()
    d = tmp_path / family
    hf_model.save_pretrained(d, safe_serialization=True)

    from vllm_pq_tpu import LLM, SamplingParams
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    rng = np.random.default_rng(13)
    prompt = rng.integers(5, 500, 9).tolist()
    with torch.no_grad():
        hf_out = hf_model.generate(torch.tensor([prompt]),
                                   max_new_tokens=10, do_sample=False,
                                   num_beams=1, pad_token_id=0)
    expected = hf_out[0, len(prompt):].tolist()
    got = llm.generate([{"prompt_token_ids": prompt}],
                       SamplingParams(temperature=0.0, max_tokens=10,
                                      ignore_eos=True)
                       )[0].outputs[0].token_ids
    assert got == expected, (family, got, expected)
