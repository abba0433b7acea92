"""Round-3 MoE families vs HF goldens: Qwen3-MoE (head qk-norm, no
shared expert), OLMoE (full-width qk-norm, MoE every layer), GraniteMoe
(mu-param multipliers + fused expert stacks) and GraniteMoeShared
(ungated shared expert). Reference models/{qwen3_moe,olmoe,granitemoe,
granitemoeshared}.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _compare(hf_model, llm, n_new=8, trials=2, seed=11):
    from vllm_pq_tpu import SamplingParams
    rng = np.random.default_rng(seed)
    for _ in range(trials):
        prompt = rng.integers(5, 500, int(rng.integers(4, 20))).tolist()
        with torch.no_grad():
            exp = hf_model.generate(
                torch.tensor([prompt]), max_new_tokens=n_new,
                do_sample=False, num_beams=1,
                pad_token_id=0)[0, len(prompt):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(temperature=0.0, max_tokens=n_new,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (got, exp)


def _llm(d):
    from vllm_pq_tpu import LLM
    return LLM(model=str(d), dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
               num_kv_blocks=64, enable_prefix_caching=False)


def test_qwen3_moe_matches_hf(tmp_path):
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
    cfg = Qwen3MoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=256,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        decoder_sparse_step=1, norm_topk_prob=True,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = Qwen3MoeForCausalLM(cfg).eval().float()
    d = tmp_path / "qwen3moe"
    hf.save_pretrained(d, safe_serialization=True)
    _compare(hf, _llm(d))


def test_olmoe_matches_hf(tmp_path):
    from transformers import OlmoeConfig, OlmoeForCausalLM
    cfg = OlmoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        tie_word_embeddings=False)
    torch.manual_seed(1)
    hf = OlmoeForCausalLM(cfg).eval().float()
    d = tmp_path / "olmoe"
    hf.save_pretrained(d, safe_serialization=True)
    _compare(hf, _llm(d))


def test_granitemoe_matches_hf(tmp_path):
    from transformers import GraniteMoeConfig, GraniteMoeForCausalLM
    cfg = GraniteMoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=6.0, attention_multiplier=0.015625,
        residual_multiplier=0.22, logits_scaling=4.0,
        tie_word_embeddings=False)
    torch.manual_seed(2)
    hf = GraniteMoeForCausalLM(cfg).eval().float()
    d = tmp_path / "granitemoe"
    hf.save_pretrained(d, safe_serialization=True)
    _compare(hf, _llm(d))


def test_granitemoe_shared_matches_hf(tmp_path):
    from transformers import (GraniteMoeSharedConfig,
                              GraniteMoeSharedForCausalLM)
    cfg = GraniteMoeSharedConfig(
        vocab_size=512, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        num_local_experts=4, num_experts_per_tok=2,
        shared_intermediate_size=48,
        embedding_multiplier=6.0, attention_multiplier=0.015625,
        residual_multiplier=0.22, logits_scaling=4.0,
        tie_word_embeddings=False)
    torch.manual_seed(3)
    hf = GraniteMoeSharedForCausalLM(cfg).eval().float()
    d = tmp_path / "granitemoeshared"
    hf.save_pretrained(d, safe_serialization=True)
    _compare(hf, _llm(d))


def test_gemma3_matches_hf(tmp_path):
    # (not MoE, but shares the golden harness) Gemma3: dual rope tables,
    # gemma-style head qk-norms, 5:1 local:global window pattern
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM
    cfg = Gemma3TextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=7, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
        max_position_embeddings=256, rope_theta=1_000_000.0,
        rope_local_base_freq=10_000.0, sliding_window=16,
        sliding_window_pattern=6, query_pre_attn_scalar=16,
        tie_word_embeddings=True)
    torch.manual_seed(4)
    hf = Gemma3ForCausalLM(cfg).eval().float()
    d = tmp_path / "gemma3"
    hf.save_pretrained(d, safe_serialization=True)
    # prompts longer than the sliding window exercise the local mask
    _compare(hf, _llm(d), n_new=8, trials=2, seed=23)
