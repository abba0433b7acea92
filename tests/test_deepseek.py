"""DeepSeek-V2 MLA + DeepSeekMoE golden parity vs transformers
(reference models/deepseek_v2.py; decompressed-KV execution =
VLLM_MLA_DISABLE path)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import DeepseekV2Config, DeepseekV2ForCausalLM  # noqa: E402


def _save_hf(tmp_path, q_lora_rank=None, yarn=False, groups=False,
             seed=0):
    kw = dict(vocab_size=512, hidden_size=128, intermediate_size=256,
              moe_intermediate_size=64, num_hidden_layers=3,
              num_attention_heads=4, num_key_value_heads=4,
              q_lora_rank=q_lora_rank, kv_lora_rank=64,
              qk_nope_head_dim=32, qk_rope_head_dim=16, v_head_dim=32,
              n_routed_experts=8, n_shared_experts=1,
              num_experts_per_tok=2, first_k_dense_replace=1,
              moe_layer_freq=1, routed_scaling_factor=1.0,
              norm_topk_prob=False, scoring_func="softmax",
              topk_method="greedy", n_group=None, topk_group=None,
              rms_norm_eps=1e-5, rope_theta=10000.0,
              max_position_embeddings=512, tie_word_embeddings=False,
              attention_bias=False, aux_loss_alpha=0.0, seq_aux=False)
    if groups:
        kw.update(topk_method="group_limited_greedy", n_group=4,
                  topk_group=2, num_experts_per_tok=2)
    if yarn:
        kw.update(rope_scaling={
            "rope_type": "yarn", "factor": 4.0,
            "original_max_position_embeddings": 128,
            "mscale": 0.707, "mscale_all_dim": 0.707,
            "beta_fast": 32, "beta_slow": 1})
    cfg = DeepseekV2Config(**kw)
    torch.manual_seed(seed)
    model = DeepseekV2ForCausalLM(cfg).eval().float()
    name = f"hf_ds_{q_lora_rank}_{yarn}_{groups}"
    d = tmp_path / name
    model.save_pretrained(d, safe_serialization=True)
    return d, model


def _ours(d):
    from vllm_pq_tpu import LLM
    return LLM(model=str(d), dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
               num_kv_blocks=64, enable_prefix_caching=False)


def _compare(hf_model, llm, trials=3, n_new=10):
    from vllm_pq_tpu import SamplingParams
    rng = np.random.default_rng(0)
    for trial in range(trials):
        prompt = rng.integers(5, 500, int(rng.integers(4, 24))).tolist()
        with torch.no_grad():
            hf_out = hf_model.generate(
                torch.tensor([prompt]), max_new_tokens=n_new,
                do_sample=False, num_beams=1, pad_token_id=0)
        expected = hf_out[0, len(prompt):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(temperature=0.0, max_tokens=n_new,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == expected, (trial, got, expected)


@pytest.mark.parametrize("q_lora_rank,yarn,groups", [
    (None, False, False),     # V2-Lite style: direct q, greedy topk
    (48, False, False),       # full V2: q low-rank + norm
    (None, True, False),      # yarn rope with deepseek mscale ratio
    (None, False, True),      # group-limited routing
])
def test_deepseek_matches_hf(tmp_path, q_lora_rank, yarn, groups):
    """Latent-cache (absorbed) MLA — the default execution."""
    d, hf_model = _save_hf(tmp_path, q_lora_rank, yarn, groups)
    llm = _ours(d)
    assert llm.llm_engine.engine_core.runner.model.cfg.mla_latent
    _compare(hf_model, llm)


def test_deepseek_decompressed_matches_hf(tmp_path, monkeypatch):
    """VPQ_MLA_DISABLE=1: decompressed per-head K/V oracle path."""
    monkeypatch.setenv("VPQ_MLA_DISABLE", "1")
    d, hf_model = _save_hf(tmp_path, 48, False, False)
    llm = _ours(d)
    assert not llm.llm_engine.engine_core.runner.model.cfg.mla_latent
    _compare(hf_model, llm)


def test_latent_cache_is_compressed(tmp_path):
    """The latent cache must be ~(2*H*dqk)/(kv_lora+dr) smaller."""
    d, _ = _save_hf(tmp_path, None, False, False)
    llm = _ours(d)
    runner = llm.llm_engine.engine_core.runner
    cfg = runner.model.cfg
    shape = runner.kv_caches[0].shape
    assert shape[2:] == (cfg.kv_lora_rank + cfg.qk_rope_head_dim,)
    dense = 2 * cfg.num_attention_heads * cfg.qk_head_dim
    assert dense / shape[-1] > 4
