"""Model-family coverage: Gemma/Gemma2/Qwen2/Phi-3 build and generate
end-to-end with dummy weights (role of reference per-arch model tests)."""

import json

import pytest

BASE = {
    "vocab_size": 512,
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "num_key_value_heads": 2,
    "max_position_embeddings": 512,
}

FAMILIES = {
    "Qwen2ForCausalLM": {},
    "OPTForCausalLM": {"ffn_dim": 256, "do_layer_norm_before": True},
    "GPT2LMHeadModel": {"n_embd": 128, "n_layer": 2, "n_head": 2,
                        "n_positions": 512},
    "GemmaForCausalLM": {"hidden_activation": "gelu_pytorch_tanh",
                         "tie_word_embeddings": True},
    "Gemma2ForCausalLM": {"hidden_activation": "gelu_pytorch_tanh",
                          "tie_word_embeddings": True,
                          "final_logit_softcapping": 30.0,
                          "attn_logit_softcapping": 50.0,
                          "query_pre_attn_scalar": 64,
                          "sliding_window": 64},
    "Phi3ForCausalLM": {},
    "MistralForCausalLM": {"sliding_window": 64},
    # round-2 breadth: no local HF reference implementation
    # (trust_remote_code archs) — dummy-weight generation coverage;
    # weight-name mapping is exercised via the loader branches
    "BaiChuanForCausalLM": {},                     # Baichuan-7B (rope)
    "BaichuanForCausalLM": {"hidden_size": 128,
                            "position_embedding": "ALIBI"},
    "InternLM2ForCausalLM": {"bias": False},
    "AquilaForCausalLM": {},
    "XverseForCausalLM": {},
    "InternLMForCausalLM": {"bias": True},
}


@pytest.mark.parametrize("arch", sorted(FAMILIES))
def test_family_generates(arch, tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    cfg = dict(BASE, architectures=[arch], **FAMILIES[arch])
    d = tmp_path / arch
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    llm = LLM(model=str(d), load_format="dummy", dtype="float32",
              max_model_len=128, max_num_seqs=4,
              max_num_batched_tokens=128, block_size=16, num_kv_blocks=64)
    outs = llm.generate(
        [{"prompt_token_ids": [5, 6, 7, 8]}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    toks = outs[0].outputs[0].token_ids
    assert len(toks) == 6
    # deterministic
    outs2 = llm.generate(
        [{"prompt_token_ids": [5, 6, 7, 8]}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    assert outs2[0].outputs[0].token_ids == toks


def test_list_supported_archs():
    from vllm_pq_tpu.models.registry import list_supported_archs
    archs = list_supported_archs()
    for a in ("LlamaForCausalLM", "MixtralForCausalLM", "Qwen2ForCausalLM",
              "GemmaForCausalLM", "Gemma2ForCausalLM", "Phi3ForCausalLM",
              "MistralForCausalLM", "OPTForCausalLM",
              "GPT2LMHeadModel"):
        assert a in archs, a
