"""Generalized-decoder families (layernorm / partial rotary / parallel
residual / two-linear MLP) vs HF goldens: GPT-NeoX, Phi, StableLM,
Starcoder2 (reference models/{gpt_neox,phi,stablelm,starcoder2}.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _compare(hf_model, llm, n_new=8, trials=2):
    from vllm_pq_tpu import SamplingParams
    rng = np.random.default_rng(5)
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


def test_gpt_neox_matches_hf(tmp_path):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM
    cfg = GPTNeoXConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, rotary_pct=0.25,
        use_parallel_residual=True, hidden_act="gelu",
        layer_norm_eps=1e-5, max_position_embeddings=256,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = GPTNeoXForCausalLM(cfg).eval().float()
    d = tmp_path / "neox"
    hf.save_pretrained(d, safe_serialization=True)
    _compare(hf, _llm(d))


def test_gpt_neox_nonparallel_matches_hf(tmp_path):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM
    cfg = GPTNeoXConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=1.0,
        use_parallel_residual=False, hidden_act="gelu",
        layer_norm_eps=1e-5, max_position_embeddings=256,
        tie_word_embeddings=False)
    torch.manual_seed(1)
    hf = GPTNeoXForCausalLM(cfg).eval().float()
    d = tmp_path / "neox_np"
    hf.save_pretrained(d, safe_serialization=True)
    _compare(hf, _llm(d))


def test_phi_matches_hf(tmp_path):
    from transformers import PhiConfig, PhiForCausalLM
    cfg = PhiConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=4, partial_rotary_factor=0.5,
        layer_norm_eps=1e-5, hidden_act="gelu_new",
        max_position_embeddings=256, tie_word_embeddings=False,
        embd_pdrop=0.0, attention_dropout=0.0, resid_pdrop=0.0)
    torch.manual_seed(2)
    hf = PhiForCausalLM(cfg).eval().float()
    d = tmp_path / "phi"
    hf.save_pretrained(d, safe_serialization=True)
    _compare(hf, _llm(d))


def test_stablelm_matches_hf(tmp_path):
    from transformers import StableLmConfig, StableLmForCausalLM
    cfg = StableLmConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, partial_rotary_factor=0.25,
        layer_norm_eps=1e-5, hidden_act="silu", use_qkv_bias=True,
        use_parallel_residual=False, max_position_embeddings=256,
        tie_word_embeddings=False, attention_dropout=0.0)
    torch.manual_seed(3)
    hf = StableLmForCausalLM(cfg).eval().float()
    d = tmp_path / "stablelm"
    hf.save_pretrained(d, safe_serialization=True)
    _compare(hf, _llm(d))


def test_starcoder2_matches_hf(tmp_path):
    from transformers import Starcoder2Config, Starcoder2ForCausalLM
    cfg = Starcoder2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, hidden_act="gelu_pytorch_tanh",
        norm_epsilon=1e-5, use_bias=True, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=True,
        sliding_window=None, attention_dropout=0.0,
        residual_dropout=0.0, embedding_dropout=0.0)
    torch.manual_seed(4)
    hf = Starcoder2ForCausalLM(cfg).eval().float()
    d = tmp_path / "starcoder2"
    hf.save_pretrained(d, safe_serialization=True)
    _compare(hf, _llm(d))


@pytest.mark.parametrize("kind", ["7b_mqa", "40b_gqa", "rw_serial"])
def test_falcon_matches_hf(tmp_path, kind):
    from transformers import FalconConfig, FalconForCausalLM
    kw = dict(vocab_size=512, hidden_size=64, num_hidden_layers=3,
              num_attention_heads=4, layer_norm_epsilon=1e-5,
              bias=False, alibi=False, rope_theta=10000.0,
              max_position_embeddings=256, tie_word_embeddings=True,
              hidden_dropout=0.0, attention_dropout=0.0)
    if kind == "7b_mqa":
        kw.update(multi_query=True, parallel_attn=True,
                  new_decoder_architecture=False)
    elif kind == "40b_gqa":
        kw.update(multi_query=True, parallel_attn=True,
                  new_decoder_architecture=True, num_kv_heads=2)
    else:  # falcon-rw style: per-head fused qkv, serial residual
        kw.update(multi_query=False, parallel_attn=False,
                  new_decoder_architecture=False, bias=True)
    cfg = FalconConfig(**kw)
    torch.manual_seed(hash(kind) % 2**31)
    hf = FalconForCausalLM(cfg).eval().float()
    hf.generation_config.eos_token_id = None
    d = tmp_path / f"falcon_{kind}"
    hf.save_pretrained(d, safe_serialization=True)
    _compare(hf, _llm(d))
