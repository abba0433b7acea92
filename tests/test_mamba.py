"""Mamba-1 SSM vs HF goldens (reference models/mamba.py +
layers/mamba/ selective scan): recurrent per-row state serving."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_mamba(tmp_path, seed=0):
    from transformers import MambaConfig, MambaForCausalLM
    cfg = MambaConfig(vocab_size=256, hidden_size=64, state_size=8,
                      num_hidden_layers=2, conv_kernel=4, expand=2,
                      time_step_rank=8, use_bias=False,
                      use_conv_bias=True, tie_word_embeddings=True,
                      bos_token_id=0, eos_token_id=0, pad_token_id=0)
    torch.manual_seed(seed)
    hf = MambaForCausalLM(cfg).eval().float()
    hf.config.architectures = ["MambaForCausalLM"]
    d = tmp_path / "mamba"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, cfg


def test_mamba_matches_hf(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d, hf, cfg = _tiny_mamba(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(0)
    for trial in range(2):
        prompt = rng.integers(5, 250, int(rng.integers(4, 10))).tolist()
        with torch.no_grad():
            out = hf.generate(torch.tensor([prompt]), max_new_tokens=8,
                              do_sample=False, num_beams=1)
        exp = out[0, len(prompt):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (trial, got, exp)


def test_mamba_batched_and_condense(tmp_path):
    """Concurrent requests with different lengths (row moves on finish)
    match sequential results — recurrent states follow their rows."""
    from vllm_pq_tpu import LLM, SamplingParams
    d, hf, cfg = _tiny_mamba(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    prompts = [{"prompt_token_ids": [7, 8, 9, 10]},
               {"prompt_token_ids": [50, 51]},
               {"prompt_token_ids": [100, 101, 102]}]
    # different max_tokens so requests finish (and rows condense) at
    # different times
    sps = [SamplingParams(temperature=0.0, max_tokens=m, ignore_eos=True)
           for m in (4, 12, 8)]
    seq = [llm.generate([p], sp)[0].outputs[0].token_ids
           for p, sp in zip(prompts, sps)]
    both = llm.generate(prompts, sps)
    assert [o.outputs[0].token_ids for o in both] == seq


def test_falcon_mamba_matches_hf(tmp_path):
    """FalconMamba: weightless RMS on the dt/B/C selections."""
    from transformers import FalconMambaConfig, FalconMambaForCausalLM
    from vllm_pq_tpu import LLM, SamplingParams
    cfg = FalconMambaConfig(
        vocab_size=256, hidden_size=64, state_size=8,
        num_hidden_layers=2, conv_kernel=4, expand=2, time_step_rank=8,
        use_bias=False, use_conv_bias=True, tie_word_embeddings=True,
        bos_token_id=0, eos_token_id=0, pad_token_id=0)
    torch.manual_seed(1)
    hf = FalconMambaForCausalLM(cfg).eval().float()
    hf.config.architectures = ["FalconMambaForCausalLM"]
    d = tmp_path / "fmamba"
    hf.save_pretrained(d, safe_serialization=True)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(4)
    prompt = rng.integers(5, 250, 7).tolist()
    with torch.no_grad():
        out = hf.generate(torch.tensor([prompt]), max_new_tokens=8,
                          do_sample=False, num_beams=1)
    exp = out[0, len(prompt):].tolist()
    got = llm.generate(
        [{"prompt_token_ids": prompt}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (got, exp)


# ---------------------------------------------------------------------------
# Mamba-2 (SSD)
# ---------------------------------------------------------------------------


def _tiny_mamba2(tmp_path, seed=0):
    from transformers import Mamba2Config, Mamba2ForCausalLM
    cfg = Mamba2Config(vocab_size=256, hidden_size=64, state_size=16,
                       num_hidden_layers=2, conv_kernel=4, expand=2,
                       num_heads=4, head_dim=32, n_groups=2,
                       use_bias=False, use_conv_bias=True,
                       tie_word_embeddings=False,
                       bos_token_id=0, eos_token_id=0, pad_token_id=0,
                       time_step_limit=(0.0, float("inf")))
    torch.manual_seed(seed)
    hf = Mamba2ForCausalLM(cfg).eval().float()
    hf.config.architectures = ["Mamba2ForCausalLM"]
    d = tmp_path / "mamba2"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, cfg


def test_mamba2_matches_hf(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d, hf, cfg = _tiny_mamba2(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(3)
    for trial in range(2):
        prompt = rng.integers(5, 250, int(rng.integers(4, 10))).tolist()
        with torch.no_grad():
            out = hf.generate(torch.tensor([prompt]), max_new_tokens=8,
                              do_sample=False, num_beams=1)
        exp = out[0, len(prompt):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (trial, got, exp)


def test_mamba2_batched(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d, hf, cfg = _tiny_mamba2(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    prompts = [{"prompt_token_ids": [7, 8, 9, 10]},
               {"prompt_token_ids": [50, 51]}]
    seq = [llm.generate([p], sp)[0].outputs[0].token_ids
           for p in prompts]
    both = llm.generate(prompts, sp)
    assert [o.outputs[0].token_ids for o in both] == seq
