"""Jamba hybrid attention/Mamba + MoE vs HF goldens (reference
models/jamba.py): exercises the runner's per-layer hybrid cache
allocation (paged KV for attention layers, recurrent rows for mamba
layers)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_jamba(tmp_path, seed=0):
    from transformers import JambaConfig, JambaForCausalLM
    cfg = JambaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2,
        attn_layer_period=2, attn_layer_offset=1,
        expert_layer_period=2, expert_layer_offset=0,
        num_experts=2, num_experts_per_tok=2,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        mamba_dt_rank=8, use_mamba_kernels=False,
        tie_word_embeddings=False,
        bos_token_id=0, eos_token_id=0, pad_token_id=0)
    torch.manual_seed(seed)
    hf = JambaForCausalLM(cfg).eval().float()
    hf.config.architectures = ["JambaForCausalLM"]
    d = tmp_path / "jamba"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, cfg


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("jamba")
    return _tiny_jamba(tmp)


def _mk_llm(d):
    from vllm_pq_tpu import LLM
    return LLM(model=str(d), dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
               num_kv_blocks=32, enable_prefix_caching=False)


def test_jamba_matches_hf(setup):
    from vllm_pq_tpu import SamplingParams
    d, hf, cfg = setup
    llm = _mk_llm(d)
    runner = llm.llm_engine.engine_core.runner
    assert runner.cache_kinds == ["ssm", "kv", "ssm", "kv"]
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


def test_jamba_batched_and_condense(setup):
    """Mixed-length concurrent requests: recurrent rows follow their
    batch rows through condense; paged KV follows block tables."""
    from vllm_pq_tpu import SamplingParams
    d, hf, cfg = setup
    llm = _mk_llm(d)
    prompts = [{"prompt_token_ids": [7, 8, 9, 10]},
               {"prompt_token_ids": [50, 51]},
               {"prompt_token_ids": [100, 101, 102]}]
    sps = [SamplingParams(temperature=0.0, max_tokens=m, ignore_eos=True)
           for m in (4, 12, 8)]
    seq = [llm.generate([p], sp)[0].outputs[0].token_ids
           for p, sp in zip(prompts, sps)]
    outs = llm.generate(prompts, sps)
    assert [o.outputs[0].token_ids for o in outs] == seq


def test_bamba_matches_hf(tmp_path):
    """Bamba (hybrid Mamba-2 / attention, reference models/bamba.py
    role): HF-golden token-exact through mixed ssm/kv layer caches."""
    import numpy as np
    import torch
    from transformers import BambaConfig, BambaForCausalLM
    cfg = BambaConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=3,
                      num_attention_heads=4, num_key_value_heads=2,
                      attn_layer_indices=[1], mamba_n_heads=8,
                      mamba_d_head=16, mamba_n_groups=1,
                      mamba_d_state=32, mamba_d_conv=4, mamba_expand=2,
                      pad_token_id=0, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = BambaForCausalLM(cfg).eval().float()
    d = tmp_path / "bamba"
    hf.save_pretrained(d, safe_serialization=True)

    from vllm_pq_tpu import LLM, SamplingParams
    llm = LLM(model=str(d), dtype="float32", max_model_len=96,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64)
    rng = np.random.default_rng(4)
    for trial in range(3):
        prompt = rng.integers(3, 250, int(rng.integers(4, 16))).tolist()
        with torch.no_grad():
            exp = hf.generate(
                torch.tensor([prompt]), max_new_tokens=10,
                do_sample=False, num_beams=1,
                pad_token_id=0)[0, len(prompt):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(temperature=0.0, max_tokens=10,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (trial, got, exp)
