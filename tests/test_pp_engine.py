"""Pipeline parallelism wired into the serving loop: LLM with
--pipeline-parallel-size must match HF goldens and the pp=1 engine
exactly (GPipe SPMD program, parallel/pipeline.py; reference PP =
layer-range partitioning + send/recv)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _save_tiny_llama(tmp_path, n_layers=2, seed=0):
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=96, num_hidden_layers=n_layers,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=256,
                      tie_word_embeddings=False)
    torch.manual_seed(seed)
    hf = LlamaForCausalLM(cfg).eval().float()
    d = tmp_path / "llama_pp"
    hf.save_pretrained(d, safe_serialization=True)
    # goldens run with ignore_eos on our side; stop HF stopping early
    hf.generation_config.eos_token_id = None
    return d, hf


def _llm(d, pp, tp=1, **kw):
    from vllm_pq_tpu import LLM
    args = dict(model=str(d), dtype="float32", max_model_len=128,
                max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
                num_kv_blocks=64, enable_prefix_caching=False,
                pipeline_parallel_size=pp, tensor_parallel_size=tp)
    args.update(kw)
    return LLM(**args)


def test_pp2_matches_hf(tmp_path, cpu_devices):
    from vllm_pq_tpu import SamplingParams
    d, hf = _save_tiny_llama(tmp_path)
    llm = _llm(d, pp=2)
    rng = np.random.default_rng(0)
    for trial in range(3):
        prompts = [rng.integers(3, 250, int(rng.integers(3, 20))).tolist()
                   for _ in range(int(rng.integers(1, 4)))]
        outs = llm.generate(
            [{"prompt_token_ids": p} for p in prompts],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))
        for p, o in zip(prompts, outs):
            exp = hf.generate(torch.tensor([p]), max_new_tokens=8,
                              do_sample=False, num_beams=1,
                              pad_token_id=0)[0, len(p):].tolist()
            assert o.outputs[0].token_ids == exp, (trial, p)


def test_pp2_tp2_matches_hf(tmp_path, cpu_devices):
    from vllm_pq_tpu import SamplingParams
    d, hf = _save_tiny_llama(tmp_path, n_layers=4, seed=1)
    llm = _llm(d, pp=2, tp=2)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(3, 250, n).tolist() for n in (5, 11, 7)]
    outs = llm.generate(
        [{"prompt_token_ids": p} for p in prompts],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    for p, o in zip(prompts, outs):
        exp = hf.generate(torch.tensor([p]), max_new_tokens=8,
                          do_sample=False, num_beams=1,
                          pad_token_id=0)[0, len(p):].tolist()
        assert o.outputs[0].token_ids == exp


def test_pp_sampling_and_logprobs(tmp_path, cpu_devices):
    """Seeded sampling + logprobs run through the PP sampling tail."""
    from vllm_pq_tpu import SamplingParams
    d, _ = _save_tiny_llama(tmp_path, seed=3)
    llm = _llm(d, pp=2)
    sp = SamplingParams(temperature=0.8, seed=11, max_tokens=6,
                        ignore_eos=True, logprobs=2)
    a = llm.generate(["hello"], sp)[0].outputs[0]
    b = llm.generate(["hello"], sp)[0].outputs[0]
    assert a.token_ids == b.token_ids  # seeded determinism
    assert a.logprobs and len(a.logprobs) == 6


def test_pp_rejects_unsupported_features(tmp_path, cpu_devices):
    d, _ = _save_tiny_llama(tmp_path, seed=4)
    with pytest.raises(Exception, match="pipeline parallelism"):
        _llm(d, pp=2, num_scheduler_steps=4)
