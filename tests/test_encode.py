"""Pooled embeddings (LLM.encode / /v1/embeddings role)."""

import json

import numpy as np
import pytest

TINY = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 512,
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "num_key_value_heads": 2,
    "max_position_embeddings": 512,
}


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_enc_model")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    from vllm_pq_tpu import LLM
    return LLM(model=str(d), load_format="dummy", dtype="float32",
               max_model_len=128, max_num_seqs=8,
               max_num_batched_tokens=128, block_size=16, num_kv_blocks=64)


def test_encode_shapes_and_determinism(llm):
    embs = llm.encode([{"prompt_token_ids": [5, 6, 7, 8]},
                       {"prompt_token_ids": [9, 10]}])
    assert len(embs) == 2
    assert embs[0].shape == (128,)
    # guard against NaN poisoning (OOB page gather fills NaN on CPU;
    # assert_allclose alone treats NaN == NaN as equal)
    assert all(np.isfinite(e).all() for e in embs)
    embs2 = llm.encode([{"prompt_token_ids": [5, 6, 7, 8]}])
    np.testing.assert_allclose(embs[0], embs2[0], rtol=1e-5)
    # different prompts -> different embeddings
    assert not np.allclose(embs[0], embs[1])


def test_encode_mean_pool_differs(llm):
    a = llm.encode([{"prompt_token_ids": [5, 6, 7, 8]}])[0]
    b = llm.encode([{"prompt_token_ids": [5, 6, 7, 8]}],
                   pooling_type="mean")[0]
    assert not np.allclose(a, b)


def test_encode_does_not_disturb_generation(llm):
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    p = [{"prompt_token_ids": [7, 8, 9]}]
    ref = llm.generate(p, sp)[0].outputs[0].token_ids
    llm.encode([{"prompt_token_ids": [100, 101, 102]}])
    got = llm.generate(p, sp)[0].outputs[0].token_ids
    assert got == ref


def test_bare_model_arch_encodes(tmp_path):
    """Bare-model registry rows (LlamaModel/Qwen2Model) serve the
    embedding role (reference pooling-model rows)."""
    import json
    cfg = dict(TINY, architectures=["Qwen2Model"])
    d = tmp_path / "bare"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    from vllm_pq_tpu import LLM
    llm2 = LLM(model=str(d), load_format="dummy", dtype="float32",
               max_model_len=128, max_num_seqs=4,
               max_num_batched_tokens=128, block_size=16,
               num_kv_blocks=64)
    e = llm2.encode([{"prompt_token_ids": [5, 6, 7]}])
    assert np.isfinite(e[0]).all() and e[0].shape == (128,)
