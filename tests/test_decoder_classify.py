"""Decoder sequence-classification / reward heads (role of reference
as_seqcls_model + models/qwen2_rm.py): HF-golden logits parity for
*ForSequenceClassification, dummy coverage for the reward-MLP head."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_cfg(cls, **kw):
    return cls(vocab_size=512, hidden_size=128, intermediate_size=256,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, max_position_embeddings=512,
               num_labels=3, pad_token_id=0, **kw)


@pytest.mark.parametrize("family", ["qwen2", "llama"])
def test_seqcls_matches_hf(tmp_path, family):
    if family == "qwen2":
        from transformers import (Qwen2Config,
                                  Qwen2ForSequenceClassification)
        cfg = _tiny_cfg(Qwen2Config)
        torch.manual_seed(0)
        hf = Qwen2ForSequenceClassification(cfg).eval().float()
    else:
        from transformers import (LlamaConfig,
                                  LlamaForSequenceClassification)
        cfg = _tiny_cfg(LlamaConfig)
        torch.manual_seed(0)
        hf = LlamaForSequenceClassification(cfg).eval().float()
    d = tmp_path / family
    hf.save_pretrained(d, safe_serialization=True)

    from vllm_pq_tpu import LLM
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(5, 500, int(rng.integers(3, 20))).tolist()
               for _ in range(3)]
    ours = llm.classify([{"prompt_token_ids": p} for p in prompts])
    for p, got in zip(prompts, ours):
        with torch.no_grad():
            want = hf(torch.tensor([p])).logits[0].numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)


def test_reward_mlp_head_dummy(tmp_path):
    cfg = {
        "architectures": ["Qwen2ForRewardModel"],
        "vocab_size": 512, "hidden_size": 128, "intermediate_size": 256,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "num_key_value_heads": 2, "max_position_embeddings": 512,
    }
    d = tmp_path / "rm"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    from vllm_pq_tpu import LLM
    llm = LLM(model=str(d), load_format="dummy", dtype="float32",
              max_model_len=128, max_num_seqs=4,
              max_num_batched_tokens=128, block_size=16, num_kv_blocks=64)
    out = llm.classify([{"prompt_token_ids": [5, 6, 7]}])
    assert np.asarray(out[0]).shape == (1,)
    # deterministic
    out2 = llm.classify([{"prompt_token_ids": [5, 6, 7]}])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]))
