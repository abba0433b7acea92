"""Aria vs HF goldens (reference models/aria.py role): grouped-expert
MoE decoder + idefics3 tower + learned-query cross-attn projector."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VSIZE, PATCH = 28, 14  # 4 patches -> 2 queries (patch_to_query {4: 2})


def _tiny_aria(tmp_path):
    from transformers import (AriaConfig, AriaForConditionalGeneration,
                              AriaTextConfig, Idefics3VisionConfig)
    torch.manual_seed(0)
    tc = AriaTextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=16,
        num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=1, moe_num_experts=4, moe_topk=2,
        moe_num_shared_experts=2, max_position_embeddings=128,
        pad_token_id=0)
    vc = Idefics3VisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=2,
                              image_size=VSIZE, patch_size=PATCH)
    cfg = AriaConfig(text_config=tc, vision_config=vc,
                     image_token_index=9,
                     projector_patch_to_query_dict={4: 2})
    hf = AriaForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "aria"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _llm(d):
    from vllm_pq_tpu import LLM
    return LLM(model=str(d), dtype="float32", max_model_len=64,
               max_num_seqs=2, max_num_batched_tokens=64, block_size=16,
               num_kv_blocks=32, enable_prefix_caching=False)


def test_aria_text_matches_hf(tmp_path):
    from vllm_pq_tpu import SamplingParams
    d, hf = _tiny_aria(tmp_path)
    llm = _llm(d)
    rng = np.random.default_rng(12)
    for trial in range(2):
        prompt = rng.integers(10, 120, 6).tolist()
        with torch.no_grad():
            out = hf.generate(torch.tensor([prompt]), max_new_tokens=8,
                              do_sample=False, num_beams=1,
                              pad_token_id=0)
        exp = out[0, len(prompt):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (trial, got, exp)


def test_aria_image_matches_hf(tmp_path):
    from vllm_pq_tpu import SamplingParams
    d, hf = _tiny_aria(tmp_path)
    llm = _llm(d)
    rng = np.random.default_rng(13)
    px = rng.standard_normal((1, 3, VSIZE, VSIZE)).astype(np.float32)
    pre = [3, 11]
    post = [21, 17]
    n_img = 2  # 4 patches -> 2 queries
    expanded = pre + [9] * n_img + post
    with torch.no_grad():
        mask = torch.ones((1, VSIZE // PATCH, VSIZE // PATCH),
                          dtype=torch.bool)
        out = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(px),
            pixel_mask=None,
            max_new_tokens=8, do_sample=False, num_beams=1,
            pad_token_id=0)
    exp = out[0, len(expanded):].tolist()
    got = llm.generate(
        [{"prompt_token_ids": pre + [9] + post,
          "multi_modal_data": {"image": {"pixel_values": px[0]}}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (got, exp)
