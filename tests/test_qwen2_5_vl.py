"""Qwen2.5-VL: windowed ViT (window reorder + masks), RMSNorm/SwiGLU
blocks vs HF goldens (reference models/qwen2_5_vl.py role)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_qwen25vl(tmp_path, seed=0):
    from transformers import (Qwen2_5_VLConfig,
                              Qwen2_5_VLForConditionalGeneration)
    cfg = Qwen2_5_VLConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        image_token_id=250, video_token_id=251,
        vision_start_token_id=248, tie_word_embeddings=False,
        vision_config=dict(depth=2, hidden_size=32, num_heads=2,
                           intermediate_size=64, in_chans=3,
                           patch_size=4, temporal_patch_size=2,
                           spatial_merge_size=2, window_size=16,
                           fullatt_block_indexes=[1],
                           out_hidden_size=64, hidden_act="silu"))
    torch.manual_seed(seed)
    hf = Qwen2_5_VLForConditionalGeneration(cfg).eval().float()
    hf.config.architectures = ["Qwen2_5_VLForConditionalGeneration"]
    d = tmp_path / "qwen25vl"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, cfg


def _llm(d, **kw):
    from vllm_pq_tpu import LLM
    args = dict(model=str(d), dtype="float32", max_model_len=160,
                max_num_seqs=4, max_num_batched_tokens=160, block_size=16,
                num_kv_blocks=64, enable_prefix_caching=False)
    args.update(kw)
    return LLM(**args)


def test_qwen25vl_text_only_matches_hf(tmp_path):
    from vllm_pq_tpu import SamplingParams
    d, hf, cfg = _tiny_qwen25vl(tmp_path)
    llm = _llm(d)
    rng = np.random.default_rng(2)
    prompt = rng.integers(5, 240, 9).tolist()
    with torch.no_grad():
        out = hf.generate(torch.tensor([prompt]), max_new_tokens=8,
                          do_sample=False, num_beams=1, pad_token_id=0)
    exp = out[0, len(prompt):].tolist()
    got = llm.generate(
        [{"prompt_token_ids": prompt}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (got, exp)


@pytest.mark.parametrize("img_hw", [(32, 32), (32, 16)])
def test_qwen25vl_image_matches_hf(tmp_path, img_hw):
    """32x32 -> 4x4 merged grid with four 2x2 windows: exercises the
    window reorder, the window/frame masks, and the inverse permute."""
    from transformers import Qwen2VLImageProcessor
    from vllm_pq_tpu import SamplingParams
    d, hf, cfg = _tiny_qwen25vl(tmp_path)
    llm = _llm(d)
    rng = np.random.default_rng(3)
    proc = Qwen2VLImageProcessor(
        patch_size=4, temporal_patch_size=2, merge_size=2,
        min_pixels=8 * 8, max_pixels=64 * 64, do_resize=False)
    img = rng.integers(0, 255, (*img_hw, 3)).astype(np.uint8)
    enc = proc(images=[img], return_tensors="np")
    pv = enc["pixel_values"]
    grid = enc["image_grid_thw"][0]
    t, gh, gw = (int(x) for x in grid)
    n_tok = t * (gh // 2) * (gw // 2)

    pre = rng.integers(5, 240, 4).tolist()
    post = rng.integers(5, 240, 5).tolist()
    expanded = pre + [250] * n_tok + post
    with torch.no_grad():
        out = hf.generate(
            torch.tensor([expanded]),
            pixel_values=torch.tensor(pv, dtype=torch.float32),
            image_grid_thw=torch.tensor([grid]),
            max_new_tokens=8, do_sample=False, num_beams=1,
            pad_token_id=0)
    exp = out[0, len(expanded):].tolist()
    got = llm.generate(
        [{"prompt_token_ids": pre + [250] + post,
          "multi_modal_data": {"image": img}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (img_hw, got, exp)
