"""LLaVA-NeXT-Video: anyres images + average-pooled video frames vs HF
goldens (reference models/llava_next_video.py role)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VSIZE, PATCH = 16, 4  # side = 4 cells -> pooled 2x2 per frame


def _tiny_next_video(tmp_path):
    from transformers import (CLIPVisionConfig, LlamaConfig,
                              LlavaNextVideoConfig,
                              LlavaNextVideoForConditionalGeneration)
    vc = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=2,
                          image_size=VSIZE, patch_size=PATCH)
    tc = LlamaConfig(vocab_size=128, hidden_size=64,
                     intermediate_size=96, num_hidden_layers=2,
                     num_attention_heads=2, num_key_value_heads=1,
                     max_position_embeddings=256,
                     tie_word_embeddings=False)
    cfg = LlavaNextVideoConfig(
        vision_config=vc.to_dict(), text_config=tc.to_dict(),
        image_grid_pinpoints=[[2 * VSIZE, 2 * VSIZE]],
        image_token_index=126, video_token_index=127,
        spatial_pool_mode="average", spatial_pool_stride=2)
    torch.manual_seed(0)
    hf = LlavaNextVideoForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "next_video"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def test_next_video_matches_hf(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.models.llava_next_video import next_video_span
    d, hf = _tiny_next_video(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    rng = np.random.default_rng(3)
    frames = 2
    px = rng.standard_normal((frames, 3, VSIZE, VSIZE)).astype(np.float32)
    span = next_video_span(frames, VSIZE, PATCH)
    pre = [5, 9, 30]
    post = [40, 2]
    expanded = pre + [127] * span + post
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values_videos=torch.tensor(px[None]),
            max_new_tokens=8, do_sample=False, num_beams=1,
            pad_token_id=0)
    exp = out[0, len(expanded):].tolist()
    got = llm.generate(
        [{"prompt_token_ids": pre + [127] + post,
          "multi_modal_data": {"video": {"pixel_values": px}}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (span, got, exp)


def test_next_video_image_matches_hf(tmp_path):
    """The inherited anyres image path still matches through the video
    model class."""
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.multimodal.llava_next import (anyres_grid_shape,
                                                   feature_span)
    d, hf = _tiny_next_video(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    pinpoints = [[2 * VSIZE, 2 * VSIZE]]
    orig_hw = (20, 32)
    nph, npw = anyres_grid_shape(orig_hw, pinpoints, VSIZE)
    rng = np.random.default_rng(4)
    px = rng.standard_normal((nph * npw + 1, 3, VSIZE, VSIZE)) \
        .astype(np.float32)
    span = feature_span(orig_hw, pinpoints, VSIZE, PATCH)
    pre = [7, 11]
    post = [23, 2, 9]
    expanded = pre + [126] * span + post
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(px[None]),
            image_sizes=torch.tensor([list(orig_hw)]),
            max_new_tokens=8, do_sample=False, num_beams=1,
            pad_token_id=0)
    exp = out[0, len(expanded):].tolist()
    got = llm.generate(
        [{"prompt_token_ids": pre + [126] + post,
          "multi_modal_data": {"image": {"pixel_values": px,
                                         "image_size": orig_hw}}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (span, got, exp)
