"""LLaVA-OneVision: SigLIP anyres_max image grids + pooled video frames
vs HF goldens (reference models/llava_onevision.py role)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VSIZE, PATCH = 16, 8  # side = 2 feature cells per crop


def _tiny_onevision(tmp_path, pinpoints, max_patches=9):
    from transformers import (LlavaOnevisionConfig,
                              LlavaOnevisionForConditionalGeneration,
                              Qwen2Config, SiglipVisionConfig)
    vc = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=VSIZE, patch_size=PATCH)
    tc = Qwen2Config(vocab_size=128, hidden_size=64,
                     intermediate_size=96, num_hidden_layers=2,
                     num_attention_heads=2, num_key_value_heads=1,
                     max_position_embeddings=512,
                     tie_word_embeddings=False)
    cfg = LlavaOnevisionConfig(
        vision_config=vc.to_dict(), text_config=tc.to_dict(),
        image_grid_pinpoints=pinpoints, image_token_index=126,
        video_token_index=127,
        vision_aspect_ratio=f"anyres_max_{max_patches}")
    torch.manual_seed(0)
    hf = LlavaOnevisionForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "onevision"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _llm(d):
    from vllm_pq_tpu import LLM
    return LLM(model=str(d), dtype="float32", max_model_len=256,
               max_num_seqs=2, max_num_batched_tokens=256, block_size=16,
               num_kv_blocks=64, enable_prefix_caching=False)


@pytest.mark.parametrize("orig_hw,max_patches",
                         [((20, 32), 9),   # no downscale
                          ((32, 32), 1)])  # ratio > 1.1 -> bilinear cap
def test_onevision_image_matches_hf(tmp_path, orig_hw, max_patches):
    from vllm_pq_tpu import SamplingParams
    from vllm_pq_tpu.models.llava_onevision import onevision_feature_span
    from vllm_pq_tpu.multimodal.llava_next import anyres_grid_shape
    pinpoints = [[2 * VSIZE, 2 * VSIZE]]
    d, hf = _tiny_onevision(tmp_path, pinpoints, max_patches)
    llm = _llm(d)
    nph, npw = anyres_grid_shape(orig_hw, pinpoints, VSIZE)
    n_crops = nph * npw + 1
    rng = np.random.default_rng(1)
    px = rng.standard_normal((n_crops, 3, VSIZE, VSIZE)) \
        .astype(np.float32)
    span = onevision_feature_span(orig_hw, pinpoints, VSIZE, PATCH,
                                  max_patches)
    pre = rng.integers(1, 125, 4).tolist()
    post = rng.integers(1, 125, 3).tolist()
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
    assert got == exp, (orig_hw, span, got, exp)


def test_onevision_video_matches_hf(tmp_path):
    from vllm_pq_tpu import SamplingParams
    from vllm_pq_tpu.models.llava_onevision import onevision_video_span
    pinpoints = [[2 * VSIZE, 2 * VSIZE]]
    d, hf = _tiny_onevision(tmp_path, pinpoints)
    llm = _llm(d)
    rng = np.random.default_rng(2)
    frames = 3
    px = rng.standard_normal((frames, 3, VSIZE, VSIZE)).astype(np.float32)
    span = onevision_video_span(frames, VSIZE, PATCH)
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
