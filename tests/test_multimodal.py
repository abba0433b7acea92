"""Multimodal (LLaVA): CLIP tower + projector + placeholder splice vs
HF goldens; EncoderCacheManager budget logic (reference
tests/models/multimodal + v1/core/test_encoder_cache)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tiny_llava(tmp_path, seed=0):
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)
    vc = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=2,
                          image_size=16, patch_size=8)
    tc = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=96,
                     num_hidden_layers=2, num_attention_heads=2,
                     num_key_value_heads=2, max_position_embeddings=128,
                     tie_word_embeddings=False)
    cfg = LlavaConfig(vision_config=vc, text_config=tc,
                      image_token_index=127, vision_feature_layer=-2,
                      vision_feature_select_strategy="default")
    torch.manual_seed(seed)
    hf = LlavaForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "llava"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, cfg


def _llm(d, **kw):
    from vllm_pq_tpu import LLM
    args = dict(model=str(d), dtype="float32", max_model_len=128,
                max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
                num_kv_blocks=64, enable_prefix_caching=False)
    args.update(kw)
    return LLM(**args)


def _rand_image(rng, s=16):
    return rng.integers(0, 255, (s, s, 3)).astype(np.uint8)


def _hf_golden(hf, prompt_ids, pixel_values, n_new):
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt_ids]),
            pixel_values=torch.tensor(pixel_values),
            max_new_tokens=n_new, do_sample=False, num_beams=1,
            pad_token_id=0)
    return out[0, len(prompt_ids):].tolist()


def test_llava_matches_hf(tmp_path):
    from vllm_pq_tpu import SamplingParams
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf, cfg = _tiny_llava(tmp_path)
    llm = _llm(d)
    rng = np.random.default_rng(0)
    improc = ImageProcessor(size=16)
    n_img_tok = (16 // 8) ** 2  # 4

    for trial in range(3):
        img = _rand_image(rng)
        pre = rng.integers(1, 126, int(rng.integers(2, 8))).tolist()
        post = rng.integers(1, 126, int(rng.integers(2, 8))).tolist()
        ids = pre + [127] + post  # single placeholder, our side expands
        expanded = pre + [127] * n_img_tok + post
        pix = improc(img)[None]  # [1, 3, 16, 16]
        exp = _hf_golden(hf, expanded, pix, 8)
        got = llm.generate(
            [{"prompt_token_ids": ids,
              "multi_modal_data": {"image": img}}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (trial, got, exp)


def test_llava_chunked_prefill_across_image(tmp_path):
    """A chunk boundary inside the placeholder span must still splice
    the right embedding rows."""
    from vllm_pq_tpu import SamplingParams
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf, cfg = _tiny_llava(tmp_path, seed=1)
    # tiny budget: 6 tokens per step forces chunking mid-span
    llm = _llm(d, max_num_batched_tokens=16, max_num_seqs=1)
    # NOTE: bucket floor means chunks are >= smallest bucket; emulate
    # chunking by a long pre-span prompt instead
    rng = np.random.default_rng(7)
    img = _rand_image(rng)
    improc = ImageProcessor(size=16)
    pre = rng.integers(1, 126, 30).tolist()
    post = rng.integers(1, 126, 5).tolist()
    ids = pre + [127] + post
    expanded = pre + [127] * 4 + post
    exp = _hf_golden(hf, expanded, improc(img)[None], 6)
    got = llm.generate(
        [{"prompt_token_ids": ids, "multi_modal_data": {"image": img}}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp


def test_llava_two_images_batched(tmp_path):
    from vllm_pq_tpu import SamplingParams
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf, cfg = _tiny_llava(tmp_path, seed=2)
    llm = _llm(d)
    rng = np.random.default_rng(3)
    improc = ImageProcessor(size=16)
    im1, im2 = _rand_image(rng), _rand_image(rng)
    ids = [5, 6, 127, 9, 127, 11]
    expanded = [5, 6] + [127] * 4 + [9] + [127] * 4 + [11]
    pix = np.stack([improc(im1), improc(im2)])
    exp = _hf_golden(hf, expanded, pix, 6)
    got = llm.generate(
        [{"prompt_token_ids": ids,
          "multi_modal_data": {"image": [im1, im2]}}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp


def test_encoder_cache_manager():
    from vllm_pq_tpu.core.encoder_cache_manager import EncoderCacheManager
    from vllm_pq_tpu.multimodal import MMInput

    class R:
        def __init__(self, rid, spans):
            self.request_id = rid
            self.mm_inputs = [
                MMInput(offset=o, length=n,
                        pixel_values=np.zeros((3, 2, 2), np.float32))
                for o, n in spans]

    ecm = EncoderCacheManager(cache_size=10)
    r1 = R("a", [(0, 6), (10, 6)])
    assert ecm.can_allocate(r1, 0)
    ecm.allocate(r1, 0)
    assert ecm.has_cache(r1, 0)
    assert ecm.num_free_slots == 4
    # second span exceeds the remaining budget
    assert not ecm.can_allocate(r1, 1)
    ecm.free_encoder_input(r1, 0)
    assert ecm.num_free_slots == 10
    assert ecm.get_freed_ids() == [("a", 0)]
    assert ecm.get_freed_ids() == []
    ecm.allocate(r1, 1)
    ecm.free(r1)
    assert ecm.num_free_slots == 10
    assert ("a", 1) in ecm.get_freed_ids()


def test_encoder_budget_defers_scheduling(tmp_path):
    """With a budget smaller than two images, the second image waits
    until the first span is consumed — output must still be exact."""
    from vllm_pq_tpu import SamplingParams
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf, cfg = _tiny_llava(tmp_path, seed=4)
    llm = _llm(d)
    # shrink the budget to one 4-token image at a time
    llm.llm_engine.engine_core.scheduler.encoder_cache_manager \
        .cache_size = 4
    llm.llm_engine.engine_core.scheduler.encoder_cache_manager \
        .num_free_slots = 4
    rng = np.random.default_rng(5)
    improc = ImageProcessor(size=16)
    im1, im2 = _rand_image(rng), _rand_image(rng)
    ids = [5, 127, 9, 127, 11]
    expanded = [5] + [127] * 4 + [9] + [127] * 4 + [11]
    pix = np.stack([improc(im1), improc(im2)])
    exp = _hf_golden(hf, expanded, pix, 6)
    got = llm.generate(
        [{"prompt_token_ids": ids,
          "multi_modal_data": {"image": [im1, im2]}}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp
