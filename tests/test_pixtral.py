"""Pixtral vision tower inside the LLaVA composite vs HF goldens
(reference models/pixtral.py PixtralHFVisionModel): RoPE-2D ViT,
bias-free projections, SwiGLU blocks, no CLS token."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tiny_pixtral_llava(tmp_path, seed=0):
    from transformers import (LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration,
                              PixtralVisionConfig)
    vc = PixtralVisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=2,
                             image_size=16, patch_size=8, head_dim=16,
                             rope_theta=10000.0)
    tc = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=96,
                     num_hidden_layers=2, num_attention_heads=2,
                     num_key_value_heads=2, max_position_embeddings=128,
                     tie_word_embeddings=False)
    cfg = LlavaConfig(vision_config=vc, text_config=tc,
                      image_token_index=127, vision_feature_layer=-1,
                      vision_feature_select_strategy="full")
    torch.manual_seed(seed)
    hf = LlavaForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "pixtral"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def test_pixtral_llava_matches_hf(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf = _tiny_pixtral_llava(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    rng = np.random.default_rng(0)
    improc = ImageProcessor(size=16)
    n_img_tok = (16 // 8) ** 2  # 4 patches, no CLS

    for trial in range(3):
        img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        pre = rng.integers(1, 126, int(rng.integers(2, 8))).tolist()
        post = rng.integers(1, 126, int(rng.integers(2, 8))).tolist()
        ids = pre + [127] + post
        expanded = pre + [127] * n_img_tok + post
        pix = improc(img)[None]
        with torch.no_grad():
            exp = hf.generate(
                input_ids=torch.tensor([expanded]),
                pixel_values=torch.tensor(pix),
                max_new_tokens=8, do_sample=False, num_beams=1,
                pad_token_id=0)[0, len(expanded):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": ids,
              "multi_modal_data": {"image": img}}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (trial, got, exp)


def test_pixtral_tower_features_match_hf(tmp_path):
    """Tower-level check: projected features equal HF's
    get_image_features (tight tolerance isolates the RoPE-2D math)."""
    import jax
    from vllm_pq_tpu import LLM
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf = _tiny_pixtral_llava(tmp_path, seed=1)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64)
    runner = llm.llm_engine.engine_core.runner
    model = runner.model
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    pix = ImageProcessor(size=16)(img)[None]
    ours = np.asarray(jax.device_get(model.encode_images(
        jax.device_get(runner.params)["vision"],
        np.asarray(pix, np.float32))))[0]
    with torch.no_grad():
        want = hf.get_image_features(
            pixel_values=torch.tensor(pix),
            image_sizes=torch.tensor([[16, 16]]))
        want = (want[0] if isinstance(want, (list, tuple))
                else want[0] if want.ndim == 3 else want).numpy()
    np.testing.assert_allclose(ours, want.reshape(ours.shape),
                               rtol=2e-4, atol=2e-4)
