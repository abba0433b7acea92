"""Mllama (Llama-3.2-Vision) vs HF goldens (reference
models/mllama.py): two-stage tiled vision encoder + tanh-gated
cross-attention decoder, image-position-gated visibility."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

IMG_TOK = 128  # first extra embed row past the tiny 128-token vocab


def _tiny_mllama(tmp_path, seed=0):
    from transformers import (MllamaConfig,
                              MllamaForConditionalGeneration)
    from transformers.models.mllama.configuration_mllama import (
        MllamaTextConfig, MllamaVisionConfig)
    vc = MllamaVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_global_layers=1, attention_heads=2, image_size=16,
        patch_size=8, max_num_tiles=1, intermediate_layers_indices=[1],
        vision_output_dim=64, supported_aspect_ratios=[[1, 1]])
    tc = MllamaTextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, cross_attention_layers=[1, 3],
        max_position_embeddings=256, rope_theta=10000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 128},
        tie_word_embeddings=False, pad_token_id=0)
    cfg = MllamaConfig(vision_config=vc, text_config=tc,
                       image_token_index=IMG_TOK)
    torch.manual_seed(seed)
    hf = MllamaForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "mllama"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _hf_golden(hf, prompt_ids, pix, n_new):
    ids = torch.tensor([prompt_ids])
    img_pos = prompt_ids.index(IMG_TOK)
    # cross_attention_mask [B, len, num_images, num_tiles]: tokens at or
    # after the image token attend to it
    cam = torch.zeros(1, len(prompt_ids), 1, 1)
    cam[0, img_pos:] = 1.0
    with torch.no_grad():
        out = hf.generate(
            input_ids=ids,
            pixel_values=torch.tensor(pix)[None, None],  # [B,1,T,3,H,W]
            aspect_ratio_ids=torch.tensor([[1]]),
            aspect_ratio_mask=torch.tensor([[[1]]]),
            cross_attention_mask=cam,
            max_new_tokens=n_new, do_sample=False, num_beams=1,
            pad_token_id=0)
    return out[0, len(prompt_ids):].tolist()


def test_mllama_matches_hf(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf = _tiny_mllama(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    rng = np.random.default_rng(0)
    improc = ImageProcessor(size=16)

    for trial in range(3):
        img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        # image-first (standard) and mid-prompt placements
        pre = ([] if trial == 0
               else rng.integers(1, 126, int(rng.integers(2, 6))).tolist())
        post = rng.integers(1, 126, int(rng.integers(2, 8))).tolist()
        ids = pre + [IMG_TOK] + post
        pix = improc(img)[None]  # [1, 3, 16, 16] = [tiles, ...]
        exp = _hf_golden(hf, ids, pix, 8)
        got = llm.generate(
            [{"prompt_token_ids": ids,
              "multi_modal_data": {"image": img}}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (trial, got, exp)


def test_mllama_batch_mixed_image_positions(tmp_path):
    """Two requests with different image offsets decode together; the
    per-row enc_pos gating keeps each token-exact."""
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf = _tiny_mllama(tmp_path, seed=2)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    rng = np.random.default_rng(5)
    improc = ImageProcessor(size=16)
    imgs = [rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
            for _ in range(2)]
    prompts = [[IMG_TOK] + rng.integers(1, 126, 5).tolist(),
               rng.integers(1, 126, 4).tolist() + [IMG_TOK, 7, 9]]
    exps = [_hf_golden(hf, p, improc(im)[None], 6)
            for p, im in zip(prompts, imgs)]
    outs = llm.generate(
        [{"prompt_token_ids": p, "multi_modal_data": {"image": im}}
         for p, im in zip(prompts, imgs)],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    for o, exp in zip(outs, exps):
        assert o.outputs[0].token_ids == exp
