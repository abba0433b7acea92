"""Idefics3/SmolVLM: SigLIP tower + pixel-shuffle connector + Llama LM
vs HF goldens (reference models/idefics3.py role)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tiny_idefics3(tmp_path, seed=0):
    from transformers import (Idefics3Config,
                              Idefics3ForConditionalGeneration,
                              Idefics3VisionConfig, LlamaConfig)
    vc = Idefics3VisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=2,
                              image_size=16, patch_size=4)
    tc = LlamaConfig(vocab_size=128, hidden_size=64,
                     intermediate_size=96, num_hidden_layers=2,
                     num_attention_heads=2, num_key_value_heads=2,
                     max_position_embeddings=128,
                     tie_word_embeddings=False)
    cfg = Idefics3Config(vision_config=vc, text_config=tc,
                         image_token_id=127, scale_factor=2)
    torch.manual_seed(seed)
    hf = Idefics3ForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "idefics3"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, cfg


def test_idefics3_matches_hf(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf, cfg = _tiny_idefics3(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    rng = np.random.default_rng(0)
    improc = ImageProcessor(size=16)
    # (16/4)^2 = 16 patches; scale_factor 2 -> 4 tokens/image
    n_img_tok = 4

    for trial in range(2):
        img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        pre = rng.integers(1, 126, int(rng.integers(2, 6))).tolist()
        post = rng.integers(1, 126, int(rng.integers(2, 6))).tolist()
        ids = pre + [127] + post
        expanded = pre + [127] * n_img_tok + post
        pix = improc(img)[None, None]  # [B=1, num_images=1, 3, H, W]
        with torch.no_grad():
            out = hf.generate(
                input_ids=torch.tensor([expanded]),
                pixel_values=torch.tensor(pix),
                max_new_tokens=8, do_sample=False, num_beams=1,
                pad_token_id=0)
        exp = out[0, len(expanded):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": ids,
              "multi_modal_data": {"image": img}}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (trial, got, exp)
