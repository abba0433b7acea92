"""BLIP-2: ViT + Q-Former + language projection + OPT LM vs HF goldens
(reference models/blip2.py role)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tiny_blip2(tmp_path, seed=0):
    from transformers import Blip2Config, Blip2ForConditionalGeneration
    cfg = Blip2Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=16, patch_size=8),
        qformer_config=dict(hidden_size=24, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=48,
                            encoder_hidden_size=32,
                            cross_attention_frequency=2),
        text_config=dict(model_type="opt", vocab_size=128,
                         hidden_size=64, ffn_dim=96,
                         num_hidden_layers=2, num_attention_heads=2,
                         max_position_embeddings=128,
                         word_embed_proj_dim=64),
        num_query_tokens=4, image_token_index=127)
    torch.manual_seed(seed)
    hf = Blip2ForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "blip2"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, cfg


def test_blip2_matches_hf(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf, cfg = _tiny_blip2(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(0)
    improc = ImageProcessor(size=16)
    n_tok = 4  # num_query_tokens

    for trial in range(2):
        img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        pre = rng.integers(3, 126, int(rng.integers(2, 5))).tolist()
        post = rng.integers(3, 126, int(rng.integers(2, 5))).tolist()
        ids = pre + [127] + post
        expanded = pre + [127] * n_tok + post
        pix = improc(img)[None]
        with torch.no_grad():
            out = hf.generate(
                input_ids=torch.tensor([expanded]),
                pixel_values=torch.tensor(pix),
                max_new_tokens=8, do_sample=False, num_beams=1,
                min_new_tokens=8)
        exp = out[0, len(expanded):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": ids,
              "multi_modal_data": {"image": img}}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (trial, got, exp)
