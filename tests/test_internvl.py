"""InternVL: InternViT tower + pixel-shuffle + LN/MLP projector +
Qwen2 LM vs HF goldens (reference models/internvl.py role)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tiny_internvl(tmp_path, seed=0, use_qk_norm=False,
                   norm_type="layer_norm"):
    from transformers import (InternVLConfig,
                              InternVLForConditionalGeneration,
                              InternVLVisionConfig, Qwen2Config)
    vc = InternVLVisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=2,
                              image_size=[16, 16], patch_size=[4, 4],
                              use_qk_norm=use_qk_norm,
                              norm_type=norm_type)
    tc = Qwen2Config(vocab_size=128, hidden_size=64, intermediate_size=96,
                     num_hidden_layers=2, num_attention_heads=2,
                     num_key_value_heads=1, max_position_embeddings=128,
                     tie_word_embeddings=False)
    cfg = InternVLConfig(vision_config=vc, text_config=tc,
                         image_token_id=127, downsample_ratio=0.5)
    torch.manual_seed(seed)
    hf = InternVLForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "internvl"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, cfg


def _llm(d, **kw):
    from vllm_pq_tpu import LLM
    args = dict(model=str(d), dtype="float32", max_model_len=128,
                max_num_seqs=4, max_num_batched_tokens=128,
                block_size=16, num_kv_blocks=64,
                enable_prefix_caching=False)
    args.update(kw)
    return LLM(**args)


def _hf_golden(hf, prompt_ids, pixel_values, n_new):
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt_ids]),
            pixel_values=torch.tensor(pixel_values),
            max_new_tokens=n_new, do_sample=False, num_beams=1,
            pad_token_id=0)
    return out[0, len(prompt_ids):].tolist()


@pytest.mark.parametrize("qk_norm,norm_type",
                         [(False, "layer_norm"), (True, "rms_norm")])
def test_internvl_matches_hf(tmp_path, qk_norm, norm_type):
    from vllm_pq_tpu import SamplingParams
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf, cfg = _tiny_internvl(tmp_path, use_qk_norm=qk_norm,
                                norm_type=norm_type)
    llm = _llm(d)
    rng = np.random.default_rng(0)
    improc = ImageProcessor(size=16)
    # (16/4)^2 = 16 patches; downsample 0.5 -> 4 tokens/image
    n_img_tok = 4

    for trial in range(2):
        img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        pre = rng.integers(1, 126, int(rng.integers(2, 6))).tolist()
        post = rng.integers(1, 126, int(rng.integers(2, 6))).tolist()
        ids = pre + [127] + post
        expanded = pre + [127] * n_img_tok + post
        pix = improc(img)[None]
        exp = _hf_golden(hf, expanded, pix, 8)
        got = llm.generate(
            [{"prompt_token_ids": ids,
              "multi_modal_data": {"image": img}}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (trial, got, exp)
