"""LLaVA-NeXT anyres: base crop + unpadded grid + image_newline rows vs
HF goldens (reference models/llava_next.py role)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VSIZE, PATCH = 16, 8  # side = 2 feature cells per crop


def _tiny_llava_next(tmp_path, pinpoints):
    from transformers import (CLIPVisionConfig, LlamaConfig,
                              LlavaNextConfig,
                              LlavaNextForConditionalGeneration)
    vc = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=2,
                          image_size=VSIZE, patch_size=PATCH)
    tc = LlamaConfig(vocab_size=128, hidden_size=64,
                     intermediate_size=96, num_hidden_layers=2,
                     num_attention_heads=2, num_key_value_heads=1,
                     max_position_embeddings=256,
                     tie_word_embeddings=False)
    cfg = LlavaNextConfig(vision_config=vc.to_dict(),
                          text_config=tc.to_dict(),
                          image_grid_pinpoints=pinpoints,
                          image_token_index=127)
    torch.manual_seed(0)
    hf = LlavaNextForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "llava_next"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


@pytest.mark.parametrize("orig_hw", [(20, 32), (32, 20), (32, 32)])
def test_llava_next_matches_hf(tmp_path, orig_hw):
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.multimodal.llava_next import (anyres_grid_shape,
                                                   feature_span)
    pinpoints = [[2 * VSIZE, 2 * VSIZE]]
    d, hf = _tiny_llava_next(tmp_path, pinpoints)
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    nph, npw = anyres_grid_shape(orig_hw, pinpoints, VSIZE)
    n_crops = nph * npw + 1
    rng = np.random.default_rng(1)
    px = rng.standard_normal((n_crops, 3, VSIZE, VSIZE)) \
        .astype(np.float32)
    span = feature_span(orig_hw, pinpoints, VSIZE, PATCH)
    pre = rng.integers(1, 126, 4).tolist()
    post = rng.integers(1, 126, 3).tolist()
    expanded = pre + [127] * span + post
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(px[None]),
            image_sizes=torch.tensor([list(orig_hw)]),
            max_new_tokens=8, do_sample=False, num_beams=1,
            pad_token_id=0)
    exp = out[0, len(expanded):].tolist()
    got = llm.generate(
        [{"prompt_token_ids": pre + [127] + post,
          "multi_modal_data": {"image": {"pixel_values": px,
                                         "image_size": orig_hw}}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (orig_hw, span, got, exp)
