"""Qwen2-VL: MRoPE + vision tower vs HF goldens (reference
models/qwen2_vl.py; MRoPE rotary_embedding.py:849)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_qwen2vl(tmp_path, seed=0):
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration
    cfg = Qwen2VLConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        image_token_id=250, video_token_id=251,
        vision_start_token_id=248, tie_word_embeddings=False,
        vision_config=dict(depth=2, embed_dim=32, num_heads=2,
                           hidden_size=64, in_channels=3, patch_size=4,
                           temporal_patch_size=2, spatial_merge_size=2,
                           mlp_ratio=2.0))
    torch.manual_seed(seed)
    hf = Qwen2VLForConditionalGeneration(cfg).eval().float()
    hf.config.architectures = ["Qwen2VLForConditionalGeneration"]
    d = tmp_path / "qwen2vl"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, cfg


def _llm(d, **kw):
    from vllm_pq_tpu import LLM
    args = dict(model=str(d), dtype="float32", max_model_len=128,
                max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
                num_kv_blocks=64, enable_prefix_caching=False)
    args.update(kw)
    return LLM(**args)


def test_qwen2vl_text_only_matches_hf(tmp_path):
    """Pure text: MRoPE with t == h == w must equal HF."""
    from vllm_pq_tpu import SamplingParams
    d, hf, cfg = _tiny_qwen2vl(tmp_path)
    llm = _llm(d)
    rng = np.random.default_rng(2)
    for _ in range(2):
        prompt = rng.integers(5, 240, 9).tolist()
        with torch.no_grad():
            out = hf.generate(torch.tensor([prompt]), max_new_tokens=8,
                              do_sample=False, num_beams=1,
                              pad_token_id=0)
        exp = out[0, len(prompt):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (got, exp)


def test_qwen2vl_image_matches_hf(tmp_path):
    """Image + text: vision tower, placeholder splice, 3D rope plan and
    the post-image position delta must all match HF."""
    from transformers import Qwen2VLImageProcessor
    from vllm_pq_tpu import SamplingParams
    d, hf, cfg = _tiny_qwen2vl(tmp_path)
    llm = _llm(d)
    rng = np.random.default_rng(3)
    proc = Qwen2VLImageProcessor(
        patch_size=4, temporal_patch_size=2, merge_size=2,
        min_pixels=8 * 8, max_pixels=64 * 64, do_resize=False)
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
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
          "multi_modal_data": {"image": {
              "pixel_values": pv,
              "image_grid_thw": grid}}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (got, exp)


def test_mrope_position_plan():
    """Host-side get_rope_index equivalent matches the documented HF
    example (video 3x2x2 then text)."""
    from vllm_pq_tpu.models.qwen2_vl import mrope_positions_for_prompt
    from vllm_pq_tpu.multimodal import MMInput
    ids = [9] * 12 + [1, 2, 3, 4, 5]
    mm = [MMInput(offset=0, length=12, grid_thw=(3, 4, 4), merge_size=2,
                  mm_hash="x")]
    pos3, delta = mrope_positions_for_prompt(ids, mm, 9)
    assert pos3[0, :12].tolist() == [0] * 4 + [1] * 4 + [2] * 4
    assert pos3[1, :12].tolist() == [0, 0, 1, 1] * 3
    assert pos3[2, :12].tolist() == [0, 1, 0, 1] * 3
    assert pos3[0, 12:].tolist() == [3, 4, 5, 6, 7]
    assert delta == 8 - 17
