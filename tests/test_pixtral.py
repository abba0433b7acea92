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


def _to_mistral_format(hf, d):
    """Transcode the HF LLaVA-composite tiny Pixtral into the Mistral
    consolidated format (params.json + native weight names) — the
    layout mistralai/Pixtral-12B-2409 ships (reference
    models/pixtral.py + transformers_utils/config.py:615)."""
    import json

    from safetensors.numpy import save_file
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    out = {}
    tmap = {"self_attn.q_proj": "attention.wq",
            "self_attn.k_proj": "attention.wk",
            "self_attn.v_proj": "attention.wv",
            "self_attn.o_proj": "attention.wo",
            "mlp.gate_proj": "feed_forward.w1",
            "mlp.down_proj": "feed_forward.w2",
            "mlp.up_proj": "feed_forward.w3",
            "input_layernorm": "attention_norm",
            "post_attention_layernorm": "ffn_norm"}
    vmap = {"attention.q_proj": "attention.wq",
            "attention.k_proj": "attention.wk",
            "attention.v_proj": "attention.wv",
            "attention.o_proj": "attention.wo",
            "feed_forward.gate_proj": "feed_forward.w1",
            "feed_forward.down_proj": "feed_forward.w2",
            "feed_forward.up_proj": "feed_forward.w3",
            "attention_norm": "attention_norm",
            "ffn_norm": "ffn_norm"}
    for k, v in sd.items():
        k = k[len("model."):] if k.startswith("model.") else k
        if k == "language_model.model.embed_tokens.weight" \
                or k == "language_model.embed_tokens.weight":
            out["tok_embeddings.weight"] = v
        elif k.endswith("language_model.model.norm.weight") \
                or k == "language_model.norm.weight":
            out["norm.weight"] = v
        elif k in ("language_model.lm_head.weight", "lm_head.weight"):
            out["output.weight"] = v
        elif ".layers." in k and k.startswith("language_model."):
            parts = k.split(".")
            li = parts[parts.index("layers") + 1]
            sub = ".".join(parts[parts.index("layers") + 2:-1])
            out[f"layers.{li}.{tmap[sub]}.{parts[-1]}"] = v
        elif k == "vision_tower.patch_conv.weight":
            out["vision_encoder.patch_conv.weight"] = v
        elif k == "vision_tower.ln_pre.weight":
            out["vision_encoder.ln_pre.weight"] = v
        elif k.startswith("vision_tower.transformer.layers."):
            parts = k.split(".")
            li, leaf = parts[3], parts[-1]
            sub = ".".join(parts[4:-1])
            out[f"vision_encoder.transformer.layers.{li}."
                f"{vmap[sub]}.{leaf}"] = v
        elif k.startswith("multi_modal_projector."):
            sub = {"linear_1": "w_in", "linear_2": "w_out"}[
                k.split(".")[1]]
            out[f"vision_language_adapter.{sub}.{k.split('.')[-1]}"] = v
    d.mkdir(parents=True, exist_ok=True)
    save_file(out, str(d / "consolidated.safetensors"))
    tc, vc = hf.config.text_config, hf.config.vision_config
    json.dump({
        "dim": tc.hidden_size, "n_layers": tc.num_hidden_layers,
        "n_heads": tc.num_attention_heads,
        "n_kv_heads": tc.num_key_value_heads,
        "hidden_dim": tc.intermediate_size,
        "norm_eps": tc.rms_norm_eps, "vocab_size": tc.vocab_size,
        "rope_theta": tc.rope_theta, "max_seq_len": 128,
        "vision_encoder": {
            "hidden_size": vc.hidden_size,
            "intermediate_size": vc.intermediate_size,
            "num_hidden_layers": vc.num_hidden_layers,
            "num_attention_heads": vc.num_attention_heads,
            "num_channels": 3,
            "image_size": vc.image_size, "patch_size": vc.patch_size,
            "rope_theta": vc.rope_theta,
            "image_token_id": 127, "image_break_token_id": 125,
            "image_end_token_id": 126, "adapter_bias": True,
        },
    }, open(d / "params.json", "w"))


def test_pixtral_mistral_format_matches_hf(tmp_path):
    """PixtralForConditionalGeneration: the Mistral-format standalone
    checkpoint loads by its published layout and matches the HF
    composite golden token-exactly."""
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf = _tiny_pixtral_llava(tmp_path)
    dm = tmp_path / "pixtral_mistral"
    _to_mistral_format(hf, dm)
    llm = LLM(model=str(dm), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64, enable_prefix_caching=False)
    rng = np.random.default_rng(5)
    improc = ImageProcessor(size=16)
    n_img_tok = (16 // 8) ** 2
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    pre = [3, 9, 11]
    post = [21, 17, 40]
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
        [{"prompt_token_ids": ids, "multi_modal_data": {"image": img}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (got, exp)


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
