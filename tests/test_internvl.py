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


def _to_legacy_checkpoint(hf, cfg, d):
    """Transcode the HF-format tiny InternVL into the legacy OpenGVLab
    InternVLChatModel layout (vision_model./mlp1./language_model. with
    fused attn.qkv and ls1/ls2 layer scales) — the format real
    InternVL2/2.5 checkpoints ship (reference models/internvl.py)."""
    import json

    from safetensors.numpy import save_file
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    out = {}
    qkv = {}
    for k, v in sd.items():
        k = k[len("model."):] if k.startswith("model.") else k
        if k.startswith("language_model."):
            out["language_model.model." + k[len("language_model."):]] = v
        elif k == "lm_head.weight":
            out["language_model.lm_head.weight"] = v
        elif k.startswith("multi_modal_projector."):
            sub = {"layer_norm": "0", "linear_1": "1",
                   "linear_2": "3"}[k.split(".")[1]]
            out[f"mlp1.{sub}.{k.split('.')[-1]}"] = v
        elif k.startswith("vision_tower."):
            rest = k[len("vision_tower."):]
            if rest == "embeddings.cls_token":
                out["vision_model.embeddings.class_embedding"] = v
            elif rest == "embeddings.position_embeddings":
                out["vision_model.embeddings.position_embedding"] = v
            elif rest.startswith("embeddings.patch_embeddings.projection"):
                leaf = rest.split(".")[-1]
                out[f"vision_model.embeddings.patch_embedding.{leaf}"] = v
            elif rest.startswith("encoder.layer."):
                parts = rest.split(".")
                li, leaf = parts[2], parts[-1]
                sub = ".".join(parts[3:-1])
                base = f"vision_model.encoder.layers.{li}"
                m = {"attention.projection_layer": "attn.proj",
                     "attention.q_norm": "attn.q_norm",
                     "attention.k_norm": "attn.k_norm",
                     "layernorm_before": "norm1",
                     "layernorm_after": "norm2",
                     "mlp.fc1": "mlp.fc1", "mlp.fc2": "mlp.fc2"}
                if sub in ("attention.q_proj", "attention.k_proj",
                           "attention.v_proj"):
                    qkv.setdefault((li, leaf), {})[sub.split(".")[1]] = v
                elif parts[3] in ("lambda_1", "lambda_2"):
                    out[f"{base}.ls{parts[3][-1]}"] = v
                else:
                    out[f"{base}.{m[sub]}.{leaf}"] = v
    for (li, leaf), d3 in qkv.items():
        out[f"vision_model.encoder.layers.{li}.attn.qkv.{leaf}"] = \
            np.concatenate([d3["q_proj"], d3["k_proj"], d3["v_proj"]], 0)
    d.mkdir(parents=True, exist_ok=True)
    save_file(out, str(d / "model.safetensors"))
    vc, tc = cfg.vision_config, cfg.text_config
    json.dump({
        "architectures": ["InternVLChatModel"],
        "model_type": "internvl_chat",
        "downsample_ratio": cfg.downsample_ratio,
        "select_layer": -1,
        "image_token_id": cfg.image_token_id,
        "llm_config": {
            "architectures": ["Qwen2ForCausalLM"],
            "model_type": "qwen2",
            "vocab_size": tc.vocab_size, "hidden_size": tc.hidden_size,
            "intermediate_size": tc.intermediate_size,
            "num_hidden_layers": tc.num_hidden_layers,
            "num_attention_heads": tc.num_attention_heads,
            "num_key_value_heads": tc.num_key_value_heads,
            "max_position_embeddings": tc.max_position_embeddings,
            "rms_norm_eps": tc.rms_norm_eps,
            "rope_theta": tc.rope_theta,
            "tie_word_embeddings": False,
        },
        "vision_config": {
            "hidden_size": vc.hidden_size,
            "intermediate_size": vc.intermediate_size,
            "num_hidden_layers": vc.num_hidden_layers,
            "num_attention_heads": vc.num_attention_heads,
            "image_size": vc.image_size, "patch_size": vc.patch_size,
            "qkv_bias": getattr(vc, "attention_bias", True),
            "qk_normalization": vc.use_qk_norm,
            "norm_type": vc.norm_type,
        },
    }, open(d / "config.json", "w"))


def test_internvl_chatmodel_legacy_format(tmp_path):
    """The published InternVL2/2.5 arch string + weight layout load and
    match the HF-format golden token-exactly."""
    from vllm_pq_tpu import SamplingParams
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf, cfg = _tiny_internvl(tmp_path)
    dl = tmp_path / "internvl_legacy"
    _to_legacy_checkpoint(hf, cfg, dl)
    llm = _llm(dl)
    rng = np.random.default_rng(7)
    improc = ImageProcessor(size=16)
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    pre = [3, 9, 11]
    post = [21, 17]
    ids = pre + [127] + post
    expanded = pre + [127] * 4 + post
    exp = _hf_golden(hf, expanded, improc(img)[None], 8)
    got = llm.generate(
        [{"prompt_token_ids": ids, "multi_modal_data": {"image": img}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (got, exp)


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
