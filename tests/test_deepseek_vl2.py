"""DeepSeek-VL2: timm-SigLIP tower + downsample_mlp_gelu projector +
newline/separator assembly on the DeepSeek-V2 MLA decoder (reference
models/deepseek_vl2.py role). Vision+projector+assembly are goldened
feature-level against a composed torch reference (HF SiglipVisionModel
transcoded into the timm name layout); the MLA decoder is goldened in
test_deepseek.py."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VSIZE, PATCH, VDIM = 16, 4, 32  # 4x4 patches; r=2 -> 2x2 projected
D = 64                          # text hidden


def _build(tmp_path):
    from safetensors.numpy import save_file
    from transformers import SiglipVisionConfig, SiglipVisionModel
    torch.manual_seed(0)
    vc = SiglipVisionConfig(hidden_size=VDIM, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=VSIZE, patch_size=PATCH)
    siglip = SiglipVisionModel(vc).eval().float()

    g = torch.Generator().manual_seed(1)
    w0 = torch.randn(D, VDIM * 4, generator=g) * 0.05
    b0 = torch.randn(D, generator=g) * 0.02
    w1 = torch.randn(D, D, generator=g) * 0.05
    b1 = torch.randn(D, generator=g) * 0.02
    newline = torch.randn(D, generator=g) * 0.1
    sep = torch.randn(D, generator=g) * 0.1

    out = {}
    qkv_parts = {}
    # transcode HF siglip names into the timm layout deepseek-vl2 ships
    sd = {k: v for k, v in siglip.state_dict().items()}
    for k, v in sd.items():
        k = k[len("vision_model."):] if k.startswith("vision_model.") \
            else k
        if k == "embeddings.patch_embedding.weight":
            out["vision.patch_embed.proj.weight"] = v.numpy()
        elif k == "embeddings.patch_embedding.bias":
            out["vision.patch_embed.proj.bias"] = v.numpy()
        elif k == "embeddings.position_embedding.weight":
            out["vision.pos_embed"] = v[None].numpy()
        elif k.startswith("post_layernorm."):
            out["vision.norm." + k.split(".")[-1]] = v.numpy()
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            li, leaf = parts[2], parts[-1]
            sub = ".".join(parts[3:-1])
            base = f"vision.blocks.{li}"
            m = {"self_attn.out_proj": "attn.proj",
                 "layer_norm1": "norm1", "layer_norm2": "norm2",
                 "mlp.fc1": "mlp.fc1", "mlp.fc2": "mlp.fc2"}
            if sub in ("self_attn.q_proj", "self_attn.k_proj",
                       "self_attn.v_proj"):
                qkv_parts.setdefault((f"{base}.attn.qkv", leaf), {})[
                    sub.split(".")[1]] = v
            else:
                out[f"{base}.{m[sub]}.{leaf}"] = v.numpy()
    for (base_leaf), d3 in qkv_parts.items():
        base, leaf = base_leaf
        out[f"{base}.{leaf}"] = torch.cat(
            [d3["q_proj"], d3["k_proj"], d3["v_proj"]], 0).numpy()
    out["projector.layers.0.weight"] = w0.numpy()
    out["projector.layers.0.bias"] = b0.numpy()
    out["projector.layers.2.weight"] = w1.numpy()
    out["projector.layers.2.bias"] = b1.numpy()
    out["image_newline"] = newline.numpy()
    out["view_seperator"] = sep.numpy()
    # tiny deepseek v2 text (random — decoder goldened elsewhere)
    rng = np.random.default_rng(2)
    out["language.model.embed_tokens.weight"] = \
        (rng.standard_normal((256, D)) * 0.02).astype(np.float32)
    out["language.model.norm.weight"] = np.ones(D, np.float32)
    out["language.lm_head.weight"] = \
        (rng.standard_normal((256, D)) * 0.02).astype(np.float32)
    for li in range(2):
        o = f"language.model.layers.{li}."
        out[o + "self_attn.q_proj.weight"] = \
            (rng.standard_normal((4 * 32, D)) * 0.05).astype(np.float32)
        out[o + "self_attn.kv_a_proj_with_mqa.weight"] = \
            (rng.standard_normal((32 + 16, D)) * 0.05).astype(np.float32)
        out[o + "self_attn.kv_a_layernorm.weight"] = \
            np.ones(32, np.float32)
        out[o + "self_attn.kv_b_proj.weight"] = \
            (rng.standard_normal((4 * (16 + 16), 32)) * 0.05).astype(
                np.float32)
        out[o + "self_attn.o_proj.weight"] = \
            (rng.standard_normal((D, 4 * 16)) * 0.05).astype(np.float32)
        out[o + "mlp.gate_proj.weight"] = \
            (rng.standard_normal((96, D)) * 0.05).astype(np.float32)
        out[o + "mlp.up_proj.weight"] = \
            (rng.standard_normal((96, D)) * 0.05).astype(np.float32)
        out[o + "mlp.down_proj.weight"] = \
            (rng.standard_normal((D, 96)) * 0.05).astype(np.float32)
        out[o + "input_layernorm.weight"] = np.ones(D, np.float32)
        out[o + "post_attention_layernorm.weight"] = \
            np.ones(D, np.float32)
    d = tmp_path / "dsvl2"
    d.mkdir()
    save_file(out, str(d / "model.safetensors"))
    json.dump({
        "architectures": ["DeepseekVLV2ForCausalLM"],
        "model_type": "deepseek_vl_v2",
        "image_token_id": 250, "global_view_pos": "head",
        "language_config": {
            "vocab_size": 256, "hidden_size": D,
            "intermediate_size": 96, "num_hidden_layers": 2,
            "num_attention_heads": 4, "kv_lora_rank": 32,
            "qk_nope_head_dim": 16, "qk_rope_head_dim": 16,
            "v_head_dim": 16, "n_routed_experts": 0,
            "first_k_dense_replace": 2, "rms_norm_eps": 1e-6,
            "max_position_embeddings": 256,
            "tie_word_embeddings": False},
        "vision_config": {"width": VDIM, "layers": 2, "heads": 2,
                          "intermediate_size": 64,
                          "image_size": VSIZE, "patch_size": PATCH},
        "projector_config": {"projector_type": "downsample_mlp_gelu",
                             "input_dim": VDIM, "n_embed": D,
                             "depth": 2, "mlp_ratio": 1,
                             "downsample_ratio": 2},
    }, open(d / "config.json", "w"))
    return d, siglip, (w0, b0, w1, b1, newline, sep)


def test_deepseek_vl2_vision_golden_and_e2e(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d, siglip, (w0, b0, w1, b1, newline, sep) = _build(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(15)
    # 1 global + 2x1 tiles
    px = rng.standard_normal((3, 3, VSIZE, VSIZE)).astype(np.float32)

    with torch.no_grad():
        feats = siglip(torch.tensor(px)).last_hidden_state  # [3, 16, 32]
        n, hw, vh = feats.shape
        side = int(hw ** 0.5)
        x = feats.reshape(n, side, side, vh).permute(0, 3, 1, 2)
        x = torch.nn.functional.unfold(x, kernel_size=2, stride=2)
        x = x.permute(0, 2, 1)                    # [n, 4, 4*vh]
        x = torch.nn.functional.gelu(x @ w0.T + b0) @ w1.T + b1
        h = w = side // 2
        dD = x.shape[-1]
        glb = torch.cat([x[0].reshape(h, w, dD),
                         newline[None, None].expand(h, 1, dD)],
                        dim=1).reshape(-1, dD)
        loc = x[1:3].reshape(1, 2, h, w, dD).permute(0, 2, 1, 3, 4) \
            .reshape(h, 2 * w, dD)
        loc = torch.cat([loc, newline[None, None].expand(h, 1, dD)],
                        dim=1).reshape(-1, dD)
        want = torch.cat([glb, sep[None], loc]).numpy()

    import jax
    r = llm.llm_engine.engine_core.runner
    ours = np.asarray(jax.device_get(r.model.encode_images(
        jax.device_get(r.params)["vision"], px, grid_thw=(2, 1))))
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)

    got = llm.generate(
        [{"prompt_token_ids": [3, 250, 9],
          "multi_modal_data": {"image": {"pixel_values": px,
                                         "spatial_crop": (2, 1)}}}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0].outputs[0].token_ids
    got2 = llm.generate(
        [{"prompt_token_ids": [3, 250, 9],
          "multi_modal_data": {"image": {"pixel_values": px,
                                         "spatial_crop": (2, 1)}}}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == got2 and len(got) == 6
