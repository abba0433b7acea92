"""GLM-4V: EVA2-CLIP tower + conv downsample + GLU projector on the
ChatGLM decoder (reference models/glm4v.py role). The vision stack is
goldened against a torch replica of the reference module math (GLM-4V
ships trust_remote_code); the ChatGLM decoder is HF-goldened in the GLM
family tests."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VSIZE, PATCH, VH, VI = 16, 4, 32, 64   # side 4 -> pooled 2x2
TH, FFN = 64, 96


def _build(tmp_path):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(16)

    def r(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)
    out = {}
    tv = "transformer.vision."
    out[tv + "patch_embedding.proj.weight"] = r(VH, 3, PATCH, PATCH)
    out[tv + "patch_embedding.proj.bias"] = r(VH)
    out[tv + "patch_embedding.cls_embedding"] = r(1, VH)
    out[tv + "patch_embedding.position_embedding.weight"] = r(17, VH)
    for li in range(2):
        o = tv + f"transformer.layers.{li}."
        out[o + "attention.query_key_value.weight"] = r(3 * VH, VH)
        out[o + "attention.query_key_value.bias"] = r(3 * VH)
        out[o + "attention.dense.weight"] = r(VH, VH)
        out[o + "attention.dense.bias"] = r(VH)
        out[o + "mlp.fc1.weight"] = r(VI, VH)
        out[o + "mlp.fc1.bias"] = r(VI)
        out[o + "mlp.fc2.weight"] = r(VH, VI)
        out[o + "mlp.fc2.bias"] = r(VH)
        out[o + "input_layernorm.weight"] = np.ones(VH, np.float32)
        out[o + "input_layernorm.bias"] = np.zeros(VH, np.float32)
        out[o + "post_attention_layernorm.weight"] = \
            np.ones(VH, np.float32)
        out[o + "post_attention_layernorm.bias"] = \
            np.zeros(VH, np.float32)
    out[tv + "conv.weight"] = r(TH, VH, 2, 2)
    out[tv + "conv.bias"] = r(TH)
    out[tv + "linear_proj.linear_proj.weight"] = r(TH, TH)
    out[tv + "linear_proj.norm1.weight"] = np.ones(TH, np.float32)
    out[tv + "linear_proj.norm1.bias"] = np.zeros(TH, np.float32)
    out[tv + "linear_proj.gate_proj.weight"] = r(FFN, TH)
    out[tv + "linear_proj.dense_h_to_4h.weight"] = r(FFN, TH)
    out[tv + "linear_proj.dense_4h_to_h.weight"] = r(TH, FFN)
    out[tv + "boi"] = r(1, 1, TH)
    out[tv + "eoi"] = r(1, 1, TH)
    # chatglm text (fused encoder naming, MQA)
    heads, kvh, d = 4, 1, 16
    out["transformer.embedding.word_embeddings.weight"] = r(256, TH)
    out["transformer.encoder.final_layernorm.weight"] = \
        np.ones(TH, np.float32)
    out["transformer.output_layer.weight"] = r(256, TH)
    for li in range(2):
        o = f"transformer.encoder.layers.{li}."
        out[o + "self_attention.query_key_value.weight"] = \
            r(heads * d + 2 * kvh * d, TH)
        out[o + "self_attention.query_key_value.bias"] = \
            r(heads * d + 2 * kvh * d)
        out[o + "self_attention.dense.weight"] = r(TH, heads * d)
        out[o + "mlp.dense_h_to_4h.weight"] = r(2 * FFN, TH)
        out[o + "mlp.dense_4h_to_h.weight"] = r(TH, FFN)
        out[o + "input_layernorm.weight"] = np.ones(TH, np.float32)
        out[o + "post_attention_layernorm.weight"] = \
            np.ones(TH, np.float32)
    dd = tmp_path / "glm4v"
    dd.mkdir()
    save_file(out, str(dd / "model.safetensors"))
    json.dump({"architectures": ["GLM4VForCausalLM"],
               "model_type": "chatglm",
               "padded_vocab_size": 256, "hidden_size": TH,
               "ffn_hidden_size": FFN, "num_layers": 2,
               "num_attention_heads": heads, "kv_channels": d,
               "multi_query_attention": True,
               "multi_query_group_num": kvh,
               "add_qkv_bias": True, "seq_length": 256,
               "layernorm_epsilon": 1e-5, "boi_token_id": 250,
               "eoi_token_id": 251,
               "vision_config": {"hidden_size": VH,
                                 "intermediate_size": VI,
                                 "num_hidden_layers": 2,
                                 "num_heads": 2,
                                 "image_size": VSIZE,
                                 "patch_size": PATCH,
                                 "scaling_factor": 4.0,
                                 "hidden_act": "gelu"}},
              open(dd / "config.json", "w"))
    return dd, out


def _torch_vision(out, px):
    """torch replica of reference glm4v.py EVA2CLIPModel.forward."""
    tv = "transformer.vision."
    t = lambda k: torch.tensor(out[tv + k])  # noqa: E731
    x = torch.nn.functional.conv2d(torch.tensor(px),
                                   t("patch_embedding.proj.weight"),
                                   t("patch_embedding.proj.bias"),
                                   stride=PATCH)
    x = x.flatten(2).transpose(1, 2)
    cls = t("patch_embedding.cls_embedding").expand(x.shape[0], -1, -1)
    x = torch.cat([cls.reshape(x.shape[0], 1, -1), x], dim=1)
    x = x + t("patch_embedding.position_embedding.weight")[None]
    heads, hd = 2, VH // 2
    for li in range(2):
        o = tv + f"transformer.layers.{li}."
        tt = lambda k: torch.tensor(out[o + k])  # noqa: E731
        h = torch.nn.functional.layer_norm(
            x, (VH,), tt("input_layernorm.weight"),
            tt("input_layernorm.bias"))
        qkv = h @ tt("attention.query_key_value.weight").T \
            + tt("attention.query_key_value.bias")
        b, s, _ = qkv.shape
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.view(b, s, heads, hd).transpose(1, 2)
        k = k.view(b, s, heads, hd).transpose(1, 2)
        v = v.view(b, s, heads, hd).transpose(1, 2)
        attn = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        attn = attn.transpose(1, 2).reshape(b, s, VH)
        x = x + attn @ tt("attention.dense.weight").T \
            + tt("attention.dense.bias")
        h = torch.nn.functional.layer_norm(
            x, (VH,), tt("post_attention_layernorm.weight"),
            tt("post_attention_layernorm.bias"))
        h = torch.nn.functional.gelu(
            h @ tt("mlp.fc1.weight").T + tt("mlp.fc1.bias"))
        x = x + h @ tt("mlp.fc2.weight").T + tt("mlp.fc2.bias")
    x = x[:, 1:]
    b, s, hh = x.shape
    g = int(s ** 0.5)
    x = x.view(b, g, g, hh).permute(0, 3, 1, 2)
    x = torch.nn.functional.conv2d(x, t("conv.weight"), t("conv.bias"),
                                   stride=2)
    x = x.flatten(2).transpose(1, 2)
    x = x @ t("linear_proj.linear_proj.weight").T
    x = torch.nn.functional.gelu(torch.nn.functional.layer_norm(
        x, (TH,), t("linear_proj.norm1.weight"),
        t("linear_proj.norm1.bias")))
    gate = x @ t("linear_proj.gate_proj.weight").T
    up = x @ t("linear_proj.dense_h_to_4h.weight").T
    x = torch.nn.functional.silu(gate) * up
    x = x @ t("linear_proj.dense_4h_to_h.weight").T
    boi = t("boi").expand(x.shape[0], -1, -1)
    eoi = t("eoi").expand(x.shape[0], -1, -1)
    return torch.cat([boi, x, eoi], dim=1) / 4.0


def test_glm4v_vision_golden_and_e2e(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d, out = _build(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(17)
    px = rng.standard_normal((1, 3, VSIZE, VSIZE)).astype(np.float32)
    with torch.no_grad():
        want = _torch_vision(out, px).numpy()
    import jax
    r = llm.llm_engine.engine_core.runner
    ours = np.asarray(jax.device_get(r.model.encode_images(
        jax.device_get(r.params)["vision"], px)))
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)
    got = llm.generate(
        [{"prompt_token_ids": [3, 250, 9],
          "multi_modal_data": {"image": {"pixel_values": px[0]}}}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0].outputs[0].token_ids
    got2 = llm.generate(
        [{"prompt_token_ids": [3, 250, 9],
          "multi_modal_data": {"image": {"pixel_values": px[0]}}}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == got2 and len(got) == 6
