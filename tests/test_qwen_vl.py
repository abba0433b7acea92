"""Qwen-VL v1: CLIP-style ViT + perceiver resampler attn_pool on the
QWen v1 decoder (reference models/qwen_vl.py role). The vision stack is
goldened against a torch replica of the reference module math
(VisualAttention's per-head-interleaved in_proj, Resampler2's sincos
positions and bicubic get_abs_pos); the QWen text math is HF-goldened
in the registry family tests."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VSIZE, PATCH, W, HEADS = 16, 4, 32, 2      # side 4
MLP = 64
OD = 64                                     # output_dim == text hidden
NQ = 4                                      # 2x2 query grid
POSG = 2                                    # learned pos grid 2x2
TH = 64                                     # text hidden


def _build(tmp_path):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(21)

    def r(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)
    out = {}
    tv = "transformer.visual."
    out[tv + "conv1.weight"] = r(W, 3, PATCH, PATCH)
    out[tv + "positional_embedding"] = r(POSG * POSG, W)
    out[tv + "ln_pre.weight"] = np.ones(W, np.float32)
    out[tv + "ln_pre.bias"] = np.zeros(W, np.float32)
    for li in range(2):
        o = tv + f"transformer.resblocks.{li}."
        out[o + "ln_1.weight"] = np.ones(W, np.float32)
        out[o + "ln_1.bias"] = np.zeros(W, np.float32)
        out[o + "ln_2.weight"] = np.ones(W, np.float32)
        out[o + "ln_2.bias"] = np.zeros(W, np.float32)
        out[o + "attn.in_proj.weight"] = r(3 * W, W)
        out[o + "attn.in_proj.bias"] = r(3 * W)
        out[o + "attn.out_proj.weight"] = r(W, W)
        out[o + "attn.out_proj.bias"] = r(W)
        out[o + "mlp.c_fc.weight"] = r(MLP, W)
        out[o + "mlp.c_fc.bias"] = r(MLP)
        out[o + "mlp.c_proj.weight"] = r(W, MLP)
        out[o + "mlp.c_proj.bias"] = r(W)
    ap = tv + "attn_pool."
    from vllm_pq_tpu.models.qwen_vl import sincos_2d
    out[ap + "query"] = r(NQ, OD)
    out[ap + "pos_embed"] = sincos_2d(OD, 2, 2)
    out[ap + "kv_proj.weight"] = r(OD, W)
    out[ap + "ln_q.weight"] = np.ones(OD, np.float32)
    out[ap + "ln_q.bias"] = np.zeros(OD, np.float32)
    out[ap + "ln_kv.weight"] = np.ones(OD, np.float32)
    out[ap + "ln_kv.bias"] = np.zeros(OD, np.float32)
    out[ap + "attn.in_proj_weight"] = r(3 * OD, OD)
    out[ap + "attn.in_proj_bias"] = r(3 * OD)
    out[ap + "attn.out_proj.weight"] = r(OD, OD)
    out[ap + "attn.out_proj.bias"] = r(OD)
    out[tv + "ln_post.weight"] = np.ones(OD, np.float32)
    out[tv + "ln_post.bias"] = np.zeros(OD, np.float32)
    out[tv + "proj"] = r(OD, OD)

    # QWen v1 text weights (fused biased c_attn, halved SwiGLU)
    heads, d = 4, TH // 4
    out["transformer.wte.weight"] = r(512, TH)
    out["transformer.ln_f.weight"] = np.ones(TH, np.float32)
    out["lm_head.weight"] = r(512, TH)
    for li in range(2):
        o = f"transformer.h.{li}."
        out[o + "attn.c_attn.weight"] = r(3 * TH, TH)
        out[o + "attn.c_attn.bias"] = r(3 * TH)
        out[o + "attn.c_proj.weight"] = r(TH, TH)
        out[o + "mlp.w2.weight"] = r(96, TH)
        out[o + "mlp.w1.weight"] = r(96, TH)
        out[o + "mlp.c_proj.weight"] = r(TH, 96)
        out[o + "ln_1.weight"] = np.ones(TH, np.float32)
        out[o + "ln_2.weight"] = np.ones(TH, np.float32)
    dd = tmp_path / "qwenvl"
    dd.mkdir()
    save_file(out, str(dd / "model.safetensors"))
    json.dump({"architectures": ["QWenLMHeadModel"],
               "model_type": "qwen",
               "vocab_size": 512, "hidden_size": TH,
               "intermediate_size": 192, "num_hidden_layers": 2,
               "num_attention_heads": heads,
               "layer_norm_epsilon": 1e-6, "seq_length": 256,
               "max_position_embeddings": 256,
               "visual": {"image_size": VSIZE, "patch_size": PATCH,
                          "width": W, "layers": 2, "heads": HEADS,
                          "mlp_ratio": 2.0, "n_queries": NQ,
                          "output_dim": OD, "pos_grid": POSG,
                          "image_start_id": 500}},
              open(dd / "config.json", "w"))
    return dd, out


def _abs_pos(pe, tgt):
    src = int(math.isqrt(pe.shape[0]))
    if src == tgt:
        return pe
    return torch.nn.functional.interpolate(
        pe.float().reshape(1, src, src, -1).permute(0, 3, 1, 2),
        size=(tgt, tgt), mode="bicubic", align_corners=False,
    ).permute(0, 2, 3, 1).reshape(tgt * tgt, -1)


def _torch_vision(out, px):
    """torch replica of reference qwen_vl.py VisionTransformer.forward
    (incl. VisualAttention's per-head-interleaved in_proj split and
    Resampler2)."""
    tv = "transformer.visual."
    t = lambda k: torch.tensor(out[tv + k])  # noqa: E731
    ln = torch.nn.functional.layer_norm
    x = torch.nn.functional.conv2d(torch.tensor(px), t("conv1.weight"),
                                   stride=PATCH)
    x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
    side = VSIZE // PATCH
    x = x + _abs_pos(t("positional_embedding"), side)
    x = ln(x, (W,), t("ln_pre.weight"), t("ln_pre.bias"), eps=1e-6)
    hd = W // HEADS
    for li in range(2):
        o = tv + f"transformer.resblocks.{li}."
        tt = lambda k: torch.tensor(out[o + k])  # noqa: E731
        h = ln(x, (W,), tt("ln_1.weight"), tt("ln_1.bias"), eps=1e-6)
        qkv = h @ tt("attn.in_proj.weight").T + tt("attn.in_proj.bias")
        b, s, _ = qkv.shape
        qkv = qkv.view(b, s, HEADS, 3 * hd)
        q, k, v = qkv.split(hd, dim=-1)     # per-head interleaved
        q = q.transpose(1, 2)
        k = k.transpose(1, 2)
        v = v.transpose(1, 2)
        attn = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        attn = attn.transpose(1, 2).reshape(b, s, W)
        x = x + attn @ tt("attn.out_proj.weight").T \
            + tt("attn.out_proj.bias")
        h = ln(x, (W,), tt("ln_2.weight"), tt("ln_2.bias"), eps=1e-6)
        h = torch.nn.functional.gelu(
            h @ tt("mlp.c_fc.weight").T + tt("mlp.c_fc.bias"))
        x = x + h @ tt("mlp.c_proj.weight").T + tt("mlp.c_proj.bias")

    # Resampler2 (no post projection inside the resampler)
    ap = tv + "attn_pool."
    ta = lambda k: torch.tensor(out[ap + k])  # noqa: E731
    kv = x @ ta("kv_proj.weight").T
    kv = ln(kv, (OD,), ta("ln_kv.weight"), ta("ln_kv.bias"), eps=1e-6)
    pos_k = _abs_pos(ta("pos_embed"), side)
    q = ln(ta("query"), (OD,), ta("ln_q.weight"), ta("ln_q.bias"),
           eps=1e-6)
    b = x.shape[0]
    attn = torch.nn.MultiheadAttention(OD, max(OD // 128, 1),
                                       batch_first=False)
    with torch.no_grad():
        attn.in_proj_weight.copy_(ta("attn.in_proj_weight"))
        attn.in_proj_bias.copy_(ta("attn.in_proj_bias"))
        attn.out_proj.weight.copy_(ta("attn.out_proj.weight"))
        attn.out_proj.bias.copy_(ta("attn.out_proj.bias"))
    kv_l = kv.permute(1, 0, 2)              # L, N, D
    q_l = (q.unsqueeze(1).repeat(1, b, 1)
           + ta("pos_embed").unsqueeze(1))
    out_l = attn(q_l, kv_l + pos_k.unsqueeze(1), kv_l)[0]
    x = out_l.permute(1, 0, 2)
    x = ln(x, (OD,), t("ln_post.weight"), t("ln_post.bias"), eps=1e-6)
    return x @ t("proj")


def test_qwen_vl_vision_golden_and_e2e(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d, out = _build(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(22)
    px = rng.standard_normal((1, 3, VSIZE, VSIZE)).astype(np.float32)
    with torch.no_grad():
        want = _torch_vision(out, px).numpy()
    import jax
    r = llm.llm_engine.engine_core.runner
    ours = np.asarray(jax.device_get(r.model.encode_images(
        jax.device_get(r.params)["vision"], px)))
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)
    # e2e: placeholder = image_pad_id (image_start_id + 2)
    prompt = {"prompt_token_ids": [3, 500, 502, 501, 9],
              "multi_modal_data": {"image": {"pixel_values": px[0]}}}
    got = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=6,
        ignore_eos=True))[0].outputs[0].token_ids
    got2 = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=6,
        ignore_eos=True))[0].outputs[0].token_ids
    assert got == got2 and len(got) == 6


def test_qwen_vl_registry_arch_row():
    """QwenVLForConditionalGeneration resolves (reference registry
    name) and QWenLMHeadModel + visual builds the VL model."""
    from vllm_pq_tpu.models.registry import _REGISTRY
    assert "QwenVLForConditionalGeneration" in _REGISTRY
