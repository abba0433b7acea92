"""Florence-2: DaViT vision tower prepended to the BART encoder
(reference models/florence2.py role). The DaViT + projection bridge is
goldened against a torch replica of the reference module math
(ConvEmbed / SpatialBlock / ChannelBlock / 2D-learned + cosine
positions / feature-source concat); the BART language math is
HF-goldened in test_bart.py."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

IMG = 16
DIMS = (16, 32)
DEPTHS = (1, 1)
HEADS = (2, 2)
GROUPS = (2, 2)
PS = (7, 3)
STR = (4, 2)
PAD = (3, 1)
PRE = (False, True)
WIN = 4
DM = 32          # d_model == projection_dim


def _build(tmp_path):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(41)

    def r(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)
    out = {}
    vt = "vision_tower."
    for i, dim in enumerate(DIMS):
        in_ch = 3 if i == 0 else DIMS[i - 1]
        out[vt + f"convs.{i}.proj.weight"] = r(dim, in_ch, PS[i], PS[i])
        out[vt + f"convs.{i}.proj.bias"] = r(dim)
        nd = in_ch if PRE[i] else dim
        out[vt + f"convs.{i}.norm.weight"] = np.ones(nd, np.float32)
        out[vt + f"convs.{i}.norm.bias"] = np.zeros(nd, np.float32)
        for j in range(DEPTHS[i]):
            for blk in ("spatial_block", "channel_block"):
                o = vt + f"blocks.{i}.{j}.{blk}."
                att = ("window_attn" if blk == "spatial_block"
                       else "channel_attn")
                out[o + "conv1.fn.dw.weight"] = r(dim, 1, 3, 3)
                out[o + "conv1.fn.dw.bias"] = r(dim)
                out[o + f"{att}.norm.weight"] = np.ones(dim, np.float32)
                out[o + f"{att}.norm.bias"] = np.zeros(dim, np.float32)
                out[o + f"{att}.fn.qkv.weight"] = r(3 * dim, dim)
                out[o + f"{att}.fn.qkv.bias"] = r(3 * dim)
                out[o + f"{att}.fn.proj.weight"] = r(dim, dim)
                out[o + f"{att}.fn.proj.bias"] = r(dim)
                out[o + "conv2.fn.dw.weight"] = r(dim, 1, 3, 3)
                out[o + "conv2.fn.dw.bias"] = r(dim)
                out[o + "ffn.norm.weight"] = np.ones(dim, np.float32)
                out[o + "ffn.norm.bias"] = np.zeros(dim, np.float32)
                out[o + "ffn.fn.net.fc1.weight"] = r(4 * dim, dim)
                out[o + "ffn.fn.net.fc1.bias"] = r(4 * dim)
                out[o + "ffn.fn.net.fc2.weight"] = r(dim, 4 * dim)
                out[o + "ffn.fn.net.fc2.bias"] = r(dim)
    c_last = DIMS[-1]
    out["image_projection"] = r(c_last, DM)
    out["image_proj_norm.weight"] = np.ones(DM, np.float32)
    out["image_proj_norm.bias"] = np.zeros(DM, np.float32)
    out["image_pos_embed.row_embeddings.weight"] = r(50, c_last // 2)
    out["image_pos_embed.column_embeddings.weight"] = \
        r(50, c_last - c_last // 2)

    # BART language side (hand weights; math is HF-goldened elsewhere)
    lm = "language_model.model."
    out[lm + "shared.weight"] = r(128, DM)
    for side, nl in (("encoder", 2), ("decoder", 2)):
        out[lm + f"{side}.embed_positions.weight"] = r(130, DM)
        out[lm + f"{side}.layernorm_embedding.weight"] = \
            np.ones(DM, np.float32)
        out[lm + f"{side}.layernorm_embedding.bias"] = \
            np.zeros(DM, np.float32)
        for li in range(nl):
            o = lm + f"{side}.layers.{li}."
            for attn in (("self_attn",) if side == "encoder"
                         else ("self_attn", "encoder_attn")):
                for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
                    out[o + f"{attn}.{p}.weight"] = r(DM, DM)
                    out[o + f"{attn}.{p}.bias"] = r(DM)
                out[o + f"{attn}_layer_norm.weight"] = \
                    np.ones(DM, np.float32)
                out[o + f"{attn}_layer_norm.bias"] = \
                    np.zeros(DM, np.float32)
            out[o + "fc1.weight"] = r(64, DM)
            out[o + "fc1.bias"] = r(64)
            out[o + "fc2.weight"] = r(DM, 64)
            out[o + "fc2.bias"] = r(DM)
            out[o + "final_layer_norm.weight"] = np.ones(DM, np.float32)
            out[o + "final_layer_norm.bias"] = np.zeros(DM, np.float32)

    dd = tmp_path / "florence2"
    dd.mkdir()
    save_file(out, str(dd / "model.safetensors"))
    json.dump({
        "architectures": ["Florence2ForConditionalGeneration"],
        "model_type": "florence2", "pad_token_id": 2,
        "text_config": {
            "vocab_size": 128, "d_model": DM, "encoder_layers": 2,
            "decoder_layers": 2, "encoder_attention_heads": 2,
            "decoder_attention_heads": 2, "encoder_ffn_dim": 64,
            "decoder_ffn_dim": 64, "max_position_embeddings": 128,
            "activation_function": "gelu", "scale_embedding": False,
            "decoder_start_token_id": 1,
        },
        "vision_config": {
            "model_type": "davit", "depths": list(DEPTHS),
            "dim_embed": list(DIMS), "num_heads": list(HEADS),
            "num_groups": list(GROUPS), "patch_size": list(PS),
            "patch_stride": list(STR), "patch_padding": list(PAD),
            "patch_prenorm": list(PRE), "window_size": WIN,
            "projection_dim": DM,
            "image_pos_embed": {"type": "learned_abs_2d",
                                "max_pos_embeddings": 50},
            "visual_temporal_embedding": {
                "type": "COSINE", "max_temporal_embeddings": 100},
            "image_feature_source": ["spatial_avg_pool",
                                     "temporal_avg_pool"],
        }}, open(dd / "config.json", "w"))
    return dd, out


def _torch_vision(out, px):
    """torch replica of reference DaViT.forward_features_unpool + the
    Florence2 _encode_image bridge."""
    ln = torch.nn.functional.layer_norm
    x = torch.tensor(px)[None]                 # [1, 3, H, W]
    size = (x.shape[2], x.shape[3])
    for i, dim in enumerate(DIMS):
        in_ch = 3 if i == 0 else DIMS[i - 1]
        w = torch.tensor(out[f"vision_tower.convs.{i}.proj.weight"])
        b = torch.tensor(out[f"vision_tower.convs.{i}.proj.bias"])
        nw = torch.tensor(out[f"vision_tower.convs.{i}.norm.weight"])
        nb = torch.tensor(out[f"vision_tower.convs.{i}.norm.bias"])
        if i > 0:
            h0, w0 = size
            x = x.view(1, h0, w0, in_ch)
            if PRE[i]:
                x = ln(x, (in_ch,), nw, nb)
            x = x.permute(0, 3, 1, 2)
        x = torch.nn.functional.conv2d(x, w, b, stride=STR[i],
                                       padding=PAD[i])
        size = (x.shape[2], x.shape[3])
        x = x.flatten(2).transpose(1, 2)       # [1, N, C]
        if not PRE[i]:
            x = ln(x, (dim,), nw, nb)

        for j in range(DEPTHS[i]):
            for blk, att, hg in (
                    ("spatial_block", "window_attn", HEADS[i]),
                    ("channel_block", "channel_attn", GROUPS[i])):
                o = f"vision_tower.blocks.{i}.{j}.{blk}."
                t = lambda k: torch.tensor(out[o + k])  # noqa: E731
                h0, w0 = size
                # conv1 residual (depthwise)
                dw = x.transpose(1, 2).view(1, dim, h0, w0)
                dw = torch.nn.functional.conv2d(
                    dw, t("conv1.fn.dw.weight"), t("conv1.fn.dw.bias"),
                    padding=1, groups=dim)
                x = x + dw.flatten(2).transpose(1, 2)
                xn = ln(x, (dim,), t(f"{att}.norm.weight"),
                        t(f"{att}.norm.bias"))
                qkv_w = t(f"{att}.fn.qkv.weight")
                qkv_b = t(f"{att}.fn.qkv.bias")
                proj_w = t(f"{att}.fn.proj.weight")
                proj_b = t(f"{att}.fn.proj.bias")
                if blk == "spatial_block":
                    ws = WIN
                    B, L, C = xn.shape
                    img = xn.view(B, h0, w0, C)
                    pad_r = (ws - w0 % ws) % ws
                    pad_b = (ws - h0 % ws) % ws
                    img = torch.nn.functional.pad(
                        img, (0, 0, 0, pad_r, 0, pad_b))
                    Hp, Wp = img.shape[1:3]
                    win = img.view(B, Hp // ws, ws, Wp // ws, ws, C) \
                        .permute(0, 1, 3, 2, 4, 5) \
                        .reshape(-1, ws * ws, C)
                    qkv = (win @ qkv_w.T + qkv_b).reshape(
                        -1, ws * ws, 3, hg, C // hg).permute(
                            2, 0, 3, 1, 4)
                    q, k, v = qkv[0], qkv[1], qkv[2]
                    a = torch.nn.functional \
                        .scaled_dot_product_attention(q, k, v)
                    a = a.transpose(1, 2).reshape(-1, ws * ws, C)
                    a = a @ proj_w.T + proj_b
                    a = a.view(-1, Hp // ws, Wp // ws, ws, ws, C) \
                        .permute(0, 1, 3, 2, 4, 5) \
                        .reshape(B, Hp, Wp, C)[:, :h0, :w0] \
                        .reshape(B, L, C)
                    x = x + a
                else:
                    B, N, C = xn.shape
                    qkv = (xn @ qkv_w.T + qkv_b).reshape(
                        B, N, 3, hg, C // hg).permute(2, 0, 3, 1, 4)
                    q, k, v = qkv[0], qkv[1], qkv[2]
                    q = q * (float(N) ** -0.5)
                    att_m = (q.transpose(-1, -2) @ k).softmax(dim=-1)
                    a = (att_m @ v.transpose(-1, -2)).transpose(-1, -2)
                    a = a.transpose(1, 2).reshape(B, N, C)
                    x = x + (a @ proj_w.T + proj_b)
                dw = x.transpose(1, 2).view(1, dim, h0, w0)
                dw = torch.nn.functional.conv2d(
                    dw, t("conv2.fn.dw.weight"), t("conv2.fn.dw.bias"),
                    padding=1, groups=dim)
                x = x + dw.flatten(2).transpose(1, 2)
                xn = ln(x, (dim,), t("ffn.norm.weight"),
                        t("ffn.norm.bias"))
                h = torch.nn.functional.gelu(
                    xn @ t("ffn.fn.net.fc1.weight").T
                    + t("ffn.fn.net.fc1.bias"))
                x = x + h @ t("ffn.fn.net.fc2.weight").T + \
                    t("ffn.fn.net.fc2.bias")
        # back to image layout for the next stage conv
        x = x  # stays [1, N, C]; stage entry reshapes

    # bridge
    c = DIMS[-1]
    h0, w0 = size
    xi = x.view(1, h0, w0, c)
    col = torch.tensor(
        out["image_pos_embed.column_embeddings.weight"])[:w0]
    row = torch.tensor(
        out["image_pos_embed.row_embeddings.weight"])[:h0]
    pos = torch.cat([col.unsqueeze(0).repeat(h0, 1, 1),
                     row.unsqueeze(1).repeat(1, w0, 1)], dim=-1)
    xi = xi + pos[None]
    xi = xi.view(1, h0 * w0, c)
    # cosine temporal, T=1 -> row 0
    den = torch.exp(-math.log(10000)
                    * torch.arange(0, c, 2).float() / c)
    t0 = torch.zeros(c)
    t0[0::2] = torch.sin(0 * den)
    t0[1::2] = torch.cos(0 * den)
    xi = xi + t0
    feats = [xi.mean(dim=1, keepdim=True), xi]
    xcat = torch.cat(feats, dim=1)
    xcat = xcat @ torch.tensor(out["image_projection"])
    return ln(xcat, (DM,), torch.tensor(out["image_proj_norm.weight"]),
              torch.tensor(out["image_proj_norm.bias"]))


def test_florence2_vision_golden_and_e2e(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d, out = _build(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(42)
    px = rng.standard_normal((3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        want = _torch_vision(out, px).numpy()[0]
    import jax
    r = llm.llm_engine.engine_core.runner
    ours = np.asarray(jax.device_get(r.model.encode_image(
        jax.device_get(r.params)["vision"], px)))
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)

    # e2e: decoder generates against (image + encoder text) states
    enc_ids = [5, 6, 7, 8]
    prompt = {"prompt_token_ids": [1],
              "multi_modal_data": {
                  "encoder": enc_ids,
                  "image": {"pixel_values": px}}}
    got = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=6,
        ignore_eos=True))[0].outputs[0].token_ids
    got2 = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=6,
        ignore_eos=True))[0].outputs[0].token_ids
    assert got == got2 and len(got) == 6
    # text-only encoder prompt also works (no image)
    got3 = llm.generate(
        [{"prompt_token_ids": [1],
          "multi_modal_data": {"encoder": enc_ids}}],
        SamplingParams(temperature=0.0, max_tokens=4,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert len(got3) == 4
