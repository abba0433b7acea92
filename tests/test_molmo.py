"""Molmo: CLIP ViT (multi-layer concat) + 2x2 attention pooling +
SwiGLU projector on a llama-math decoder with fused att_proj,
MulAndSilu ff_proj, full qk RMSNorm, norm-after block and the split
wte (+128 extra embedding rows) — reference models/molmo.py role. The
vision stack is goldened against a torch replica of the reference
module math; the decoder path is covered by e2e determinism (its math
is the shared LlamaModel, HF-goldened elsewhere)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VSIZE, PATCH, E, HEADS, VL = 16, 4, 32, 2, 3   # side 4 -> pooled 2x2
VMLP = 64
VIT_LAYERS = (-1, -3)
TH, INTER2 = 64, 96        # decoder hidden, halved intermediate
EMB = 512                  # embedding_size (vocab)


def _build(tmp_path, norm_after=True):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(31)

    def r(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)
    out = {}
    vb = "model.vision_backbone."
    out[vb + "image_vit.patch_embedding.weight"] = r(E, PATCH * PATCH * 3)
    out[vb + "image_vit.class_embedding"] = r(E)
    out[vb + "image_vit.positional_embedding"] = r(17, E)
    out[vb + "image_vit.pre_ln.weight"] = np.ones(E, np.float32)
    out[vb + "image_vit.pre_ln.bias"] = np.zeros(E, np.float32)
    for li in range(VL):
        o = vb + f"image_vit.transformer.resblocks.{li}."
        for nm in ("wq", "wk", "wv", "wo"):
            out[o + f"attention.{nm}.weight"] = r(E, E)
            out[o + f"attention.{nm}.bias"] = r(E)
        out[o + "feed_forward.w1.weight"] = r(VMLP, E)
        out[o + "feed_forward.w1.bias"] = r(VMLP)
        out[o + "feed_forward.w2.weight"] = r(E, VMLP)
        out[o + "feed_forward.w2.bias"] = r(E)
        out[o + "attention_norm.weight"] = np.ones(E, np.float32)
        out[o + "attention_norm.bias"] = np.zeros(E, np.float32)
        out[o + "ffn_norm.weight"] = np.ones(E, np.float32)
        out[o + "ffn_norm.bias"] = np.zeros(E, np.float32)
    cat = E * 2
    for nm, (i, o_) in (("wq", (cat, E)), ("wk", (cat, E)),
                        ("wv", (cat, E)), ("wo", (E, E))):
        out[vb + f"image_pooling_2d.{nm}.weight"] = r(o_, i)
        out[vb + f"image_pooling_2d.{nm}.bias"] = r(o_)
    out[vb + "image_projector.w1.weight"] = r(INTER2, E)
    out[vb + "image_projector.w3.weight"] = r(INTER2, E)
    out[vb + "image_projector.w2.weight"] = r(TH, INTER2)
    out[vb + "pad_embed"] = r(2, cat)

    # decoder (fused att_proj, ff_proj [mult || gate], norm-after)
    heads, kvh, d = 4, 2, TH // 4
    mt = "model.transformer."
    out[mt + "wte.embedding"] = r(EMB, TH)
    out[mt + "wte.new_embedding"] = r(128, TH)
    out[mt + "ln_f.weight"] = np.ones(TH, np.float32)
    out[mt + "ff_out.weight"] = r(EMB, TH)
    for li in range(2):
        o = mt + f"blocks.{li}."
        out[o + "att_proj.weight"] = r(TH + 2 * kvh * d, TH)
        out[o + "attn_out.weight"] = r(TH, TH)
        out[o + "ff_proj.weight"] = r(2 * INTER2, TH)
        out[o + "ff_out.weight"] = r(TH, INTER2)
        out[o + "attn_norm.weight"] = np.ones(TH, np.float32)
        out[o + "ff_norm.weight"] = np.ones(TH, np.float32)
        out[o + "q_norm.weight"] = np.ones(TH, np.float32)
        out[o + "k_norm.weight"] = np.ones(kvh * d, np.float32)
    dd = tmp_path / "molmo"
    dd.mkdir()
    save_file(out, str(dd / "model.safetensors"))
    json.dump({"architectures": ["MolmoForCausalLM"],
               "model_type": "molmo",
               "vocab_size": EMB, "embedding_size": EMB,
               "hidden_size": TH, "intermediate_size": 2 * INTER2,
               "num_hidden_layers": 2, "num_attention_heads": heads,
               "num_key_value_heads": kvh, "layer_norm_eps": 1e-6,
               "max_position_embeddings": 256, "rope_theta": 10000,
               "qkv_bias": False, "norm_after": norm_after,
               "attention_layer_norm": True, "weight_tying": False,
               "additional_vocab_size": 128,
               "image_patch_id": EMB + 2,
               "vision_config": {"image_size": VSIZE,
                                 "patch_size": PATCH, "emb": E,
                                 "heads": HEADS, "layers": VL,
                                 "mlp": VMLP, "num_pos": 17,
                                 "vit_layers": list(VIT_LAYERS)}},
              open(dd / "config.json", "w"))
    return dd, out


def _torch_vision(out, px):
    """torch replica of reference MolmoVisionBackbone.forward (single
    base crop, all-ones mask)."""
    vb = "model.vision_backbone."
    t = lambda k: torch.tensor(out[vb + k])  # noqa: E731
    ln = torch.nn.functional.layer_norm
    b = px.shape[0]
    side = VSIZE // PATCH
    x = torch.tensor(px).permute(0, 2, 3, 1)
    x = x.reshape(b, side, PATCH, side, PATCH, 3)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, side * side, -1)
    x = x @ t("image_vit.patch_embedding.weight").T
    cls = t("image_vit.class_embedding").view(1, 1, -1).expand(b, 1, -1)
    x = torch.cat([cls, x], dim=1)
    x = x + t("image_vit.positional_embedding")[None]
    x = ln(x, (E,), t("image_vit.pre_ln.weight"),
           t("image_vit.pre_ln.bias"), eps=1e-5)

    def attn(prefix, q_in, kv_in, heads):
        hd = E // heads
        tt = lambda k: torch.tensor(out[prefix + k])  # noqa: E731
        q = q_in @ tt("wq.weight").T + tt("wq.bias")
        k = kv_in @ tt("wk.weight").T + tt("wk.bias")
        v = kv_in @ tt("wv.weight").T + tt("wv.bias")
        bq, sq, _ = q.shape
        sk = k.shape[1]
        q = q.view(bq, sq, heads, hd).transpose(1, 2)
        k = k.view(bq, sk, heads, hd).transpose(1, 2)
        v = v.view(bq, sk, heads, hd).transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(bq, sq, E)
        return o @ tt("wo.weight").T + tt("wo.bias")

    hiddens = []
    for li in range(VL):
        o = vb + f"image_vit.transformer.resblocks.{li}."
        tt = lambda k: torch.tensor(out[o + k])  # noqa: E731
        xn = ln(x, (E,), tt("attention_norm.weight"),
                tt("attention_norm.bias"), eps=1e-5)
        x = x + attn(o + "attention.", xn, xn, HEADS)
        h = ln(x, (E,), tt("ffn_norm.weight"), tt("ffn_norm.bias"),
               eps=1e-5)
        h = h @ tt("feed_forward.w1.weight").T + \
            tt("feed_forward.w1.bias")
        h = h * torch.sigmoid(1.702 * h)
        x = x + h @ tt("feed_forward.w2.weight").T + \
            tt("feed_forward.w2.bias")
        hiddens.append(x)
    feats = torch.cat([hiddens[i] for i in VIT_LAYERS], dim=-1)
    feats = feats[:, 1:]
    cat = feats.shape[-1]
    g = side // 2
    cells = feats.reshape(b, g, 2, g, 2, cat)
    cells = cells.permute(0, 1, 3, 2, 4, 5).reshape(b * g * g, 4, cat)
    query = cells.mean(dim=1, keepdim=True)

    # pooling attention (kv_dim = cat, embed = E)
    pp = vb + "image_pooling_2d."
    tt = lambda k: torch.tensor(out[pp + k])  # noqa: E731
    hd = E // HEADS
    q = query @ tt("wq.weight").T + tt("wq.bias")
    k = cells @ tt("wk.weight").T + tt("wk.bias")
    v = cells @ tt("wv.weight").T + tt("wv.bias")
    bq = q.shape[0]
    q = q.view(bq, 1, HEADS, hd).transpose(1, 2)
    k = k.view(bq, 4, HEADS, hd).transpose(1, 2)
    v = v.view(bq, 4, HEADS, hd).transpose(1, 2)
    o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).reshape(bq, 1, E)
    pooled = (o @ tt("wo.weight").T + tt("wo.bias")).reshape(b, g * g, E)

    pj = vb + "image_projector."
    tp = lambda k: torch.tensor(out[pj + k])  # noqa: E731
    gate = pooled @ tp("w1.weight").T
    up = pooled @ tp("w3.weight").T
    return (torch.nn.functional.silu(gate) * up) @ tp("w2.weight").T


def test_molmo_vision_golden_and_e2e(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d, out = _build(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(32)
    px = rng.standard_normal((1, 3, VSIZE, VSIZE)).astype(np.float32)
    with torch.no_grad():
        want = _torch_vision(out, px).numpy()
    import jax
    r = llm.llm_engine.engine_core.runner
    ours = np.asarray(jax.device_get(r.model.encode_images(
        jax.device_get(r.params)["vision"], px)))
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)
    # e2e with the <im_patch> placeholder in the EXTRA embedding rows
    prompt = {"prompt_token_ids": [3, EMB + 1, EMB + 2, EMB + 3, 9],
              "multi_modal_data": {"image": {"pixel_values": px[0]}}}
    got = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=6,
        ignore_eos=True))[0].outputs[0].token_ids
    got2 = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=6,
        ignore_eos=True))[0].outputs[0].token_ids
    assert got == got2 and len(got) == 6
    assert all(t < EMB for t in got)  # logits exclude the extra rows


def test_molmo_prenorm_variant(tmp_path):
    """norm_after=False maps attn_norm/ff_norm onto the standard
    pre-norm llama names."""
    from vllm_pq_tpu import LLM, SamplingParams
    d, _ = _build(tmp_path, norm_after=False)
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    got = llm.generate(
        [{"prompt_token_ids": [5, 6, 7]}],
        SamplingParams(temperature=0.0, max_tokens=5,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert len(got) == 5
