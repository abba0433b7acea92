"""Phi-4-multimodal vision path vs a composed torch golden (reference
models/phi4mm.py role): HF SiglipVisionModel tapped at
hidden_states[-2], AvgPool2d(2) token compression, the Phi-3V HD
transform (sub_GN/glb_GN, sub_glb order), Sequential GELU projector,
on the Phi-3/Phi-4-mini decoder via inputs_embeds. The modality LoRA
adapters serve through the standard multi-LoRA path (not exercised
here); audio is not yet implemented."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VSIZE, PATCH = 32, 4   # siglip side 8 -> pool 4 -> merge: side2 = 2
VDIM = 32


def _build_parts(tmp_path):
    from safetensors.numpy import save_file
    from transformers import (Phi3Config, Phi3ForCausalLM,
                              SiglipVisionConfig, SiglipVisionModel)
    torch.manual_seed(0)
    vc = SiglipVisionConfig(hidden_size=VDIM, intermediate_size=64,
                            num_hidden_layers=3, num_attention_heads=2,
                            image_size=VSIZE, patch_size=PATCH)
    sig = SiglipVisionModel(vc).eval().float()
    tc = Phi3Config(vocab_size=128, hidden_size=48,
                    intermediate_size=96, num_hidden_layers=2,
                    num_attention_heads=2, num_key_value_heads=2,
                    max_position_embeddings=256, pad_token_id=0,
                    tie_word_embeddings=False)
    lm = Phi3ForCausalLM(tc).eval().float()

    g = torch.Generator().manual_seed(1)
    c4 = VDIM * 4
    glb_gn = torch.randn(c4, generator=g) * 0.1
    sub_gn = torch.randn(c4, generator=g) * 0.1
    w1 = torch.randn(48, c4, generator=g) * 0.05
    b1 = torch.randn(48, generator=g) * 0.02
    w2 = torch.randn(48, 48, generator=g) * 0.05
    b2 = torch.randn(48, generator=g) * 0.02

    d = tmp_path / "phi4mm"
    d.mkdir()
    out = {}
    pre = "model.embed_tokens_extend.image_embed."
    for k, v in sig.state_dict().items():
        out[pre + "img_processor." + k] = v.numpy()
    for k, v in lm.state_dict().items():
        out[k] = v.numpy()
    out[pre + "glb_GN"] = glb_gn.reshape(1, 1, -1).numpy()
    out[pre + "sub_GN"] = sub_gn.reshape(1, 1, 1, -1).numpy()
    out[pre + "img_projection.0.weight"] = w1.numpy()
    out[pre + "img_projection.0.bias"] = b1.numpy()
    out[pre + "img_projection.2.weight"] = w2.numpy()
    out[pre + "img_projection.2.bias"] = b2.numpy()
    save_file(out, str(d / "model.safetensors"))
    json.dump({
        "architectures": ["Phi4MMForCausalLM"], "model_type": "phi4mm",
        "image_token_id": 120,
        "vocab_size": 128, "hidden_size": 48, "intermediate_size": 96,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "num_key_value_heads": 2, "max_position_embeddings": 256,
        "rms_norm_eps": tc.rms_norm_eps, "tie_word_embeddings": False,
        "vision_config": {
            "hidden_size": VDIM, "intermediate_size": 64,
            "num_hidden_layers": 3, "num_attention_heads": 2,
            "image_size": VSIZE, "patch_size": PATCH},
    }, open(d / "config.json", "w"))
    return d, sig, lm, (glb_gn, sub_gn, w1, b1, w2, b2)


def _merge_2x2(feats, h_crop, w_crop):
    n, l, c = feats.shape
    side = int(l ** 0.5)
    s2 = side // 2
    x = feats.reshape(n, s2, 2, s2, 2, c).permute(0, 1, 3, 2, 4, 5)
    x = x.reshape(n, s2 * s2, 4 * c)
    x = x.reshape(h_crop, w_crop, s2, s2, 4 * c).permute(0, 2, 1, 3, 4)
    return x.reshape(h_crop * s2, w_crop * s2, 4 * c)


def _newline(grid, sub_gn):
    h, w, d = grid.shape
    nl = sub_gn.expand(h, 1, d)
    return torch.cat([grid, nl], dim=1).reshape(-1, d)


@pytest.mark.parametrize("hw_crop", [(1, 1), (2, 1)])
def test_phi4mm_matches_composed_golden(tmp_path, hw_crop):
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.models.phi4mm import phi4mm_feature_span
    d, sig, lm, (glb_gn, sub_gn, w1, b1, w2, b2) = \
        _build_parts(tmp_path)
    h_crop, w_crop = hw_crop
    rng = np.random.default_rng(7)
    px = rng.standard_normal(
        (1 + h_crop * w_crop, 3, VSIZE, VSIZE)).astype(np.float32)

    with torch.no_grad():
        hs = sig(torch.tensor(px),
                 output_hidden_states=True).hidden_states[-2]
        # AvgPool2d(2) token compression
        n, l, c = hs.shape
        side = int(l ** 0.5)
        hs = hs.reshape(n, side, side, c).permute(0, 3, 1, 2)
        hs = torch.nn.functional.avg_pool2d(hs, 2)
        hs = hs.permute(0, 2, 3, 1).reshape(n, (side // 2) ** 2, c)
        glb = _newline(_merge_2x2(hs[0:1], 1, 1),
                       sub_gn.reshape(1, 1, -1))
        sub = _newline(_merge_2x2(hs[1:], h_crop, w_crop),
                       sub_gn.reshape(1, 1, -1))
        emb = torch.cat([sub, glb_gn.reshape(1, -1), glb], dim=0)
        proj = torch.nn.functional.gelu(emb @ w1.T + b1) @ w2.T + b2

        pre = [3, 9, 11]
        post = [21, 17]
        n_img = proj.shape[0]
        assert n_img == phi4mm_feature_span(h_crop, w_crop,
                                            (VSIZE // PATCH) // 4)
        ids = pre + [0] * n_img + post
        embeds = lm.get_input_embeddings()(torch.tensor([ids]))
        embeds[0, len(pre):len(pre) + n_img] = proj
        outs = lm.generate(inputs_embeds=embeds, max_new_tokens=8,
                           do_sample=False, num_beams=1,
                           pad_token_id=0)
    exp = outs[0].tolist()[-8:]

    llm = LLM(model=str(d), dtype="float32", max_model_len=96,
              max_num_seqs=2, max_num_batched_tokens=96, block_size=16,
              num_kv_blocks=48, enable_prefix_caching=False)
    got = llm.generate(
        [{"prompt_token_ids": pre + [120] + post,
          "multi_modal_data": {"image": {
              "pixel_values": px,
              "image_size": (h_crop * VSIZE, w_crop * VSIZE)}}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (hw_crop, got, exp)
