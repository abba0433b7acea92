"""MiniCPM-V vs a composed torch golden (reference models/minicpmv.py
role). MiniCPM-V ships as trust_remote_code; the golden composes the
HF SiglipVisionModel (idefics2/3-style tower — here a full-square image
so standard positions bucketize identically) + the Resampler2_5 math in
torch (learned queries, kv_proj, sincos-on-keys MHA, ln_post, proj)
+ Qwen2ForCausalLM via inputs_embeds."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VSIZE, PATCH, VDIM = 28, 14, 32
QN, D = 3, 48  # query_num, LLM hidden (heads = max(D//128,1) = 1)


def _build_parts(tmp_path):
    from safetensors.numpy import save_file
    from transformers import (Idefics3VisionConfig, Qwen2Config,
                              Qwen2ForCausalLM)
    from transformers.models.idefics3.modeling_idefics3 import \
        Idefics3VisionTransformer
    torch.manual_seed(0)
    vc = Idefics3VisionConfig(hidden_size=VDIM, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=2,
                              image_size=VSIZE, patch_size=PATCH)
    vpm = Idefics3VisionTransformer(vc).eval().float()
    tc = Qwen2Config(vocab_size=128, hidden_size=D,
                     intermediate_size=96, num_hidden_layers=2,
                     num_attention_heads=2, num_key_value_heads=1,
                     max_position_embeddings=128,
                     tie_word_embeddings=False)
    lm = Qwen2ForCausalLM(tc).eval().float()

    g = torch.Generator().manual_seed(1)
    query = torch.randn(QN, D, generator=g) * 0.1
    kv_w = torch.randn(D, VDIM, generator=g) * 0.1      # torch [out, in]
    in_w = torch.randn(3 * D, D, generator=g) * 0.1
    in_b = torch.randn(3 * D, generator=g) * 0.02
    out_w = torch.randn(D, D, generator=g) * 0.1
    out_b = torch.randn(D, generator=g) * 0.02
    proj = torch.randn(D, D, generator=g) * (D ** -0.5)
    lns = {n: (torch.randn(D, generator=g) * 0.1 + 1.0,
               torch.randn(D, generator=g) * 0.02)
           for n in ("ln_q", "ln_kv", "ln_post")}

    d = tmp_path / "minicpmv"
    d.mkdir()
    out = {}
    for k, v in vpm.state_dict().items():
        out["vpm." + k] = v.numpy()
    for k, v in lm.state_dict().items():
        out["llm." + k] = v.numpy()
    out["resampler.query"] = query.numpy()
    out["resampler.kv_proj.weight"] = kv_w.numpy()
    out["resampler.attn.in_proj_weight"] = in_w.numpy()
    out["resampler.attn.in_proj_bias"] = in_b.numpy()
    out["resampler.attn.out_proj.weight"] = out_w.numpy()
    out["resampler.attn.out_proj.bias"] = out_b.numpy()
    out["resampler.proj"] = proj.numpy()
    for n, (w, b) in lns.items():
        out[f"resampler.{n}.weight"] = w.numpy()
        out[f"resampler.{n}.bias"] = b.numpy()
    save_file(out, str(d / "model.safetensors"))
    json.dump({
        "architectures": ["MiniCPMV"], "model_type": "minicpmv",
        "version": 2.6, "query_num": QN, "image_token_id": 120,
        "vocab_size": 128, "hidden_size": D, "intermediate_size": 96,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "num_key_value_heads": 1, "max_position_embeddings": 128,
        "rms_norm_eps": tc.rms_norm_eps, "tie_word_embeddings": False,
        "vision_config": {
            "hidden_size": VDIM, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "image_size": VSIZE, "patch_size": PATCH},
    }, open(d / "config.json", "w"))
    return d, vpm, lm, (query, kv_w, in_w, in_b, out_w, out_b, proj, lns)


def _torch_ln(x, w, b, eps=1e-6):
    return torch.nn.functional.layer_norm(x, (x.shape[-1],), w, b, eps)


def test_minicpmv_matches_composed_golden(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.models.minicpmv import sincos_2d
    d, vpm, lm, (query, kv_w, in_w, in_b, out_w, out_b, proj, lns) = \
        _build_parts(tmp_path)
    rng = np.random.default_rng(14)
    px = rng.standard_normal((1, 3, VSIZE, VSIZE)).astype(np.float32)
    side = VSIZE // PATCH

    with torch.no_grad():
        feats = vpm(torch.tensor(px)).last_hidden_state   # [1, 4, VDIM]
        kv = feats @ kv_w.T
        kv = _torch_ln(kv, *lns["ln_kv"])
        pos = torch.tensor(sincos_2d(D, side, side)
                           .reshape(-1, D), dtype=torch.float32)
        q = _torch_ln(query, *lns["ln_q"])
        attn = torch.nn.MultiheadAttention(D, max(D // 128, 1),
                                           batch_first=False)
        attn.in_proj_weight.data = in_w
        attn.in_proj_bias.data = in_b
        attn.out_proj.weight.data = out_w
        attn.out_proj.bias.data = out_b
        out = attn(q[:, None, :],                         # Q, B, D
                   (kv[0] + pos)[:, None, :],
                   kv[0][:, None, :])[0].permute(1, 0, 2)
        out = _torch_ln(out, *lns["ln_post"]) @ proj      # [1, QN, D]
        audio_embeds = out[0]

        pre = [3, 9, 11]
        post = [21, 17]
        ids = pre + [0] * QN + post
        embeds = lm.get_input_embeddings()(torch.tensor([ids]))
        embeds[0, len(pre):len(pre) + QN] = audio_embeds
        gen = lm.generate(inputs_embeds=embeds, max_new_tokens=8,
                          do_sample=False, num_beams=1, pad_token_id=0)
    exp = gen[0].tolist()[-8:]

    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    got = llm.generate(
        [{"prompt_token_ids": pre + [120] + post,
          "multi_modal_data": {"image": {"pixel_values": px[0]}}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (got, exp)
