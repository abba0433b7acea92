"""Ultravox speech-language model vs a composed torch golden
(reference models/ultravox.py role). Ultravox ships as trust_remote_code
so there is no transformers class; the golden composes the STANDARD HF
WhisperEncoder + the UltravoxProjector math in torch + the HF Llama LM
via inputs_embeds — exactly the reference composition."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

D_AUDIO, MEL, LAYERS_A = 32, 16, 2
MAX_SRC = 8           # -> mel length 16, conv out 8 frames
SF = 4                # stack factor -> 2 projector frames
PHID = 16             # projector hidden (swiglu halves to 8)


def _build_parts(tmp_path):
    from safetensors.numpy import save_file
    from transformers import (LlamaConfig, LlamaForCausalLM,
                              WhisperConfig, WhisperModel)
    torch.manual_seed(0)
    wc = WhisperConfig(d_model=D_AUDIO, encoder_layers=LAYERS_A,
                       encoder_attention_heads=2, encoder_ffn_dim=64,
                       num_mel_bins=MEL, max_source_positions=MAX_SRC,
                       decoder_layers=1, decoder_attention_heads=2,
                       decoder_ffn_dim=32)
    whisper = WhisperModel(wc).eval().float()
    enc = whisper.encoder
    tc = LlamaConfig(vocab_size=128, hidden_size=48,
                     intermediate_size=96, num_hidden_layers=2,
                     num_attention_heads=2, num_key_value_heads=2,
                     max_position_embeddings=128,
                     tie_word_embeddings=False)
    lm = LlamaForCausalLM(tc).eval().float()

    # torch projector params
    g = torch.Generator().manual_seed(1)
    din = D_AUDIO * SF
    ln_pre = torch.randn(din, generator=g) * 0.1 + 1.0
    w1 = torch.randn(PHID, din, generator=g) * 0.05
    w2 = torch.randn(48, PHID // 2, generator=g) * 0.05
    ln_post = torch.randn(48, generator=g) * 0.1 + 1.0

    # assemble the ultravox checkpoint
    d = tmp_path / "ultravox"
    d.mkdir()
    out = {}
    for k, v in enc.state_dict().items():
        out["audio_tower." + k] = v.numpy()
    for k, v in lm.state_dict().items():
        out["language_model." + k] = v.numpy()
    out["multi_modal_projector.ln_pre.weight"] = ln_pre.numpy()
    out["multi_modal_projector.linear_1.weight"] = w1.numpy()
    out["multi_modal_projector.linear_2.weight"] = w2.numpy()
    out["multi_modal_projector.ln_post.weight"] = ln_post.numpy()
    save_file(out, str(d / "model.safetensors"))
    json.dump({
        "architectures": ["UltravoxModel"], "model_type": "ultravox",
        "audio_token_index": 120, "stack_factor": SF,
        "hidden_size": PHID, "projector_act": "swiglu",
        "projector_ln_mid": False,
        "audio_config": {
            "d_model": D_AUDIO, "encoder_layers": LAYERS_A,
            "encoder_attention_heads": 2, "encoder_ffn_dim": 64,
            "num_mel_bins": MEL, "max_source_positions": MAX_SRC,
            "activation_function": "gelu"},
        "text_config": {
            "architectures": ["LlamaForCausalLM"],
            "model_type": "llama",
            "vocab_size": 128, "hidden_size": 48,
            "intermediate_size": 96, "num_hidden_layers": 2,
            "num_attention_heads": 2, "num_key_value_heads": 2,
            "max_position_embeddings": 128,
            "rms_norm_eps": tc.rms_norm_eps,
            "tie_word_embeddings": False},
    }, open(d / "config.json", "w"))
    return d, enc, lm, (ln_pre, w1, w2, ln_post)


def _torch_rms(x, w, eps=1e-6):
    v = x.pow(2).mean(-1, keepdim=True)
    return x * torch.rsqrt(v + eps) * w


def test_ultravox_matches_composed_golden(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d, enc, lm, (ln_pre, w1, w2, ln_post) = _build_parts(tmp_path)
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((MEL, 2 * MAX_SRC)).astype(np.float32)

    with torch.no_grad():
        feats = enc(torch.tensor(mel[None])).last_hidden_state  # [1,8,32]
        t = feats.shape[1]
        t_pad = -(-t // SF) * SF
        feats = torch.nn.functional.pad(feats, (0, 0, 0, t_pad - t))
        stacked = feats.reshape(1, t_pad // SF, D_AUDIO * SF)
        h = _torch_rms(stacked, ln_pre)
        h = h @ w1.T
        half = h.shape[-1] // 2
        h = h[..., :half] * torch.nn.functional.silu(h[..., half:])
        h = h @ w2.T
        audio_embeds = _torch_rms(h, ln_post)[0]          # [2, 48]

        pre = [3, 9, 11]
        post = [21, 17]
        n_audio = audio_embeds.shape[0]
        ids = pre + [0] * n_audio + post
        embeds = lm.get_input_embeddings()(torch.tensor([ids]))
        embeds[0, len(pre):len(pre) + n_audio] = audio_embeds
        out = lm.generate(inputs_embeds=embeds, max_new_tokens=8,
                          do_sample=False, num_beams=1, pad_token_id=0)
    exp = out[0].tolist()[-8:]

    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    got = llm.generate(
        [{"prompt_token_ids": pre + [120] + post,
          "multi_modal_data": {"audio": mel}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (got, exp)
