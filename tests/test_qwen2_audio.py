"""Qwen2-Audio: Whisper-style audio tower + AvgPool + linear projector
+ Qwen2 LM, audio-by-splice vs HF goldens (reference
models/qwen2_audio.py role)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

MAX_SRC = 24  # encoder positions; mel input length = 2 * MAX_SRC


def _tiny_qwen2_audio(tmp_path, seed=0):
    from transformers import (Qwen2AudioConfig, Qwen2AudioEncoderConfig,
                              Qwen2AudioForConditionalGeneration,
                              Qwen2Config)
    ac = Qwen2AudioEncoderConfig(d_model=32, encoder_layers=2,
                                 encoder_attention_heads=2,
                                 encoder_ffn_dim=64, num_mel_bins=16,
                                 max_source_positions=MAX_SRC)
    tc = Qwen2Config(vocab_size=128, hidden_size=64,
                     intermediate_size=96, num_hidden_layers=2,
                     num_attention_heads=2, num_key_value_heads=1,
                     max_position_embeddings=128,
                     tie_word_embeddings=False)
    cfg = Qwen2AudioConfig(audio_config=ac, text_config=tc,
                           audio_token_index=127)
    torch.manual_seed(seed)
    hf = Qwen2AudioForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "q2a"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, cfg


@pytest.mark.parametrize("t_true", [2 * MAX_SRC, 30])
def test_qwen2_audio_matches_hf(tmp_path, t_true):
    from vllm_pq_tpu import LLM, SamplingParams
    d, hf, cfg = _tiny_qwen2_audio(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((16, t_true)).astype(np.float32)
    n = ((t_true - 1) // 2 + 1 - 2) // 2 + 1
    pre = rng.integers(1, 126, 4).tolist()
    post = rng.integers(1, 126, 3).tolist()
    ids = pre + [127] + post
    expanded = pre + [127] * n + post

    pad = np.zeros((16, 2 * MAX_SRC), np.float32)
    pad[:, :t_true] = mel
    fam = np.zeros((1, 2 * MAX_SRC), np.int64)
    fam[0, :t_true] = 1
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([expanded]),
            input_features=torch.tensor(pad[None]),
            feature_attention_mask=torch.tensor(fam),
            max_new_tokens=8, do_sample=False, num_beams=1,
            pad_token_id=0)
    exp = out[0, len(expanded):].tolist()
    got = llm.generate(
        [{"prompt_token_ids": ids,
          "multi_modal_data": {"audio": mel}}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (t_true, got, exp)
