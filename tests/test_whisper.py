"""Whisper encoder-decoder vs HF goldens (reference models/whisper.py —
the enc-dec + cross-attention-KV family)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_whisper(tmp_path, seed=0):
    from transformers import WhisperConfig, WhisperForConditionalGeneration
    cfg = WhisperConfig(
        vocab_size=256, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, decoder_layers=2,
        decoder_attention_heads=4, encoder_ffn_dim=128,
        decoder_ffn_dim=128, num_mel_bins=16, max_source_positions=32,
        max_target_positions=64, decoder_start_token_id=1,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(seed)
    hf = WhisperForConditionalGeneration(cfg).eval().float()
    hf.config.architectures = ["WhisperForConditionalGeneration"]
    # plain greedy golden: no whisper-specific suppression processors
    hf.generation_config.begin_suppress_tokens = None
    hf.generation_config.suppress_tokens = None
    hf.generation_config.forced_decoder_ids = None
    d = tmp_path / "whisper"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, cfg


def test_whisper_matches_hf(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d, hf, cfg = _tiny_whisper(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(0)
    for trial in range(2):
        # 64 frames -> encoder length 32 (conv stride 2)
        mel = rng.standard_normal((16, 64)).astype(np.float32)
        dec_prompt = [1, int(rng.integers(5, 250))]
        with torch.no_grad():
            out = hf.generate(
                input_features=torch.tensor(mel[None]),
                decoder_input_ids=torch.tensor([dec_prompt]),
                max_new_tokens=8, do_sample=False, num_beams=1)
        seq = out[0].tolist()
        # whisper's generate returns only the continuation (the decoder
        # prompt is treated as prompt_ids and stripped)
        exp = (seq[len(dec_prompt):]
               if seq[:len(dec_prompt)] == dec_prompt else seq)
        got = llm.generate(
            [{"prompt_token_ids": dec_prompt,
              "multi_modal_data": {"audio": mel}}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        # HF may stop at eos; compare the overlapping prefix
        m = min(len(exp), len(got))
        assert m >= 4 and got[:m] == exp[:m], (trial, got, exp)


def test_whisper_batched_requests(tmp_path):
    """Two requests with different audio decode concurrently and match
    their sequential results (per-row encoder-state selection)."""
    from vllm_pq_tpu import LLM, SamplingParams
    d, hf, cfg = _tiny_whisper(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(1)
    mels = [rng.standard_normal((16, 64)).astype(np.float32)
            for _ in range(2)]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    seq = [llm.generate([{"prompt_token_ids": [1, 7],
                          "multi_modal_data": {"audio": m}}], sp
                        )[0].outputs[0].token_ids for m in mels]
    both = llm.generate(
        [{"prompt_token_ids": [1, 7], "multi_modal_data": {"audio": m}}
         for m in mels], sp)
    assert [o.outputs[0].token_ids for o in both] == seq
