"""BART encoder-decoder text generation vs HF goldens (reference
models/bart.py role). The encoder prompt rides
multi_modal_data={"encoder": [...]}; prompt_token_ids is the decoder
prompt."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tiny_bart(tmp_path, seed=0, scale_embedding=False):
    from transformers import BartConfig, BartForConditionalGeneration
    cfg = BartConfig(vocab_size=128, d_model=64, encoder_layers=2,
                     decoder_layers=2, encoder_attention_heads=2,
                     decoder_attention_heads=2, encoder_ffn_dim=96,
                     decoder_ffn_dim=96, max_position_embeddings=128,
                     scale_embedding=scale_embedding,
                     bos_token_id=0, eos_token_id=1, pad_token_id=2,
                     decoder_start_token_id=1, forced_eos_token_id=None)
    torch.manual_seed(seed)
    hf = BartForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "bart"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, cfg


@pytest.mark.parametrize("scale_embedding", [False, True])
def test_bart_matches_hf(tmp_path, scale_embedding):
    from vllm_pq_tpu import LLM, SamplingParams
    d, hf, cfg = _tiny_bart(tmp_path, scale_embedding=scale_embedding)
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(0)
    for trial in range(3):
        enc_ids = rng.integers(4, 126, int(rng.integers(5, 12))).tolist()
        dec_prompt = [int(cfg.decoder_start_token_id)] + \
            rng.integers(4, 126, int(rng.integers(0, 3))).tolist()
        with torch.no_grad():
            out = hf.generate(
                input_ids=torch.tensor([enc_ids]),
                decoder_input_ids=torch.tensor([dec_prompt]),
                max_new_tokens=8, do_sample=False, num_beams=1,
                min_new_tokens=8)
        exp = out[0, len(dec_prompt):].tolist()
        got = llm.generate(
            [{"prompt_token_ids": dec_prompt,
              "multi_modal_data": {"encoder": enc_ids}}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (trial, got, exp)
