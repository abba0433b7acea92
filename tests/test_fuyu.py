"""Fuyu: raw-patch linear vision embedding + Persimmon decoder vs HF
goldens (reference models/fuyu.py role)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tiny_fuyu(tmp_path, seed=0):
    from transformers import FuyuConfig, FuyuForCausalLM
    cfg = FuyuConfig(vocab_size=128, hidden_size=64,
                     intermediate_size=96, num_hidden_layers=2,
                     num_attention_heads=2,
                     max_position_embeddings=128, patch_size=8,
                     num_channels=3, image_token_id=127)
    torch.manual_seed(seed)
    hf = FuyuForCausalLM(cfg).eval().float()
    d = tmp_path / "fuyu"
    hf.save_pretrained(d, safe_serialization=True)
    # our fixed-size preprocessing subset: 16px -> 2x2 patches of 8
    import json
    raw = json.load(open(d / "config.json"))
    raw["image_size"] = 16
    json.dump(raw, open(d / "config.json", "w"))
    return d, hf, cfg


def _hf_golden(hf, ids, patches, image_tok, n_new):
    """Greedy decode via HF modules: patch embeds spliced at the
    placeholder rows, recomputed from scratch each step."""
    with torch.no_grad():
        t = torch.tensor([ids])
        emb = hf.get_input_embeddings()(
            t.masked_fill(t == image_tok, 0))
        pe = hf.model.vision_embed_tokens(torch.tensor(patches))  # [n, d]
        mask = (t == image_tok).unsqueeze(-1).expand_as(emb)
        emb = emb.masked_scatter(mask, pe.to(emb.dtype))
        out = []
        cur = emb
        for _ in range(n_new):
            h = hf.model.language_model(
                inputs_embeds=cur).last_hidden_state
            tok = int(hf.lm_head(h[:, -1]).argmax(-1))
            out.append(tok)
            cur = torch.cat(
                [cur, hf.get_input_embeddings()(torch.tensor([[tok]]))],
                1)
        return out


def test_fuyu_matches_hf(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf, cfg = _tiny_fuyu(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(0)
    improc = ImageProcessor(size=16)
    n_img_tok = 4  # (16/8)^2

    for trial in range(2):
        img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        pre = rng.integers(1, 126, int(rng.integers(2, 6))).tolist()
        post = rng.integers(1, 126, int(rng.integers(2, 6))).tolist()
        ids = pre + [127] + post
        expanded = pre + [127] * n_img_tok + post
        pix = improc(img)  # [3, 16, 16]
        # HF patchify order: (row, col, channel)
        p = pix.reshape(3, 2, 8, 2, 8).transpose(1, 3, 2, 4, 0) \
            .reshape(4, 8 * 8 * 3)
        exp = _hf_golden(hf, expanded, p, 127, 8)
        got = llm.generate(
            [{"prompt_token_ids": ids,
              "multi_modal_data": {"image": img}}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (trial, got, exp)
