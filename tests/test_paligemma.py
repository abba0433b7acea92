"""PaliGemma: SigLIP tower + linear projector + Gemma LM vs HF goldens
(reference models/paligemma.py role).

The reference runs the PaliGemma prompt CAUSALLY (its paligemma.py
installs no custom prefix mask), while HF's generate() uses the
bidirectional-prefix inference mask — so the goldens here drive HF's
own Gemma LM directly (causal) over HF-spliced embeddings, comparing
exactly the semantics the framework implements."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tiny_paligemma(tmp_path, seed=0):
    from transformers import (GemmaConfig, PaliGemmaConfig,
                              PaliGemmaForConditionalGeneration,
                              SiglipVisionConfig)
    vc = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=16, patch_size=8,
                            projection_dim=64)
    tc = GemmaConfig(vocab_size=128, hidden_size=64,
                     intermediate_size=96, num_hidden_layers=2,
                     num_attention_heads=2, num_key_value_heads=1,
                     head_dim=32, max_position_embeddings=128)
    cfg = PaliGemmaConfig(vision_config=vc, text_config=tc,
                          image_token_index=127, projection_dim=64)
    torch.manual_seed(seed)
    hf = PaliGemmaForConditionalGeneration(cfg).eval().float()
    d = tmp_path / "paligemma"
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, cfg


def _llm(d, **kw):
    from vllm_pq_tpu import LLM
    args = dict(model=str(d), dtype="float32", max_model_len=128,
                max_num_seqs=4, max_num_batched_tokens=128,
                block_size=16, num_kv_blocks=64,
                enable_prefix_caching=False)
    args.update(kw)
    return LLM(**args)


def _hf_causal_golden(hf, ids, pixel_values, n_new):
    """Greedy decode through HF's own modules with CAUSAL attention:
    HF-spliced inputs_embeds -> GemmaModel -> lm_head, recomputed from
    scratch each step (tiny model)."""
    image_tok = hf.config.image_token_index
    with torch.no_grad():
        t = torch.tensor([ids])
        llm_ids = t.masked_fill(t == image_tok, 0)
        embeds = hf.get_input_embeddings()(llm_ids)
        feats = hf.get_image_features(torch.tensor(pixel_values))
        mask = (t == image_tok).unsqueeze(-1).expand_as(embeds)
        embeds = embeds.masked_scatter(
            mask, feats.reshape(-1, feats.shape[-1]).to(embeds.dtype))
        out = []
        cur = embeds
        for _ in range(n_new):
            h = hf.model.language_model(
                inputs_embeds=cur).last_hidden_state
            tok = int(hf.lm_head(h[:, -1]).argmax(-1))
            out.append(tok)
            nxt = hf.get_input_embeddings()(torch.tensor([[tok]]))
            cur = torch.cat([cur, nxt], 1)
        return out


def test_paligemma_matches_hf(tmp_path):
    from vllm_pq_tpu import SamplingParams
    from vllm_pq_tpu.multimodal.image import ImageProcessor
    d, hf, cfg = _tiny_paligemma(tmp_path)
    llm = _llm(d)
    rng = np.random.default_rng(0)
    improc = ImageProcessor(size=16)
    n_img_tok = (16 // 8) ** 2  # 4

    for trial in range(3):
        img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        pre = rng.integers(1, 126, int(rng.integers(2, 6))).tolist()
        post = rng.integers(1, 126, int(rng.integers(2, 6))).tolist()
        ids = pre + [127] + post  # one placeholder, engine expands
        expanded = pre + [127] * n_img_tok + post
        pix = improc(img)[None]
        exp = _hf_causal_golden(hf, expanded, pix, 8)
        got = llm.generate(
            [{"prompt_token_ids": ids,
              "multi_modal_data": {"image": img}}],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))[0].outputs[0].token_ids
        assert got == exp, (trial, got, exp)


def test_paligemma_text_only(tmp_path):
    """No image: plain Gemma decode must run (and match HF generate,
    which is causal for pure decode-from-prompt... also causal in HF
    only for 1-token prompts; use the manual golden)."""
    from vllm_pq_tpu import SamplingParams
    d, hf, cfg = _tiny_paligemma(tmp_path, seed=1)
    llm = _llm(d)
    ids = [3, 17, 42, 9]
    with torch.no_grad():
        out = []
        cur = torch.tensor([ids])
        for _ in range(6):
            h = hf.model.language_model(
                inputs_embeds=hf.get_input_embeddings()(cur)
            ).last_hidden_state
            tok = int(hf.lm_head(h[:, -1]).argmax(-1))
            out.append(tok)
            cur = torch.cat([cur, torch.tensor([[tok]])], 1)
    got = llm.generate(
        [{"prompt_token_ids": ids}],
        SamplingParams(temperature=0.0, max_tokens=6,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == out, (got, out)
