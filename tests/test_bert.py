"""BERT-family encoder models: HF-golden embeddings + cross-encoder
scoring, the /v1/embeddings (incl. MP engine), /v1/score and /v1/rerank
endpoints (VERDICT round-1 items #7/#10; reference models/bert.py +
serving_score.py)."""

import asyncio
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _save_tiny_bert(tmp_path, classifier=False, num_labels=1, seed=0):
    from transformers import (BertConfig, BertForSequenceClassification,
                              BertModel)
    cfg = BertConfig(vocab_size=512, hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=128,
                     num_labels=num_labels)
    torch.manual_seed(seed)
    hf = (BertForSequenceClassification(cfg) if classifier
          else BertModel(cfg)).eval().float()
    d = tmp_path / ("bert_cls" if classifier else "bert")
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _llm(d):
    from vllm_pq_tpu import LLM
    return LLM(model=str(d), dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
               num_kv_blocks=16)


def test_bert_embeddings_match_hf(tmp_path):
    d, hf = _save_tiny_bert(tmp_path)
    llm = _llm(d)
    prompt = [101, 7, 42, 99, 321, 102]
    with torch.no_grad():
        out = hf(torch.tensor([prompt]))
    ref_cls = out.last_hidden_state[0, 0].numpy()
    got = llm.embed([{"prompt_token_ids": prompt}])[0]
    assert np.allclose(got, ref_cls, atol=2e-4), \
        np.abs(got - ref_cls).max()
    # pooler pooling matches HF pooler_output
    got_pooled = llm.encode([{"prompt_token_ids": prompt}],
                            pooling_type="pooler")[0]
    ref_pooled = out.pooler_output[0].numpy()
    assert np.allclose(got_pooled, ref_pooled, atol=2e-4)


def test_bert_classifier_matches_hf(tmp_path):
    d, hf = _save_tiny_bert(tmp_path, classifier=True, num_labels=3)
    llm = _llm(d)
    prompt = [101, 5, 6, 7, 102]
    with torch.no_grad():
        ref = hf(torch.tensor([prompt])).logits[0].numpy()
    got = llm.classify([{"prompt_token_ids": prompt}])[0]
    assert np.allclose(got, ref, atol=2e-4), np.abs(got - ref).max()


def test_bert_score_pairs(tmp_path):
    d, hf = _save_tiny_bert(tmp_path, classifier=True, num_labels=1)
    llm = _llm(d)
    scores = llm.score("aa bb", ["cc dd", "ee ff gg"])
    assert len(scores) == 2
    assert all(0.0 <= s <= 1.0 for s in scores)
    # token_type_ids must match HF's pair encoding
    tok = llm.get_tokenizer()
    ia = list(tok.encode("aa bb"))
    ib = list(tok.encode("cc dd"))
    with torch.no_grad():
        ref = hf(torch.tensor([ia + ib]),
                 token_type_ids=torch.tensor(
                     [[0] * len(ia) + [1] * len(ib)])).logits[0, 0]
    ref_s = float(torch.sigmoid(ref))
    assert abs(scores[0] - ref_s) < 1e-4


def test_embeddings_endpoint_and_rerank(tmp_path):
    from aiohttp.test_utils import TestClient, TestServer
    from vllm_pq_tpu.engine.arg_utils import EngineArgs
    from vllm_pq_tpu.engine.async_llm import AsyncLLM
    from vllm_pq_tpu.entrypoints.openai.api_server import build_app

    d, _ = _save_tiny_bert(tmp_path, classifier=True, num_labels=1)
    eng = AsyncLLM(EngineArgs(
        model=str(d), dtype="float32", max_model_len=128, max_num_seqs=4,
        max_num_batched_tokens=128, block_size=16,
        num_kv_blocks=16).create_engine_config())

    async def go():
        client = TestClient(TestServer(build_app(eng, "bert", 128)))
        await client.start_server()
        try:
            r = await client.post("/v1/embeddings",
                                  json={"input": ["hello world", "bye"]})
            assert r.status == 200, await r.text()
            data = (await r.json())["data"]
            assert len(data) == 2 and len(data[0]["embedding"]) == 64

            r = await client.post("/v1/score", json={
                "text_1": "query text", "text_2": ["doc a", "doc b"]})
            assert r.status == 200, await r.text()
            scores = (await r.json())["data"]
            assert len(scores) == 2

            r = await client.post("/v1/rerank", json={
                "query": "q", "documents": ["d1", "d2", "d3"],
                "top_n": 2})
            assert r.status == 200, await r.text()
            res = (await r.json())["results"]
            assert len(res) == 2
            assert res[0]["relevance_score"] >= res[1]["relevance_score"]
        finally:
            await client.close()
    try:
        asyncio.run(go())
    finally:
        eng.shutdown()


def test_decoder_embeddings_endpoint_mp_engine(tmp_path):
    """Round-1's /v1/embeddings 501 under the MP engine is gone: the
    encode RPC reaches the background engine process."""
    cfg = {"architectures": ["LlamaForCausalLM"], "vocab_size": 512,
           "hidden_size": 64, "intermediate_size": 128,
           "num_hidden_layers": 2, "num_attention_heads": 2,
           "num_key_value_heads": 2, "max_position_embeddings": 256}
    d = tmp_path / "m"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    from vllm_pq_tpu import LLM
    llm = LLM(model=str(d), load_format="dummy", dtype="float32",
              max_model_len=128, max_num_seqs=4,
              max_num_batched_tokens=128, block_size=16, num_kv_blocks=32,
              enable_engine_multiprocessing=True)
    try:
        core = llm.llm_engine.engine_core
        assert type(core).__name__ == "MPEngineCoreClient"
        embs = core.encode([[5, 6, 7], [9, 10]], None)
        assert len(embs) == 2 and embs[0].shape == (64,)
    finally:
        core.shutdown()


def test_roberta_classifier_matches_hf(tmp_path):
    """Roberta positions start at padding_idx+1 (HF
    create_position_ids_from_input_ids); golden guards the offset."""
    import numpy as np
    import torch
    from transformers import (RobertaConfig,
                              RobertaForSequenceClassification)
    cfg = RobertaConfig(vocab_size=256, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=2, max_position_embeddings=130,
                        num_labels=3, pad_token_id=1, type_vocab_size=1)
    torch.manual_seed(0)
    hf = RobertaForSequenceClassification(cfg).eval().float()
    d = tmp_path / "roberta"
    hf.save_pretrained(d, safe_serialization=True)
    from vllm_pq_tpu import LLM
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=64)
    rng = np.random.default_rng(2)
    for _ in range(2):
        ids = rng.integers(2, 250, int(rng.integers(3, 12))).tolist()
        got = llm.classify([{"prompt_token_ids": ids}])[0]
        with torch.no_grad():
            want = hf(torch.tensor([ids])).logits[0].numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)
