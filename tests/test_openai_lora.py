"""Multi-LoRA serving through the OpenAI API: adapters are served as
additional model ids and routed per-request via the ``model`` field
(role of reference --lora-modules, entrypoints/openai/cli_args.py and
serving_engine.py _maybe_get_adapters)."""

import asyncio
import json

import pytest

TINY = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 512,
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "num_key_value_heads": 2,
    "max_position_embeddings": 512,
}

KW = dict(load_format="dummy", dtype="float32", max_model_len=128,
          max_num_seqs=8, max_num_batched_tokens=128, block_size=16,
          num_kv_blocks=64, enable_lora=True, max_loras=2,
          max_lora_rank=8)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_lora_srv")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    from vllm_pq_tpu.engine.arg_utils import EngineArgs
    from vllm_pq_tpu.engine.async_llm import AsyncLLM
    eng = AsyncLLM(EngineArgs(model=str(d), **KW).create_engine_config())
    # synthetic adapters: a strongly-scaled one (changes outputs) and a
    # zero-scaled one (must match base outputs)
    from vllm_pq_tpu.lora.models import LoRAModel
    model = eng.engine.engine_core.runner.model
    dims = {n: (i, o) for n, i, o, _ in model.lora_linear_defs()}
    for name, seed, scale in [("strong", 7, 50.0), ("zero", 3, 0.0)]:
        eng.install_lora(LoRAModel.from_arrays(
            name, 4, model.cfg.num_hidden_layers, list(dims), dims,
            seed=seed, scale=scale))
    yield eng
    eng.shutdown()


def _client(engine):
    from aiohttp.test_utils import TestClient, TestServer
    from vllm_pq_tpu.entrypoints.openai.api_server import build_app
    app = build_app(engine, "base-model", 128)
    return TestClient(TestServer(app))


def _run(engine, coro_fn):
    async def runner():
        client = _client(engine)
        await client.start_server()
        try:
            return await coro_fn(client)
        finally:
            await client.close()
    return asyncio.run(runner())


def test_models_lists_adapters(engine):
    async def go(client):
        r = await client.get("/v1/models")
        return await r.json()
    data = _run(engine, go)
    ids = [m["id"] for m in data["data"]]
    assert ids[0] == "base-model"
    assert set(ids[1:]) == {"strong", "zero"}
    for m in data["data"][1:]:
        assert m["parent"] == "base-model"


def _completion(client, model):
    return client.post("/v1/completions", json={
        "model": model, "prompt": [5, 6, 7, 8],
        "max_tokens": 8, "temperature": 0.0, "ignore_eos": True})


def test_routing_by_model_field(engine):
    async def go(client):
        outs = {}
        for name in ("base-model", "strong", "zero"):
            r = await _completion(client, name)
            assert r.status == 200, await r.text()
            outs[name] = (await r.json())["choices"][0]["text"]
        return outs
    outs = _run(engine, go)
    assert outs["zero"] == outs["base-model"]
    assert outs["strong"] != outs["base-model"]


def test_unknown_model_404(engine):
    async def go(client):
        r = await _completion(client, "no-such-adapter")
        return r.status, await r.json()
    status, body = _run(engine, go)
    assert status == 404
    assert "not found" in body["error"]["message"]


def test_lora_request_for(engine):
    req = engine.lora_request_for("strong")
    assert req is not None and req.lora_name == "strong"
    assert engine.lora_request_for("nope") is None
