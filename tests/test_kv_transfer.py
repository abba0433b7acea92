"""Disaggregated prefill: KV pages computed by a producer engine are
shipped through the connector and injected into a consumer engine's
prefix cache; the consumer's generations must be token-exact vs local
compute (role of reference tests/kv_transfer/, disagg prefill)."""

import json

import numpy as np
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

KW = dict(load_format="dummy", dtype="float32", seed=0, max_model_len=128,
          max_num_seqs=8, max_num_batched_tokens=128, block_size=16,
          num_kv_blocks=64)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_kvt")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    return str(d)


def _wire(llm, role, pipe):
    from vllm_pq_tpu.distributed.kv_transfer.connector import KVConnector
    core = llm.llm_engine.engine_core
    core.kv_connector = KVConnector(role, pipe)
    if role == "kv_producer":
        core.scheduler.on_request_freed = core._send_request_kv
    return core


def _gen(llm, prompts, tokens=8):
    from vllm_pq_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=tokens,
                        ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts], sp)
    return [o.outputs[0].token_ids for o in outs]


def test_disagg_prefill_token_exact(model_dir):
    from vllm_pq_tpu import LLM
    from vllm_pq_tpu.distributed.kv_transfer.connector import InprocPipe

    rng = np.random.default_rng(0)
    # full-block prompts (33 tokens: 2 full blocks + 1 to recompute)
    prompts = [rng.integers(5, 500, 33).tolist() for _ in range(3)]

    producer = LLM(model=model_dir, **KW)
    consumer = LLM(model=model_dir, **KW)
    pipe = InprocPipe()
    _wire(producer, "kv_producer", pipe)
    ccore = _wire(consumer, "kv_consumer", pipe)

    # baseline: consumer computes locally, then forgets the prefix cache
    baseline = _gen(consumer, prompts)
    assert consumer.llm_engine.reset_prefix_cache()

    # producer prefills (1 output token) and ships KV on finish
    _gen(producer, prompts, tokens=1)
    assert len(pipe.queue) == 3

    # consumer decodes with injected KV
    got = _gen(consumer, prompts)
    assert got == baseline

    stats = ccore.scheduler.make_stats()
    # 2 full blocks per prompt came from the injected prefix
    assert stats["prefix_cache_hits"] >= 3 * 2


def test_lookup_miss_and_buffer(model_dir):
    from vllm_pq_tpu.distributed.kv_transfer.connector import (
        InprocPipe, KVConnector, prompt_key)

    pipe = InprocPipe()
    prod = KVConnector("kv_producer", pipe)
    cons = KVConnector("kv_consumer", pipe)
    kv = np.zeros((2, 1, 16, 4, 64), np.float32)
    prod.send_kv([1, 2, 3], 16, kv)
    assert cons.lookup([9, 9, 9]) is None          # miss stays buffered
    got = cons.lookup([1, 2, 3])
    assert got is not None and got[1] == 16
    assert cons.lookup([1, 2, 3]) is None          # drop_select pops


def test_zmq_pipe_roundtrip():
    from vllm_pq_tpu.distributed.kv_transfer.connector import ZmqKVPipe
    import numpy as np
    ep = "tcp://127.0.0.1:5713"
    cons = ZmqKVPipe("kv_consumer", ep)
    prod = ZmqKVPipe("kv_producer", ep)
    payload = (b"k", np.arange(8, dtype=np.float32), 16, [1, 2])
    prod.send(payload)
    import time
    got = None
    for _ in range(100):
        got = cons.recv_nowait()
        if got is not None:
            break
        time.sleep(0.02)
    assert got is not None and got[2] == 16
    np.testing.assert_array_equal(got[1], payload[1])
    prod.close(); cons.close()
