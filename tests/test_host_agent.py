"""Multi-host lockstep protocol: a follower runner fed the rank-0
step-broadcast payloads must produce token-for-token identical results
(in-process loopback; real multi-host uses the same codec over ZMQ)."""

import json

import numpy as np
import pytest

from vllm_pq_tpu.parallel.host_agent import decode_msg, encode_step

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


def test_lockstep_follower_equivalence(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.config import EngineConfig
    from vllm_pq_tpu.worker.worker import Worker

    d = tmp_path / "m"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    kw = dict(model=str(d), load_format="dummy", dtype="float32",
              max_model_len=128, max_num_seqs=8,
              max_num_batched_tokens=128, block_size=16, num_kv_blocks=64)
    llm = LLM(**kw)
    eng = llm.llm_engine
    core = eng.engine_core

    # follower: an independent worker/runner built from the same config
    from vllm_pq_tpu.engine.arg_utils import EngineArgs
    config = EngineArgs(**kw).create_engine_config()
    fw = Worker(config)
    fw.load_model()
    follower = fw.init_runner(fw.determine_num_kv_blocks())

    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    eng.add_request("a", {"prompt_token_ids": [7, 8, 9, 10]}, sp)
    eng.add_request("b", {"prompt_token_ids": [3, 4, 5]}, sp)

    # drive rank-0 manually; replay each payload (through the wire
    # codec) into the follower
    rank0_tokens = {}
    while core.has_unfinished_requests():
        so = core.scheduler.schedule()
        payload = decode_msg(encode_step(so, core._pending_meta))
        out0 = core.runner.execute_model(so, core._pending_meta)
        out1 = follower.execute_model(*payload)
        assert out1.sampled_token_ids == out0.sampled_token_ids
        for nr in so.scheduled_new_reqs:
            core._pending_meta.pop(nr.req_id, None)
        for rid, toks in out0.sampled_token_ids.items():
            rank0_tokens.setdefault(rid, []).extend(toks)
        core.scheduler.update_from_output(so, out0)
    assert len(rank0_tokens["a"]) >= 10


def test_codec_stop():
    assert decode_msg(b"Q") is None
