"""Background EngineCore process over ZMQ: e2e generation, utility RPCs,
and death detection (role of reference tests/v1/engine/
test_engine_core_client.py + mq_llm_engine error-handling tests)."""

import json
import os
import signal

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


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_mp_model")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    return str(d)


KW = dict(load_format="dummy", dtype="float32", max_model_len=128,
          max_num_seqs=8, max_num_batched_tokens=128, block_size=16,
          num_kv_blocks=64)


@pytest.fixture(scope="module")
def mp_llm(tiny_model_dir):
    from vllm_pq_tpu import LLM
    llm = LLM(model=tiny_model_dir, enable_engine_multiprocessing=True,
              **KW)
    yield llm
    llm.llm_engine.shutdown()


def test_mp_engine_matches_inproc(tiny_model_dir, mp_llm):
    from vllm_pq_tpu import LLM, SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompts = ["hello world", "zmq engine"]
    ref_llm = LLM(model=tiny_model_dir, **KW)
    ref = [o.outputs[0].token_ids for o in ref_llm.generate(prompts, sp)]
    got = [o.outputs[0].token_ids for o in mp_llm.generate(prompts, sp)]
    assert got == ref


def test_mp_engine_utility_rpcs(mp_llm):
    core = mp_llm.llm_engine.engine_core
    stats = core.make_stats()
    assert "kv_cache_usage" in stats
    assert core.reset_prefix_cache() in (True, False)


def test_mp_engine_death_detected(tiny_model_dir):
    from vllm_pq_tpu import LLM, SamplingParams
    from vllm_pq_tpu.engine.core_proc import EngineDeadProcError
    llm = LLM(model=tiny_model_dir, enable_engine_multiprocessing=True,
              **KW)
    core = llm.llm_engine.engine_core
    os.kill(core.proc.pid, signal.SIGKILL)
    core.proc.join(timeout=10)
    with pytest.raises(EngineDeadProcError):
        for _ in range(100):
            core.add_request        # attribute ok; the next call raises
            core.make_stats()


def test_watchdog_detects_silent_kill(tiny_model_dir):
    """SIGKILL on the engine proc (no dead message on the wire) surfaces
    as EngineDeadProcError within the watchdog interval (round-2
    watchdog; role of the reference MQ-engine health-check loop)."""
    import os
    import signal
    import time

    from vllm_pq_tpu.engine.arg_utils import EngineArgs
    from vllm_pq_tpu.engine.core_proc import (EngineDeadProcError,
                                              MPEngineCoreClient)
    cfg = EngineArgs(model=tiny_model_dir, load_format="dummy",
                     dtype="float32", max_model_len=128, max_num_seqs=4,
                     max_num_batched_tokens=128, block_size=16,
                     num_kv_blocks=32).create_engine_config()
    client = MPEngineCoreClient(cfg)
    assert client.health() is True
    os.kill(client.proc.pid, signal.SIGKILL)
    deadline = time.monotonic() + 10.0
    saw_dead = False
    while time.monotonic() < deadline:
        try:
            client.health()
        except EngineDeadProcError:
            saw_dead = True
            break
        time.sleep(0.25)
    assert saw_dead, "watchdog did not flag the killed engine process"
