"""Executor plugin seam (role of reference executor_base +
--distributed-executor-backend selection)."""

import json

import numpy as np

from vllm_pq_tpu.executor.uniproc import UniprocExecutor

TINY = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 512, "hidden_size": 128, "intermediate_size": 256,
    "num_hidden_layers": 2, "num_attention_heads": 2,
    "num_key_value_heads": 2, "max_position_embeddings": 512,
}

class TracingExecutor(UniprocExecutor):
    """Out-of-tree executor: wraps uniproc, records every step.
    (Calls are recorded on the instance: pytest and importlib may load
    this file as two distinct module objects.)"""

    def __init__(self, config):
        super().__init__(config)
        self.calls = []

    def execute_model(self, so, request_meta=None):
        self.calls.append("execute")
        return super().execute_model(so, request_meta)

    def dispatch_model(self, so, request_meta=None):
        self.calls.append("dispatch")
        return super().dispatch_model(so, request_meta)


def _model_dir(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    return str(d)


def test_external_executor_plugin(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    llm = LLM(model=_model_dir(tmp_path), load_format="dummy",
              dtype="float32", max_model_len=128, max_num_seqs=4,
              max_num_batched_tokens=128, block_size=16, num_kv_blocks=64,
              distributed_executor_backend=(
                  "external:tests.test_executor:TracingExecutor"))
    ex = llm.llm_engine.engine_core.executor
    assert type(ex).__name__ == "TracingExecutor"
    out = llm.generate(
        [{"prompt_token_ids": [5, 6, 7, 8]}],
        SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True))
    assert len(out[0].outputs[0].token_ids) == 4
    assert ex.calls and all(c in ("execute", "dispatch")
                            for c in ex.calls)


def test_unknown_backend_rejected(tmp_path):
    from vllm_pq_tpu import LLM
    import pytest
    with pytest.raises((ValueError, Exception)):
        LLM(model=_model_dir(tmp_path), load_format="dummy",
            dtype="float32", max_model_len=128, max_num_seqs=4,
            max_num_batched_tokens=128, block_size=16, num_kv_blocks=64,
            distributed_executor_backend="ray")


def test_uniproc_default_health(tmp_path):
    from vllm_pq_tpu import LLM
    llm = LLM(model=_model_dir(tmp_path), load_format="dummy",
              dtype="float32", max_model_len=128, max_num_seqs=4,
              max_num_batched_tokens=128, block_size=16, num_kv_blocks=64)
    ex = llm.llm_engine.engine_core.executor
    assert isinstance(ex, UniprocExecutor)
    assert ex.check_health()
