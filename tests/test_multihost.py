"""Real multi-process multi-host execution (VERDICT round-1 item #3).

Two OS processes join one jax.distributed CPU job (4 virtual devices
each); the global mesh is (pipe=2 across processes) x (model=4 inside a
process) — the staged config #5 mapping (PP over DCN, TP over ICI).
Rank 0 runs the engine + ZMQ step broadcast; rank 1 runs the follower
HostAgent. Greedy decode must be token-exact vs a single-process run of
the same model."""

import json
import os
import socket
import subprocess
import sys

import pytest

TINY = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 512,
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 4,
    "max_position_embeddings": 512,
}


def _free_port():
    s = socket.socket()
    s.bind(("", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_pp_over_hosts(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    out_path = str(tmp_path / "rank0.json")
    port = _free_port()
    driver = os.path.join(os.path.dirname(__file__),
                          "multihost_driver.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, driver, str(rank), "2", str(d), out_path,
         str(port)], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for rank in (0, 1)]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-4000:]
    with open(out_path) as f:
        multi = json.load(f)

    # single-process reference (same model, plain 1-device run)
    from vllm_pq_tpu import LLM, SamplingParams
    llm = LLM(model=str(d), load_format="dummy", dtype="float32",
              max_model_len=128, max_num_seqs=4,
              max_num_batched_tokens=128, block_size=16,
              num_kv_blocks=48, enable_prefix_caching=False)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prompts = [{"prompt_token_ids": [7, 8, 9, 10, 11]},
               {"prompt_token_ids": [3, 4, 5]}]
    ref = [list(o.outputs[0].token_ids) for o in llm.generate(prompts, sp)]
    assert multi == ref
