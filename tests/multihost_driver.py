"""Driver for the real 2-process multi-host test (tests/test_multihost.py).

Each process is a separate ``jax.distributed`` participant with 4 virtual
CPU devices; the global mesh is (data=1, pipe=2, model=4) — the staged
config #5 shape (PP stage axis across hosts/DCN, TP inside a host/ICI;
SURVEY §5.8). Rank 0 runs the full engine and broadcasts each step's
SchedulerOutput; rank 1 runs a follower HostAgent executing the identical
jitted SPMD program (role of the reference's multi-host GroupCoordinator
+ shm_broadcast remote readers, shm_broadcast.py:177).

Usage: python multihost_driver.py RANK NUM MODEL_DIR OUT_JSON BASEPORT
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    rank = int(sys.argv[1])
    num = int(sys.argv[2])
    model_dir = sys.argv[3]
    out_path = sys.argv[4]
    base_port = int(sys.argv[5])

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4")
    os.environ["VPQ_COORDINATOR_ADDR"] = f"localhost:{base_port}"
    os.environ["VPQ_NUM_HOSTS"] = str(num)
    os.environ["VPQ_HOST_RANK"] = str(rank)
    bcast = f"tcp://*:{base_port + 1}"
    bcast_c = f"tcp://localhost:{base_port + 1}"
    ready = f"tcp://*:{base_port + 2}"
    ready_c = f"tcp://localhost:{base_port + 2}"
    os.environ["VPQ_STEP_BROADCAST_ENDPOINT"] = bcast

    from vllm_pq_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed()
    import jax
    assert jax.process_count() == num, jax.process_count()
    assert len(jax.devices()) == 4 * num, len(jax.devices())

    kw = dict(model=model_dir, load_format="dummy", dtype="float32",
              max_model_len=128, max_num_seqs=4,
              max_num_batched_tokens=128, block_size=16, num_kv_blocks=48,
              pipeline_parallel_size=2, tensor_parallel_size=4,
              enable_prefix_caching=False)

    prompts = [{"prompt_token_ids": [7, 8, 9, 10, 11]},
               {"prompt_token_ids": [3, 4, 5]}]

    if rank == 0:
        from vllm_pq_tpu import LLM, SamplingParams
        llm = LLM(**kw)
        core = llm.llm_engine.engine_core
        assert core._broadcaster is not None
        core._broadcaster.wait_ready(num - 1, ready)
        sp = SamplingParams(temperature=0.0, max_tokens=8,
                            ignore_eos=True)
        outs = llm.generate(prompts, sp)
        toks = [list(o.outputs[0].token_ids) for o in outs]
        core._broadcaster.stop()
        with open(out_path, "w") as f:
            json.dump(toks, f)
    else:
        from vllm_pq_tpu.engine.arg_utils import EngineArgs
        from vllm_pq_tpu.parallel.host_agent import HostAgent
        from vllm_pq_tpu.worker.worker import Worker
        config = EngineArgs(**kw).create_engine_config()
        worker = Worker(config)
        worker.load_model()
        runner = worker.init_runner(48)
        agent = HostAgent(runner, bcast_c)
        agent.notify_ready(ready_c)
        agent.run()


if __name__ == "__main__":
    main()
