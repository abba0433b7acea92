"""Multi-host lockstep execution: rank-0 schedules, every host executes.

Role of the reference's shm-MessageQueue scheduler->worker broadcast
(``shm_broadcast.py:177``; remote readers over ZMQ) and the DP-lockstep
lesson (``v1/engine/core.py:221`` execute_dummy_batch): only the rank-0
host runs the scheduler/tokenizer/API; it broadcasts each step's
``SchedulerOutput`` (+ one-time request metadata) over a ZMQ PUB socket,
and every follower host feeds the identical payload into its own
ModelRunner so the jitted step (whose collectives span the global mesh)
executes in lockstep on all hosts.

The payload codec is shared by the in-process loopback test
(tests/test_host_agent.py), which replays a captured stream into a
second runner and asserts token-for-token equality.
"""

import pickle
from typing import Optional

from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)

STEP = b"S"
STOP = b"Q"


def encode_step(scheduler_output, request_meta) -> bytes:
    return STEP + pickle.dumps((scheduler_output, request_meta),
                               protocol=5)


def decode_msg(raw: bytes):
    kind, body = raw[:1], raw[1:]
    if kind == STOP:
        return None
    return pickle.loads(body)


class StepBroadcaster:
    """Rank-0 side: PUB socket (lazy; no-op when world size is 1)."""

    def __init__(self, endpoint: str = "tcp://*:5557"):
        import zmq
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.PUB)
        self.sock.bind(endpoint)

    def publish(self, scheduler_output, request_meta) -> None:
        self.sock.send(encode_step(scheduler_output, request_meta))

    def wait_ready(self, n_followers: int, endpoint: str,
                   timeout_s: float = 300.0) -> None:
        """Block until every follower has connected its SUB socket (ZMQ
        PUB drops messages sent before subscription propagation — the
        classic slow-joiner race)."""
        import zmq
        rep = self.ctx.socket(zmq.REP)
        rep.bind(endpoint)
        rep.setsockopt(zmq.RCVTIMEO, int(timeout_s * 1000))
        for _ in range(n_followers):
            rep.recv()
            rep.send(b"ok")
        rep.close()

    def stop(self) -> None:
        try:
            self.sock.send(STOP)
        except Exception:  # noqa: BLE001
            pass


class HostAgent:
    """Follower-host loop: receive step payloads, execute the runner.

    Run one per non-zero host:
      python -m vllm_pq_tpu.parallel.host_agent --model ... \
          --coordinator tcp://rank0:5557
    (the model/config flags must match rank-0's so the compiled step and
    mesh are identical).
    """

    def __init__(self, runner, endpoint: str):
        import zmq
        self.runner = runner
        ctx = zmq.Context.instance()
        self.sock = ctx.socket(zmq.SUB)
        self.sock.connect(endpoint)
        self.sock.setsockopt(zmq.SUBSCRIBE, b"")

    def notify_ready(self, endpoint: str) -> None:
        """Handshake with rank-0's wait_ready (after the SUB connect)."""
        import zmq
        req = zmq.Context.instance().socket(zmq.REQ)
        req.connect(endpoint)
        req.send(b"ready")
        req.recv()
        req.close()

    def run(self) -> None:
        logger.info("host agent: following rank-0 step broadcast")
        while True:
            msg = decode_msg(self.sock.recv())
            if msg is None:
                logger.info("host agent: stop")
                return
            scheduler_output, request_meta = msg
            self.runner.execute_model(scheduler_output, request_meta)


def main() -> None:
    import argparse

    from vllm_pq_tpu.engine.arg_utils import EngineArgs
    from vllm_pq_tpu.parallel.mesh import maybe_init_distributed
    from vllm_pq_tpu.worker.worker import Worker

    parser = argparse.ArgumentParser("vllm_pq_tpu follower host agent")
    EngineArgs.add_cli_args(parser)
    parser.add_argument("--coordinator", default="tcp://localhost:5557")
    args = parser.parse_args()

    maybe_init_distributed()
    config = EngineArgs.from_cli_args(args).create_engine_config()
    worker = Worker(config)
    worker.load_model()
    runner = worker.init_runner(worker.determine_num_kv_blocks())
    HostAgent(runner, args.coordinator).run()


if __name__ == "__main__":
    main()
