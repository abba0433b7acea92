from vllm_pq_tpu.guided.fsm import build_guided_fsm

__all__ = ["build_guided_fsm"]
