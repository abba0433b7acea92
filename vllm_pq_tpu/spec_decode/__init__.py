from vllm_pq_tpu.spec_decode.ngram_proposer import NgramProposer

__all__ = ["NgramProposer"]
