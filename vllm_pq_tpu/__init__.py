"""vllm_pq_tpu: TPU-native product-quantized LLM serving engine."""

from vllm_pq_tpu.outputs import CompletionOutput, RequestOutput
from vllm_pq_tpu.sampling_params import SamplingParams
from vllm_pq_tpu.version import __version__

__all__ = [
    "LLM", "SamplingParams", "RequestOutput", "CompletionOutput",
    "LLMEngine", "EngineArgs", "__version__",
]


def __getattr__(name):
    # heavy imports (jax) stay lazy
    if name == "LLM":
        from vllm_pq_tpu.entrypoints.llm import LLM
        return LLM
    if name == "LLMEngine":
        from vllm_pq_tpu.engine.llm_engine import LLMEngine
        return LLMEngine
    if name == "EngineArgs":
        from vllm_pq_tpu.engine.arg_utils import EngineArgs
        return EngineArgs
    raise AttributeError(name)
