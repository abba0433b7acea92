from vllm_pq_tpu.lora.request import LoRARequest
from vllm_pq_tpu.lora.models import LoRAModel

__all__ = ["LoRARequest", "LoRAModel"]
