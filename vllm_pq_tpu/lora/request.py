"""LoRA request descriptor (role of reference ``vllm/lora/request.py``)."""

from dataclasses import dataclass


@dataclass(frozen=True)
class LoRARequest:
    lora_name: str
    lora_int_id: int          # 1-based; 0 = no adapter
    lora_path: str = ""

    def __post_init__(self):
        if self.lora_int_id < 1:
            raise ValueError("lora_int_id must be >= 1")
