"""Input processor: prompt -> validated Request (role of reference
``v1/engine/processor.py:125`` process_inputs)."""

import time
from typing import Optional, Union

from vllm_pq_tpu.config import EngineConfig
from vllm_pq_tpu.request import Request
from vllm_pq_tpu.sampling_params import SamplingParams
from vllm_pq_tpu.utils import random_uuid


class Processor:

    def __init__(self, config: EngineConfig, tokenizer):
        self.config = config
        self.tokenizer = tokenizer
        self.max_model_len = config.scheduler.max_model_len
        self.eos_token_id = getattr(tokenizer, "eos_token_id", None)
        # for synthetic-token workloads (benchmarks); conservative floor
        self.vocab_size = getattr(tokenizer, "vocab_size", None) or 256

    def process_inputs(
        self,
        prompt: Union[str, dict],
        sampling_params: SamplingParams,
        request_id: Optional[str] = None,
        arrival_time: Optional[float] = None,
        priority: int = 0,
    ) -> Request:
        request_id = request_id or random_uuid()
        if isinstance(prompt, dict):
            # TokensPrompt / TextPrompt dicts (reference inputs/data.py)
            if "prompt_token_ids" in prompt:
                token_ids = list(prompt["prompt_token_ids"])
                text = prompt.get("prompt")
            else:
                text = prompt["prompt"]
                token_ids = self.tokenizer.encode(text)
        else:
            text = prompt
            token_ids = self.tokenizer.encode(text)

        sp = sampling_params
        if sp.truncate_prompt_tokens:
            token_ids = token_ids[-sp.truncate_prompt_tokens:]
        if not token_ids:
            raise ValueError("empty prompt")
        if len(token_ids) >= self.max_model_len:
            raise ValueError(
                f"prompt ({len(token_ids)} tokens) is longer than "
                f"max_model_len ({self.max_model_len})")
        # cap generation to the model window
        budget = self.max_model_len - len(token_ids)
        if sp.max_tokens is None or sp.max_tokens > budget:
            sp = sp.clone()
            sp.max_tokens = budget

        return Request(
            request_id=request_id,
            prompt_token_ids=token_ids,
            sampling_params=sp,
            eos_token_id=self.eos_token_id,
            arrival_time=arrival_time or time.monotonic(),
            prompt=text,
            priority=priority,
        )
