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
        lora_request=None,
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

        request = Request(
            request_id=request_id,
            prompt_token_ids=token_ids,
            sampling_params=sp,
            eos_token_id=self.eos_token_id,
            arrival_time=arrival_time or time.monotonic(),
            prompt=text,
            priority=priority,
        )
        request.lora_request = lora_request
        self._attach_constraints(request, sp)
        return request

    def _attach_constraints(self, request: Request, sp) -> None:
        """Compile guided decoding / allowed ids / bad words into host
        state carried on the request (reference: per-request logits
        processors; here constraint masks ride the packed transfer)."""
        import numpy as np
        if sp.guided_decoding is not None:
            from vllm_pq_tpu.guided import build_guided_fsm
            request.guided_fsm = build_guided_fsm(sp.guided_decoding,
                                                  self.tokenizer)
        if sp.allowed_token_ids:
            mask = np.zeros(self.vocab_size, bool)
            ids = [t for t in sp.allowed_token_ids
                   if 0 <= t < self.vocab_size]
            if not ids:
                raise ValueError("allowed_token_ids has no valid ids")
            mask[ids] = True
            if self.eos_token_id is not None:
                mask[self.eos_token_id] = True
            request.allowed_mask = mask
        if sp.bad_words:
            seqs = []
            for w in sp.bad_words:
                for variant in (w, " " + w):
                    try:
                        toks = self.tokenizer.encode(
                            variant, add_special_tokens=False)
                    except TypeError:
                        toks = self.tokenizer.encode(variant)
                    # strip a leading BOS if the tokenizer insists
                    bos = getattr(self.tokenizer, "bos_token_id", None)
                    if toks and bos is not None and toks[0] == bos:
                        toks = toks[1:]
                    if toks:
                        seqs.append(list(toks))
            request.bad_words_ids = seqs
