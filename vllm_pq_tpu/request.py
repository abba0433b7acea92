"""Engine-internal request state (role of reference ``vllm/v1/request.py``).

A Request tracks prompt tokens + generated tokens + scheduling progress
(``num_computed_tokens``). There are no sequence groups: n>1 sampling is
fanned out into n independent requests by the entrypoint (the V1 design,
reference ``v1/engine/parallel_sampling.py``).
"""

import enum
from typing import List, Optional

from vllm_pq_tpu.sampling_params import SamplingParams


class RequestStatus(enum.IntEnum):
    WAITING = 0
    RUNNING = 1
    PREEMPTED = 2
    FINISHED_STOPPED = 3
    FINISHED_LENGTH_CAPPED = 4
    FINISHED_ABORTED = 5
    FINISHED_IGNORED = 6

    @staticmethod
    def is_finished(status: "RequestStatus") -> bool:
        return status >= RequestStatus.FINISHED_STOPPED


FINISH_REASON = {
    RequestStatus.FINISHED_STOPPED: "stop",
    RequestStatus.FINISHED_LENGTH_CAPPED: "length",
    RequestStatus.FINISHED_ABORTED: "abort",
    RequestStatus.FINISHED_IGNORED: "length",
}


class Request:

    def __init__(
        self,
        request_id: str,
        prompt_token_ids: List[int],
        sampling_params: SamplingParams,
        eos_token_id: Optional[int] = None,
        arrival_time: float = 0.0,
        prompt: Optional[str] = None,
        priority: int = 0,
        mm_inputs: Optional[List] = None,
    ):
        self.request_id = request_id
        self.prompt = prompt
        self.prompt_token_ids = list(prompt_token_ids)
        self.num_prompt_tokens = len(self.prompt_token_ids)
        self.sampling_params = sampling_params
        self.eos_token_id = eos_token_id
        self.arrival_time = arrival_time
        self.priority = priority

        self.status = RequestStatus.WAITING
        self.stop_reason: Optional[object] = None
        # multimodal placeholder spans + pixel data (List[MMInput])
        self.mm_inputs: List = mm_inputs or []

        # All token ids: prompt + generated (single growing list; the
        # generated suffix starts at num_prompt_tokens).
        self._all_token_ids: List[int] = list(self.prompt_token_ids)
        # Tokens whose KV entries have been computed.
        self.num_computed_tokens = 0
        # Number of times this request was preempted (recompute).
        self.num_preemptions = 0
        # Draft tokens proposed for the next step (speculative decoding);
        # transient — consumed by the scheduler, verified by the runner.
        self.spec_token_ids: List[int] = []
        # Constrained decoding state (host-side): guided FSM, static
        # allowed-token mask, tokenized bad-words sequences.
        self.guided_fsm = None
        self.allowed_mask = None          # np.bool_[vocab] or None
        self.bad_words_ids: List[List[int]] = []
        # LoRA: request descriptor + resolved device slot (0 = base)
        self.lora_request = None
        self.lora_slot = 0
        # Cumulative logprob of generated tokens (None unless requested).
        self.cumulative_logprob: Optional[float] = (
            0.0 if sampling_params.logprobs is not None else None)
        # Per-step logprobs payloads, appended by the engine when requested.
        self.logprobs: Optional[list] = (
            [] if sampling_params.logprobs is not None else None)

        mt = sampling_params.max_tokens
        self.max_tokens = mt if mt is not None else 2**31

    # ---- token accounting -------------------------------------------------

    @property
    def needs_constraints(self) -> bool:
        sp = self.sampling_params
        return (self.guided_fsm is not None
                or self.allowed_mask is not None
                or bool(self.bad_words_ids)
                or bool(sp.logit_bias))

    @property
    def all_token_ids(self) -> List[int]:
        return self._all_token_ids

    @property
    def num_tokens(self) -> int:
        return len(self._all_token_ids)

    @property
    def num_output_tokens(self) -> int:
        return len(self._all_token_ids) - self.num_prompt_tokens

    @property
    def output_token_ids(self) -> List[int]:
        return self._all_token_ids[self.num_prompt_tokens:]

    def append_output_token_ids(self, token_ids) -> None:
        if isinstance(token_ids, int):
            self._all_token_ids.append(token_ids)
        else:
            self._all_token_ids.extend(token_ids)

    @property
    def is_finished(self) -> bool:
        return RequestStatus.is_finished(self.status)

    def get_finish_reason(self) -> Optional[str]:
        return FINISH_REASON.get(self.status)

    def __repr__(self):
        return (f"Request(id={self.request_id}, status={self.status.name}, "
                f"computed={self.num_computed_tokens}/{self.num_tokens})")
