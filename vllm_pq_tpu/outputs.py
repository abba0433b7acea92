"""Engine output types (parity with reference ``vllm/outputs.py:20,85``)."""

from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class Logprob:
    logprob: float
    rank: Optional[int] = None
    decoded_token: Optional[str] = None


# Per-position mapping token_id -> Logprob (top-k + sampled token).
LogprobsDict = Dict[int, Logprob]


@dataclass
class CompletionOutput:
    index: int
    text: str
    token_ids: List[int]
    cumulative_logprob: Optional[float] = None
    logprobs: Optional[List[LogprobsDict]] = None
    finish_reason: Optional[str] = None
    stop_reason: Optional[object] = None

    @property
    def finished(self) -> bool:
        return self.finish_reason is not None


@dataclass
class RequestOutput:
    request_id: str
    prompt: Optional[str]
    prompt_token_ids: List[int]
    outputs: List[CompletionOutput]
    finished: bool
    prompt_logprobs: Optional[List[Optional[LogprobsDict]]] = None
    metrics: Optional[dict] = None

    def __repr__(self) -> str:
        return (f"RequestOutput(request_id={self.request_id!r}, "
                f"finished={self.finished}, "
                f"outputs={self.outputs!r})")
