"""User-facing sampling parameters.

API parity with the reference's ``SamplingParams``
(``vllm/sampling_params.py:106,185-224``): n, penalties, temperature,
top_p/top_k/min_p, seed, stop/stop_token_ids, ignore_eos, max/min_tokens,
logprobs, detokenize, output_kind. Guided decoding and beam search are
deferred (tracked in the parity scoreboard).
"""

import enum
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union


class RequestOutputKind(enum.Enum):
    CUMULATIVE = 0   # return full accumulated output each step
    DELTA = 1        # return only newly generated tokens
    FINAL_ONLY = 2   # return nothing until finished


class SamplingType(enum.IntEnum):
    GREEDY = 0
    RANDOM = 1
    RANDOM_SEED = 2


@dataclass
class GuidedDecodingParams:
    """Constrained decoding spec (role of reference GuidedDecodingParams,
    ``sampling_params.py:31-38``: json/regex/choice/grammar). Constraints
    are compiled to host-side FSMs (``vllm_pq_tpu/guided``) whose
    per-step allowed-token sets ride the packed transfer as bitmasks."""

    json: Optional[Any] = None        # JSON schema dict (subset) or True
    regex: Optional[str] = None
    choice: Optional[List[str]] = None
    grammar: Optional[str] = None     # unsupported at this snapshot

    def __post_init__(self):
        given = [x is not None for x in
                 (self.json, self.regex, self.choice, self.grammar)]
        if sum(given) != 1:
            raise ValueError(
                "exactly one of json/regex/choice/grammar required")


@dataclass
class SamplingParams:
    n: int = 1
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0  # 0 or -1 => disabled
    min_p: float = 0.0
    seed: Optional[int] = None
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[int]] = None
    bad_words: Optional[List[str]] = None
    ignore_eos: bool = False
    max_tokens: Optional[int] = 16
    min_tokens: int = 0
    logprobs: Optional[int] = None
    prompt_logprobs: Optional[int] = None
    detokenize: bool = True
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    include_stop_str_in_output: bool = False
    truncate_prompt_tokens: Optional[int] = None
    output_kind: RequestOutputKind = RequestOutputKind.CUMULATIVE
    logit_bias: Optional[Dict[int, float]] = None
    allowed_token_ids: Optional[List[int]] = None
    # per-request logits processors (reference sampling_params.py
    # logits_processors): arbitrary host callables
    # ``(output_token_ids, logits) -> logits`` or
    # ``(prompt_token_ids, output_token_ids, logits) -> logits``.
    # Rows carrying processors are sampled ON HOST from the full logits
    # row (sync single-step composition, like constrained requests).
    logits_processors: Optional[List[Any]] = None
    guided_decoding: Optional[GuidedDecodingParams] = None
    extra_args: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        if self.stop is None:
            self.stop = []
        elif isinstance(self.stop, str):
            self.stop = [self.stop]
        if self.stop_token_ids is None:
            self.stop_token_ids = []
        self._verify()

    def _verify(self):
        if self.n < 1:
            raise ValueError(f"n must be >= 1, got {self.n}")
        if self.temperature < 0:
            raise ValueError("temperature must be non-negative")
        if not 0 < self.top_p <= 1:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if self.top_k < -1:
            raise ValueError(f"top_k must be >= -1, got {self.top_k}")
        if self.top_k == -1:
            self.top_k = 0
        if not 0 <= self.min_p <= 1:
            raise ValueError(f"min_p must be in [0, 1], got {self.min_p}")
        if not -2 <= self.presence_penalty <= 2:
            raise ValueError("presence_penalty must be in [-2, 2]")
        if not -2 <= self.frequency_penalty <= 2:
            raise ValueError("frequency_penalty must be in [-2, 2]")
        if self.repetition_penalty <= 0:
            raise ValueError("repetition_penalty must be positive")
        if self.max_tokens is not None and self.max_tokens < 1:
            raise ValueError("max_tokens must be >= 1")
        if self.min_tokens < 0:
            raise ValueError("min_tokens must be >= 0")
        if self.logprobs is not None and self.logprobs < 0:
            raise ValueError("logprobs must be >= 0")

    @property
    def sampling_type(self) -> SamplingType:
        if self.temperature == 0.0:
            return SamplingType.GREEDY
        if self.seed is not None:
            return SamplingType.RANDOM_SEED
        return SamplingType.RANDOM

    def clone(self) -> "SamplingParams":
        import copy
        return copy.deepcopy(self)


@dataclass
class BeamSearchParams:
    """Parity placeholder for the reference's BeamSearchParams
    (``sampling_params.py:497``); implemented via parallel-sampling
    fan-out in the LLM entrypoint."""

    beam_width: int = 4
    max_tokens: int = 16
    ignore_eos: bool = False
    temperature: float = 0.0
    length_penalty: float = 1.0
    include_stop_str_in_output: bool = False
