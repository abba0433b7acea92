"""Scheduler -> model-runner contract.

Mirrors the send-once/diff-after protocol of the reference
(``vllm/v1/core/scheduler_output.py:15,49,78``): new requests carry the
full prompt + sampling state exactly once; cached requests carry only the
diff (new block ids, resume flag). This is also the multi-host broadcast
payload (rank-0 schedules; all hosts run the identical jitted step).
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set

from vllm_pq_tpu.sampling_params import SamplingParams


@dataclass
class NewRequestData:
    req_id: str
    prompt_token_ids: List[int]
    sampling_params: SamplingParams
    block_ids: List[int]
    num_computed_tokens: int
    # LoRA adapter slot (0 = base model)
    lora_slot: int = 0
    # multimodal placeholder spans + pixel data (List[MMInput]); the
    # runner encodes scheduled inputs and splices projected features
    # into the placeholder rows
    mm_inputs: list = field(default_factory=list)


@dataclass
class CachedRequestData:
    req_id: str
    # True when the request was preempted and is rescheduled: the worker
    # must replace (not extend) its block table.
    resumed_from_preemption: bool
    new_token_ids: List[int]
    new_block_ids: List[int]
    num_computed_tokens: int


@dataclass
class SchedulerOutput:
    scheduled_new_reqs: List[NewRequestData] = field(default_factory=list)
    scheduled_cached_reqs: List[CachedRequestData] = field(
        default_factory=list)
    # req_id -> number of tokens to run this step (chunked prefills may be
    # partial; decodes are 1).
    num_scheduled_tokens: Dict[str, int] = field(default_factory=dict)
    total_num_scheduled_tokens: int = 0
    finished_req_ids: Set[str] = field(default_factory=set)
    # req_id -> draft tokens scheduled for verification this step (their
    # count is included in num_scheduled_tokens; reference
    # scheduler_output.py:89-113).
    scheduled_spec_decode_tokens: Dict[str, List[int]] = field(
        default_factory=dict)
    # Constrained decoding: req_id -> allowed-token bool mask (guided
    # FSM and/or allowed_token_ids and/or bad-words bans, pre-combined
    # host-side) for requests sampling a token this step.
    guided_masks: Dict[str, object] = field(default_factory=dict)
    # req_id -> {token_id: bias} (OpenAI logit_bias)
    logit_bias: Dict[str, Dict[int, float]] = field(default_factory=dict)
    # Multi-step decoding: >1 means every scheduled request is a decode
    # that was granted this many tokens, to be generated in one device
    # dispatch (the runner runs a lax.scan of this length).
    num_scheduler_steps: int = 1
    # Speculative multi-step window: each of the num_scheduler_steps
    # iterations verifies this many in-graph drafts + 1 token, so a
    # request may generate 1..(k+1) tokens per iteration; the scheduler
    # advances num_computed by the ACTUAL emitted count.
    spec_window_k: int = 0
    # prefix-cache stats for metrics
    num_cached_tokens: int = 0
    # multimodal: req_id -> encoder-input indices to run this step;
    # (req_id, idx) encoder cache entries the worker may free
    # (reference scheduler_output.py scheduled_encoder_inputs /
    # free_encoder_input_ids)
    scheduled_encoder_inputs: Dict[str, List[int]] = field(
        default_factory=dict)
    free_encoder_input_ids: List = field(default_factory=list)

    @property
    def is_empty(self) -> bool:
        return self.total_num_scheduled_tokens == 0


@dataclass
class ModelRunnerOutput:
    """Worker -> scheduler per-step result."""

    # req_ids in batch order
    req_ids: List[str] = field(default_factory=list)
    # req_id -> list of sampled token ids (len>=1 with spec decode later)
    sampled_token_ids: Dict[str, List[int]] = field(default_factory=dict)
    # req_id -> logprobs payload for tokens sampled this step; each entry
    # is (token_ids[k+1], logprobs[k+1], rank_of_sampled) arrays or None.
    logprobs: Dict[str, object] = field(default_factory=dict)
    # req_id -> (start_pos, top_ids [nt,k], top_vals [nt,k],
    # target_logprob [nt]) for prompt-logprob chunks computed this step
    prompt_logprobs: Dict[str, object] = field(default_factory=dict)
    # req_id -> medusa head proposals for the NEXT step (in-graph drafts)
    draft_token_ids: Dict[str, List[int]] = field(default_factory=dict)
    # req_id -> full f32[vocab] logits row (rows carrying per-request
    # logits processors; host re-samples and overrides the token)
    raw_logits: Dict[str, object] = field(default_factory=dict)
