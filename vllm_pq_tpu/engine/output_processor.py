"""Output processor: EngineCoreOutputs -> RequestOutputs (role of
reference ``v1/engine/output_processor.py:178-360``): per-request
incremental detok, stop-string checks client-side, output-kind handling."""

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from vllm_pq_tpu.core.scheduler import EngineCoreOutput
from vllm_pq_tpu.engine.detokenizer import (IncrementalDetokenizer,
                                            check_stop_strings)
from vllm_pq_tpu.outputs import CompletionOutput, Logprob, RequestOutput
from vllm_pq_tpu.request import Request
from vllm_pq_tpu.sampling_params import RequestOutputKind, SamplingParams


@dataclass
class RequestState:
    request_id: str
    prompt: Optional[str]
    prompt_token_ids: List[int]
    sampling_params: SamplingParams
    detokenizer: Optional[IncrementalDetokenizer]
    token_ids: List[int] = field(default_factory=list)
    cumulative_logprob: Optional[float] = None
    logprobs: Optional[List[dict]] = None
    finished: bool = False
    finish_reason: Optional[str] = None
    stop_reason: Optional[object] = None
    delta_text: str = ""
    sent_tokens: int = 0


class OutputProcessor:

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        self.states: Dict[str, RequestState] = {}

    def add_request(self, request: Request) -> None:
        sp = request.sampling_params
        detok = (IncrementalDetokenizer(self.tokenizer,
                                        sp.skip_special_tokens)
                 if sp.detokenize else None)
        self.states[request.request_id] = RequestState(
            request_id=request.request_id,
            prompt=request.prompt,
            prompt_token_ids=request.prompt_token_ids,
            sampling_params=sp,
            detokenizer=detok,
            cumulative_logprob=0.0 if sp.logprobs is not None else None,
            logprobs=[] if sp.logprobs is not None else None,
        )

    def abort_request(self, request_id: str) -> None:
        self.states.pop(request_id, None)

    def process_outputs(
        self, outputs: List[EngineCoreOutput]
    ) -> Tuple[List[RequestOutput], List[str]]:
        """Returns (request_outputs, reqs_to_abort). ``reqs_to_abort``
        are requests stopped client-side by a stop string — the engine
        must tell the scheduler to free them."""
        request_outputs: List[RequestOutput] = []
        to_abort: List[str] = []
        for eco in outputs:
            state = self.states.get(eco.req_id)
            if state is None:
                continue
            sp = state.sampling_params
            state.token_ids.extend(eco.new_token_ids)
            new_text = ""
            if state.detokenizer is not None and eco.new_token_ids:
                new_text = state.detokenizer.update(eco.new_token_ids)

            if state.logprobs is not None and eco.logprobs is not None:
                ids, vals, rank = eco.logprobs
                k = sp.logprobs
                entry = {}
                # column 0 = sampled token
                entry[int(ids[0])] = Logprob(float(vals[0]), rank=rank + 1)
                for i in range(1, min(k, len(ids) - 1) + 1):
                    tid = int(ids[i])
                    if tid not in entry:
                        entry[tid] = Logprob(float(vals[i]), rank=i)
                state.logprobs.append(entry)
                state.cumulative_logprob += float(vals[0])

            finish_reason = eco.finish_reason
            stop_reason = eco.stop_reason

            # client-side stop strings
            if not finish_reason and sp.stop and state.detokenizer:
                hit = check_stop_strings(
                    state.detokenizer.output_text, sp.stop,
                    sp.include_stop_str_in_output)
                if hit is not None:
                    stop_str, trunc = hit
                    state.detokenizer.output_text = \
                        state.detokenizer.output_text[:trunc]
                    finish_reason = "stop"
                    stop_reason = stop_str
                    to_abort.append(eco.req_id)

            if getattr(eco, "prompt_logprobs", None) is not None:
                state.prompt_logprobs = eco.prompt_logprobs
            state.finished = finish_reason is not None
            state.finish_reason = finish_reason
            state.stop_reason = stop_reason

            out = self._make_output(state)
            if out is not None:
                request_outputs.append(out)
            if state.finished:
                self.states.pop(eco.req_id, None)
        return request_outputs, to_abort

    def _make_output(self, state: RequestState) -> Optional[RequestOutput]:
        sp = state.sampling_params
        kind = sp.output_kind
        if kind == RequestOutputKind.FINAL_ONLY and not state.finished:
            return None
        text = (state.detokenizer.output_text
                if state.detokenizer is not None else "")
        token_ids = state.token_ids
        if kind == RequestOutputKind.DELTA:
            token_ids = state.token_ids[state.sent_tokens:]
            state.sent_tokens = len(state.token_ids)
            # delta text handling is approximate: full text is stable
        completion = CompletionOutput(
            index=0,
            text=text,
            token_ids=list(token_ids),
            cumulative_logprob=state.cumulative_logprob,
            logprobs=state.logprobs,
            finish_reason=state.finish_reason,
            stop_reason=state.stop_reason,
        )
        return RequestOutput(
            request_id=state.request_id,
            prompt=state.prompt,
            prompt_token_ids=state.prompt_token_ids,
            outputs=[completion],
            finished=state.finished,
            prompt_logprobs=getattr(state, "prompt_logprobs", None),
        )

    def has_requests(self) -> bool:
        return bool(self.states)
