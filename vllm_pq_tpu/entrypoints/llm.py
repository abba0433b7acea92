"""The offline `LLM` entrypoint (role of reference
``entrypoints/llm.py:53``): generate / chat over the sync engine, with
n>1 via parallel-sampling fan-out (the V1 design,
``v1/engine/parallel_sampling.py``)."""

from typing import Any, Dict, List, Optional, Sequence, Union

from vllm_pq_tpu.engine.arg_utils import EngineArgs
from vllm_pq_tpu.engine.llm_engine import LLMEngine
from vllm_pq_tpu.logger import init_logger
from vllm_pq_tpu.outputs import RequestOutput
from vllm_pq_tpu.sampling_params import SamplingParams
from vllm_pq_tpu.utils import random_uuid

logger = init_logger(__name__)

PromptType = Union[str, Dict[str, Any]]


class LLM:

    def __init__(self, model: str, **kwargs):
        engine_args = EngineArgs(model=model, **kwargs)
        self.llm_engine = LLMEngine(engine_args.create_engine_config())

    def get_tokenizer(self):
        return self.llm_engine.tokenizer

    # ------------------------------------------------------------------

    def generate(
        self,
        prompts: Union[PromptType, Sequence[PromptType]],
        sampling_params: Optional[Union[SamplingParams,
                                        Sequence[SamplingParams]]] = None,
        use_tqdm: bool = False,
    ) -> List[RequestOutput]:
        if isinstance(prompts, (str, dict)):
            prompts = [prompts]
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * len(prompts)
        assert len(sampling_params) == len(prompts)

        # fan out n>1 into n child requests (parent_id, index)
        order: List[str] = []
        children: Dict[str, tuple] = {}
        for prompt, sp in zip(prompts, sampling_params):
            parent_id = random_uuid()
            order.append(parent_id)
            for i in range(sp.n):
                child_sp = sp if sp.n == 1 else sp.clone()
                if sp.n > 1 and sp.seed is not None:
                    child_sp.seed = sp.seed + i
                rid = parent_id if sp.n == 1 else f"{parent_id}_{i}"
                self.llm_engine.add_request(rid, prompt, child_sp)
                children[rid] = (parent_id, i)

        finished: Dict[str, RequestOutput] = {}
        while self.llm_engine.has_unfinished_requests():
            for out in self.llm_engine.step():
                if out.finished:
                    finished[out.request_id] = out

        # merge children back into parent outputs
        results = []
        for parent_id in order:
            outs = [(idx, finished[rid])
                    for rid, (pid, idx) in children.items()
                    if pid == parent_id and rid in finished]
            outs.sort()
            base = outs[0][1]
            merged = RequestOutput(
                request_id=parent_id,
                prompt=base.prompt,
                prompt_token_ids=base.prompt_token_ids,
                outputs=[o.outputs[0] for _, o in outs],
                finished=True,
            )
            for i, (_, o) in enumerate(outs):
                merged.outputs[i].index = i
            results.append(merged)
        return results

    def chat(self, messages: Union[List[Dict], List[List[Dict]]],
             sampling_params: Optional[SamplingParams] = None,
             use_tqdm: bool = False, **kwargs) -> List[RequestOutput]:
        if messages and isinstance(messages[0], dict):
            messages = [messages]
        tok = self.get_tokenizer()
        prompts = [
            tok.apply_chat_template(m, tokenize=False,
                                    add_generation_prompt=True)
            for m in messages
        ]
        return self.generate(prompts, sampling_params, use_tqdm)

    # -- admin parity ----------------------------------------------------

    def reset_prefix_cache(self) -> bool:
        return self.llm_engine.reset_prefix_cache()

    def start_profile(self) -> None:
        self.llm_engine.start_profile()

    def stop_profile(self) -> None:
        self.llm_engine.stop_profile()
