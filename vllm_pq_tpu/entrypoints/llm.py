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
        config = engine_args.create_engine_config()
        if config.parallel.data_parallel_size > 1:
            from vllm_pq_tpu.engine.dp_engine import DPLLMEngine
            self.llm_engine = DPLLMEngine(config)
        else:
            self.llm_engine = LLMEngine(config)

    def get_tokenizer(self):
        return self.llm_engine.tokenizer

    # ------------------------------------------------------------------

    def generate(
        self,
        prompts: Union[PromptType, Sequence[PromptType]],
        sampling_params: Optional[Union[SamplingParams,
                                        Sequence[SamplingParams]]] = None,
        use_tqdm: bool = False,
        lora_request=None,
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
                self.llm_engine.add_request(rid, prompt, child_sp,
                                            lora_request=lora_request)
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
                prompt_logprobs=base.prompt_logprobs,
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

    def beam_search(self, prompts: Sequence[PromptType],
                    params: "BeamSearchParams") -> List[RequestOutput]:
        """Client-side beam search (the V1 design: beam search moved out
        of the engine into the entrypoint, reference ``llm.py:510`` /
        ``beam_search_params``; prefix caching makes per-step beam
        re-extension cheap)."""
        from vllm_pq_tpu.outputs import CompletionOutput
        if isinstance(prompts, (str, dict)):
            prompts = [prompts]
        tok = self.get_tokenizer()
        width = params.beam_width
        lp_k = min(2 * width, 20)
        step_sp = SamplingParams(temperature=0.0, max_tokens=1,
                                 logprobs=lp_k, ignore_eos=True)
        eos_id = getattr(tok, "eos_token_id", None)

        results = []
        for prompt in prompts:
            if isinstance(prompt, dict):
                base_ids = list(prompt.get("prompt_token_ids")
                                or tok.encode(prompt["prompt"]))
            else:
                base_ids = tok.encode(prompt)
            beams = [(0.0, list(base_ids))]   # (cum_logprob, tokens)
            done: List[tuple] = []
            for _ in range(params.max_tokens):
                if not beams:
                    break
                outs = self.generate(
                    [{"prompt_token_ids": t} for _, t in beams],
                    step_sp)
                cand = []
                for (cum, toks), out in zip(beams, outs):
                    lps = out.outputs[0].logprobs
                    if not lps:
                        continue
                    for tid, lp in lps[0].items():
                        new = (cum + lp.logprob, toks + [int(tid)])
                        if (eos_id is not None and tid == eos_id
                                and not params.ignore_eos):
                            done.append(new)
                        else:
                            cand.append(new)
                cand.sort(key=lambda b: -b[0])
                beams = cand[:width]
            done.extend(beams)

            def score(b):
                n_new = len(b[1]) - len(base_ids)
                return b[0] / max(n_new, 1) ** params.length_penalty
            done.sort(key=lambda b: -score(b))
            top = done[:width]
            results.append(RequestOutput(
                request_id=random_uuid(),
                prompt=None,
                prompt_token_ids=base_ids,
                outputs=[
                    CompletionOutput(
                        index=i,
                        text=tok.decode(t[len(base_ids):]),
                        token_ids=t[len(base_ids):],
                        cumulative_logprob=c,
                        finish_reason="stop" if (
                            t and eos_id is not None and t[-1] == eos_id)
                        else "length")
                    for i, (c, t) in enumerate(top)],
                finished=True,
            ))
        return results

    def _prompt_ids(self, prompts) -> List[List[int]]:
        if isinstance(prompts, (str, dict)):
            prompts = [prompts]
        tok = self.get_tokenizer()
        ids = []
        for p in prompts:
            if isinstance(p, dict):
                ids.append(list(p.get("prompt_token_ids")
                                or tok.encode(p["prompt"])))
            else:
                ids.append(tok.encode(p))
        return ids

    def encode(self, prompts: Union[PromptType, Sequence[PromptType]],
               pooling_type: Optional[str] = None) -> List["np.ndarray"]:
        """Pooled hidden-state embeddings (role of reference
        LLM.encode/embed): CLS pooling for encoder-only models,
        last-token for decoders; works over the MP engine via the
        encode RPC."""
        ids = self._prompt_ids(prompts)
        return list(self.llm_engine.engine_core.encode(ids, pooling_type))

    def classify(self, prompts) -> List["np.ndarray"]:
        """Sequence-classification logits (encoder-only cross-encoder
        models; role of reference LLM.classify)."""
        ids = self._prompt_ids(prompts)
        return list(self.llm_engine.engine_core.classify(ids))

    def score(self, text_1, text_2) -> List[float]:
        """Cross-encoder similarity scores for (text_1[i], text_2[i])
        pairs (role of reference LLM.score / serving_score.py). The two
        texts are packed as one sequence with token_type_ids 0/1, the
        classifier head's (sigmoided when 1-label) output is the score."""
        import numpy as np
        if isinstance(text_1, str):
            text_1 = [text_1]
        if isinstance(text_2, str):
            text_2 = [text_2]
        if len(text_1) == 1 and len(text_2) > 1:
            text_1 = text_1 * len(text_2)
        tok = self.get_tokenizer()
        ids, types = [], []
        for a, b in zip(text_1, text_2):
            ia = list(tok.encode(a))
            ib = list(tok.encode(b))
            ids.append(ia + ib)
            types.append([0] * len(ia) + [1] * len(ib))
        logits = self.llm_engine.engine_core.classify(ids, types)
        out = []
        for lg in logits:
            lg = np.asarray(lg)
            if lg.shape[-1] == 1:
                out.append(float(1.0 / (1.0 + np.exp(-lg[0]))))
            else:
                out.append(float(lg.max()))
        return out

    def embed(self, prompts, **kw):
        return self.encode(prompts, **kw)

    def save_sharded_state(self, path: str) -> None:
        """Persist the final (quantized, device-laid-out) param tree so
        later startups skip HF parsing/quantization/resharding; load
        with model=<path> load_format='sharded_state' and matching
        config (reference save_sharded_state example)."""
        core = self.llm_engine.engine_core
        runner = getattr(core, "runner", None)
        if runner is None:
            raise RuntimeError("save_sharded_state requires the "
                               "in-process engine")
        import json as _json
        import os as _os
        import shutil
        from vllm_pq_tpu.model_loader.loader import save_sharded_state
        _os.makedirs(path, exist_ok=True)
        save_sharded_state(runner.model, runner.params, path)
        # carry the HF config so the new LLM builds the same model
        src_cfg = _os.path.join(self.llm_engine.config.model.model,
                                "config.json")
        if _os.path.isfile(src_cfg):
            shutil.copy(src_cfg, _os.path.join(path, "config.json"))

    # -- admin parity ----------------------------------------------------

    def sleep(self, level: int = 1) -> None:
        """Free device memory between serving bursts (role of reference
        sleep mode, ``device_allocator/cumem.py:172-224``; on TPU this is
        buffer deletion + realloc, no VMM tricks needed)."""
        self.llm_engine.engine_core.sleep(level)

    def wake_up(self) -> None:
        self.llm_engine.engine_core.wake_up()

    def collective_rpc(self, method: str, *args, **kwargs):
        """Run a method on the worker (reference ``llm.py:472``)."""
        core = self.llm_engine.engine_core
        worker = getattr(core, "worker", None)
        if worker is None:
            raise RuntimeError("collective_rpc requires the in-process "
                               "engine (engine_multiprocessing=False)")
        return [getattr(worker, method)(*args, **kwargs)]

    def apply_model(self, fn):
        """Apply fn to the underlying model object (reference
        ``llm.py:502``)."""
        core = self.llm_engine.engine_core
        runner = getattr(core, "runner", None)
        if runner is None:
            raise RuntimeError("apply_model requires the in-process "
                               "engine (engine_multiprocessing=False)")
        return [fn(runner.model)]

    def reset_prefix_cache(self) -> bool:
        return self.llm_engine.reset_prefix_cache()

    def start_profile(self) -> None:
        self.llm_engine.start_profile()

    def stop_profile(self) -> None:
        self.llm_engine.stop_profile()
