"""Persistent batch of request state on the worker (host side, numpy).

Role of the reference's ``v1/worker/gpu_input_batch.py:48`` InputBatch:
preallocated arrays [max_reqs, ...] holding token ids, block tables and
per-request sampling-param vectors; add/remove/condense keep rows dense
so device transfers are contiguous slices. The scheduler sends new
requests once and diffs afterwards (SchedulerOutput protocol).
"""

from typing import Dict, List, Optional

import numpy as np

from vllm_pq_tpu.core.scheduler_output import (CachedRequestData,
                                               NewRequestData)
from vllm_pq_tpu.sampling_params import SamplingParams


class InputBatch:

    def __init__(self, max_num_reqs: int, max_model_len: int,
                 max_blocks_per_req: int, vocab_size: int):
        self.max_num_reqs = max_num_reqs
        self.max_model_len = max_model_len
        self.max_blocks_per_req = max_blocks_per_req
        self.vocab_size = vocab_size

        self.req_ids: List[Optional[str]] = [None] * max_num_reqs
        self.req_id_to_index: Dict[str, int] = {}
        self.num_reqs = 0

        self.token_ids = np.zeros((max_num_reqs, max_model_len), np.int32)
        self.num_prompt_tokens = np.zeros(max_num_reqs, np.int32)
        self.num_tokens = np.zeros(max_num_reqs, np.int32)
        self.num_computed_tokens = np.zeros(max_num_reqs, np.int32)
        self.block_table = np.zeros((max_num_reqs, max_blocks_per_req),
                                    np.int32)
        self.num_blocks = np.zeros(max_num_reqs, np.int32)

        # sampling vectors
        self.temperature = np.zeros(max_num_reqs, np.float32)
        self.top_k = np.zeros(max_num_reqs, np.int32)
        self.top_p = np.ones(max_num_reqs, np.float32)
        self.min_p = np.zeros(max_num_reqs, np.float32)
        self.presence_penalty = np.zeros(max_num_reqs, np.float32)
        self.frequency_penalty = np.zeros(max_num_reqs, np.float32)
        self.repetition_penalty = np.ones(max_num_reqs, np.float32)
        self.seed = np.zeros(max_num_reqs, np.uint32)
        self.has_seed = np.zeros(max_num_reqs, bool)
        self.eos_token_id = np.full(max_num_reqs, -1, np.int32)
        self.min_tokens = np.zeros(max_num_reqs, np.int32)
        # LoRA adapter slot per row (0 = base model)
        self.lora_slot = np.zeros(max_num_reqs, np.int32)

        # fast-path bookkeeping (reference keeps req-id sets per param,
        # gpu_input_batch.py:100-160)
        self.random_reqs: set = set()
        self.penalty_reqs: set = set()
        self.logprobs_reqs: Dict[str, int] = {}
        self.prompt_logprobs_reqs: Dict[str, int] = {}
        # rows whose full logits must be shipped to host (per-request
        # logits processors)
        self.logits_procs_reqs: Dict[str, list] = {}

    @property
    def all_greedy(self) -> bool:
        return not self.random_reqs

    @property
    def no_penalties(self) -> bool:
        return not self.penalty_reqs

    @property
    def max_num_logprobs(self) -> int:
        return max(self.logprobs_reqs.values(), default=0)

    # ------------------------------------------------------------------

    def add_request(self, data: NewRequestData) -> int:
        assert data.req_id not in self.req_id_to_index
        idx = self.num_reqs
        assert idx < self.max_num_reqs
        self.req_ids[idx] = data.req_id
        self.req_id_to_index[data.req_id] = idx
        self.num_reqs += 1

        n = len(data.prompt_token_ids)
        self.token_ids[idx, :n] = data.prompt_token_ids
        self.num_prompt_tokens[idx] = n
        self.num_tokens[idx] = n
        self.num_computed_tokens[idx] = data.num_computed_tokens
        nb = len(data.block_ids)
        self.block_table[idx, :] = 0
        self.block_table[idx, :nb] = data.block_ids
        self.num_blocks[idx] = nb

        sp: SamplingParams = data.sampling_params
        self.temperature[idx] = sp.temperature
        self.top_k[idx] = sp.top_k
        self.top_p[idx] = sp.top_p
        self.min_p[idx] = sp.min_p
        self.presence_penalty[idx] = sp.presence_penalty
        self.frequency_penalty[idx] = sp.frequency_penalty
        self.repetition_penalty[idx] = sp.repetition_penalty
        self.seed[idx] = np.uint32(sp.seed if sp.seed is not None else 0)
        self.has_seed[idx] = sp.seed is not None
        self.min_tokens[idx] = sp.min_tokens
        self.lora_slot[idx] = getattr(data, "lora_slot", 0)

        rid = data.req_id
        if sp.temperature > 0:
            self.random_reqs.add(rid)
        if (sp.presence_penalty != 0 or sp.frequency_penalty != 0
                or sp.repetition_penalty != 1.0):
            self.penalty_reqs.add(rid)
        if sp.logprobs is not None:
            self.logprobs_reqs[rid] = max(1, sp.logprobs)
        if sp.logits_processors:
            self.logits_procs_reqs[rid] = sp.logits_processors
        if sp.prompt_logprobs is not None:
            self.prompt_logprobs_reqs[rid] = max(1, sp.prompt_logprobs)
        return idx

    def set_eos(self, req_id: str, eos_token_id: Optional[int],
                ignore_eos: bool) -> None:
        idx = self.req_id_to_index[req_id]
        self.eos_token_id[idx] = (-1 if (eos_token_id is None or ignore_eos)
                                  else eos_token_id)

    def update_cached(self, data: CachedRequestData) -> int:
        idx = self.req_id_to_index[data.req_id]
        if data.resumed_from_preemption:
            nb = len(data.new_block_ids)
            self.block_table[idx, :] = 0
            self.block_table[idx, :nb] = data.new_block_ids
            self.num_blocks[idx] = nb
        elif data.new_block_ids:
            nb = self.num_blocks[idx]
            n_new = len(data.new_block_ids)
            self.block_table[idx, nb:nb + n_new] = data.new_block_ids
            self.num_blocks[idx] = nb + n_new
        self.num_computed_tokens[idx] = data.num_computed_tokens
        # write the scheduled chunk unconditionally: tokens generated in a
        # multi-step scan never passed through this batch, so a resumed
        # request must be able to overwrite the whole span
        start = data.num_computed_tokens
        end = start + len(data.new_token_ids)
        if data.new_token_ids:
            self.token_ids[idx, start:end] = data.new_token_ids
            self.num_tokens[idx] = max(self.num_tokens[idx], end)
        return idx

    def append_token(self, req_id: str, token: int) -> None:
        idx = self.req_id_to_index[req_id]
        n = self.num_tokens[idx]
        if n < self.max_model_len:
            self.token_ids[idx, n] = token
            self.num_tokens[idx] = n + 1

    def remove_request(self, req_id: str) -> Optional[int]:
        idx = self.req_id_to_index.pop(req_id, None)
        if idx is None:
            return None
        self.req_ids[idx] = None
        self.random_reqs.discard(req_id)
        self.penalty_reqs.discard(req_id)
        self.logprobs_reqs.pop(req_id, None)
        self.logits_procs_reqs.pop(req_id, None)
        self.prompt_logprobs_reqs.pop(req_id, None)
        return idx

    def condense(self) -> list:
        """Compact holes by moving the last rows into them (reference
        ``gpu_input_batch.py:450``). Returns the [(src, dst), ...] row
        moves so runners with ROW-indexed device state (SSM models'
        recurrent states) can mirror them."""
        last = self.num_reqs - 1
        holes = sorted(i for i in range(self.num_reqs)
                       if self.req_ids[i] is None)
        moves = []
        for hole in holes:
            while last > hole and self.req_ids[last] is None:
                last -= 1
            if last <= hole:
                break
            self._move_row(last, hole)
            moves.append((last, hole))
            last -= 1
        # recompute num_reqs
        n = 0
        for i in range(self.max_num_reqs):
            if self.req_ids[i] is not None:
                n = i + 1
        self.num_reqs = n
        return moves

    def _move_row(self, src: int, dst: int) -> None:
        rid = self.req_ids[src]
        self.req_ids[dst] = rid
        self.req_ids[src] = None
        self.req_id_to_index[rid] = dst
        for arr in (self.token_ids, self.block_table):
            arr[dst] = arr[src]
        for arr in (self.num_prompt_tokens, self.num_tokens,
                    self.num_computed_tokens, self.num_blocks,
                    self.temperature, self.top_k, self.top_p, self.min_p,
                    self.presence_penalty, self.frequency_penalty,
                    self.repetition_penalty, self.seed, self.has_seed,
                    self.eos_token_id,
                    self.min_tokens, self.lora_slot):
            arr[dst] = arr[src]
