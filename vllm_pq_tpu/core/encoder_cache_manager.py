"""Encoder-output cache budget (role of reference
``v1/core/encoder_cache_manager.py``).

The scheduler owns a token budget for vision-encoder outputs held on
the worker. An entry is allocated when a request's placeholder span is
first scheduled, stays cached across chunked-prefill steps (and
preemptions while allocated), and is freed once every placeholder
token of the span has been computed. The worker mirrors frees via
``SchedulerOutput.free_encoder_input_ids``.
"""

from typing import Dict, List, Set, Tuple


class EncoderCacheManager:

    def __init__(self, cache_size: int):
        self.cache_size = cache_size
        self.num_free_slots = cache_size
        # req_id -> set of cached input indices
        self.cached: Dict[str, Set[int]] = {}
        # (req_id, input_idx) entries freed since the last take
        self.freed: List[Tuple[str, int]] = []

    def has_cache(self, request, input_idx: int) -> bool:
        return input_idx in self.cached.get(request.request_id, ())

    def can_allocate(self, request, input_idx: int) -> bool:
        return request.mm_inputs[input_idx].length <= self.num_free_slots

    def allocate(self, request, input_idx: int) -> None:
        rid = request.request_id
        self.cached.setdefault(rid, set()).add(input_idx)
        self.num_free_slots -= request.mm_inputs[input_idx].length
        assert self.num_free_slots >= 0

    def get_cached_input_ids(self, request) -> Set[int]:
        return set(self.cached.get(request.request_id, ()))

    def free_encoder_input(self, request, input_idx: int) -> None:
        rid = request.request_id
        if input_idx not in self.cached.get(rid, ()):
            return
        self.cached[rid].discard(input_idx)
        if not self.cached[rid]:
            del self.cached[rid]
        self.num_free_slots += request.mm_inputs[input_idx].length
        self.freed.append((rid, input_idx))

    def free(self, request) -> None:
        """Free every cached input of the request (finish/abort)."""
        for idx in list(self.cached.get(request.request_id, ())):
            self.free_encoder_input(request, idx)

    def get_freed_ids(self) -> List[Tuple[str, int]]:
        freed, self.freed = self.freed, []
        return freed
