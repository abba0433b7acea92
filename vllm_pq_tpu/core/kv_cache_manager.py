"""Per-request KV block allocation over the BlockPool.

Behavioral parity with reference ``vllm/v1/core/kv_cache_manager.py``:
- get_computed_blocks (:91): longest chain of cached full blocks.
- allocate_slots (:136): refuses allocation counting evictable computed
  blocks (:181-189); preallocates lookahead blocks (:211-218).
- free in reverse order so prefix tails evict first (:251-255).
Own implementation, host-side only (never touches device).
"""

from typing import Dict, List, Optional, Tuple

from vllm_pq_tpu.core.block_pool import BlockPool
from vllm_pq_tpu.core.kv_cache_utils import (BlockHash, KVCacheBlock,
                                             hash_request_tokens)
from vllm_pq_tpu.request import Request
from vllm_pq_tpu.utils import cdiv


class KVCacheManager:

    def __init__(
        self,
        num_blocks: int,
        block_size: int,
        max_model_len: int,
        enable_caching: bool = True,
        num_preallocate_blocks: int = 4,
        sliding_window: Optional[int] = None,
    ):
        self.block_size = block_size
        self.enable_caching = enable_caching
        self.num_preallocate_blocks = num_preallocate_blocks
        self.max_blocks_per_req = cdiv(max_model_len, block_size)
        self.block_pool = BlockPool(num_blocks, enable_caching)
        # Uniform sliding-window models (every layer windowed): blocks
        # wholly behind the window are freed and their table entries
        # nulled, so a long request holds O(window) blocks (reference
        # KVCacheManager sliding_window, v1/core/kv_cache_manager.py:25).
        # The attention mask already excludes those positions, so stale
        # device-side table entries are never read into the output.
        self.sliding_window = sliding_window
        # request_id -> leading blocks already reclaimed
        self._num_reclaimed: Dict[str, int] = {}

        # request_id -> blocks held
        self.req_to_blocks: Dict[str, List[KVCacheBlock]] = {}
        # request_id -> precomputed block hashes (grows as tokens grow)
        self.req_to_block_hashes: Dict[str, List[BlockHash]] = {}
        # request_id -> number of blocks already content-hashed/cached
        self.num_cached_block: Dict[str, int] = {}
        # async scheduling: two-stage deferred freeing
        self.deferred_free = False
        self._limbo_new: List[List[KVCacheBlock]] = []
        self._limbo_old: List[List[KVCacheBlock]] = []

    @property
    def usage(self) -> float:
        return self.block_pool.get_usage()

    def get_computed_blocks(
            self, request: Request) -> Tuple[List[KVCacheBlock], int]:
        """Longest cached prefix for a new request. Returns (blocks,
        num_computed_tokens). Never returns the full prompt: the last
        token must be recomputed to produce logits, so a full-prompt hit
        is trimmed by one block."""
        if not self.enable_caching:
            return [], 0
        block_hashes = self.req_to_block_hashes.get(request.request_id)
        if block_hashes is None:
            block_hashes = hash_request_tokens(self.block_size,
                                               request.all_token_ids)
            self.req_to_block_hashes[request.request_id] = block_hashes

        computed: List[KVCacheBlock] = []
        for bh in block_hashes:
            block = self.block_pool.get_cached_block(bh)
            if block is None:
                break
            computed.append(block)
        num_computed = len(computed) * self.block_size
        if num_computed >= request.num_tokens:
            # keep at least one token to compute
            computed.pop()
            num_computed -= self.block_size
        return computed, num_computed

    def allocate_slots(
        self,
        request: Request,
        num_tokens: int,
        new_computed_blocks: Optional[List[KVCacheBlock]] = None,
    ) -> Optional[List[KVCacheBlock]]:
        """Allocate blocks so the request can hold
        ``num_computed_tokens + num_tokens`` slots. Returns newly
        allocated blocks (excluding prefix-hit blocks), or None if the
        pool cannot satisfy the request this step."""
        assert num_tokens > 0
        new_computed_blocks = new_computed_blocks or []

        req_blocks = self.req_to_blocks.setdefault(request.request_id, [])
        num_computed_tokens = (request.num_computed_tokens +
                               len(new_computed_blocks) * self.block_size)
        num_required_blocks = cdiv(num_computed_tokens + num_tokens,
                                   self.block_size)
        num_new_blocks = (num_required_blocks - len(req_blocks) -
                          len(new_computed_blocks))

        # Evictable (ref 0) cached blocks among the prefix hits must not
        # be double-counted as free.
        num_evictable_computed = sum(1 for b in new_computed_blocks
                                     if b.ref_cnt == 0)
        if (num_new_blocks >
                self.block_pool.get_num_free_blocks() - num_evictable_computed):
            return None

        # Commit the prefix hits.
        if self.enable_caching:
            self.block_pool.touch(new_computed_blocks)
        else:
            assert not new_computed_blocks
        req_blocks.extend(new_computed_blocks)

        if num_new_blocks <= 0:
            new_blocks: List[KVCacheBlock] = []
        else:
            # Preallocate lookahead, bounded by pool and per-request caps.
            num_preallocate = min(
                num_new_blocks + self.num_preallocate_blocks,
                self.block_pool.get_num_free_blocks() -
                num_evictable_computed,
                self.max_blocks_per_req - len(req_blocks),
            )
            assert num_preallocate >= num_new_blocks
            new_blocks = self.block_pool.get_new_blocks(num_preallocate)
            req_blocks.extend(new_blocks)

        if self.enable_caching:
            self._cache_full_blocks(request, req_blocks,
                                    num_computed_tokens + num_tokens)
        if self.sliding_window is not None:
            self._reclaim_out_of_window(request, req_blocks,
                                        num_computed_tokens)
        return new_blocks

    def _reclaim_out_of_window(self, request: Request,
                               req_blocks: List[KVCacheBlock],
                               num_computed_tokens: int) -> None:
        """Free blocks whose tokens can never be attended again: the
        oldest query this step sits at position ``num_computed_tokens``,
        and the mask admits keys at positions > pos - window only."""
        n_dead = num_computed_tokens - self.sliding_window + 1
        if n_dead <= 0:
            return
        first_live_block = n_dead // self.block_size
        rid = request.request_id
        start = self._num_reclaimed.get(rid, 0)
        if first_live_block <= start:
            return
        null = self.block_pool.null_block
        dead = []
        for i in range(start, min(first_live_block, len(req_blocks))):
            if req_blocks[i] is not null:
                dead.append(req_blocks[i])
                req_blocks[i] = null
        self._num_reclaimed[rid] = first_live_block
        if not dead:
            return
        if self.deferred_free:
            # an in-flight async step may still hold the old table
            self._limbo_new.append(dead)
        else:
            self.block_pool.free_blocks(dead)

    def _cache_full_blocks(self, request: Request,
                           req_blocks: List[KVCacheBlock],
                           num_computed_after: int) -> None:
        """Assign hashes to newly full blocks whose tokens are all known
        (i.e. not beyond the tokens scheduled this step)."""
        block_hashes = self.req_to_block_hashes.setdefault(
            request.request_id, [])
        # extend hash chain as far as the request's known tokens allow
        tokens = request.all_token_ids
        while (len(block_hashes) + 1) * self.block_size <= len(tokens):
            start = len(block_hashes) * self.block_size
            chunk = tuple(tokens[start:start + self.block_size])
            parent = block_hashes[-1] if block_hashes else None
            from vllm_pq_tpu.core.kv_cache_utils import hash_block_tokens
            block_hashes.append(hash_block_tokens(parent, chunk))

        num_cached = self.num_cached_block.get(request.request_id, 0)
        num_full = min(num_computed_after // self.block_size,
                       len(block_hashes), len(req_blocks))
        if num_full > num_cached:
            self.block_pool.cache_full_blocks(req_blocks, block_hashes,
                                              num_cached, num_full)
            self.num_cached_block[request.request_id] = num_full

    def import_prefix(self, token_ids: List[int], write_pages) -> int:
        """Register externally-computed KV (disaggregated prefill,
        distributed/kv_transfer/) as cached prefix blocks: the consumer's
        scheduler then picks it up through the ordinary
        ``get_computed_blocks`` path — no special-casing past admission.

        ``write_pages(block_ids, block_offsets)`` copies the KV of full
        blocks ``block_offsets`` (indices into token_ids/block_size)
        into device pages ``block_ids``. Returns tokens made available.
        """
        if not self.enable_caching:
            return 0
        hashes = hash_request_tokens(self.block_size, token_ids)
        start = 0
        for bh in hashes:
            if self.block_pool.get_cached_block(bh) is None:
                break
            start += 1
        n = min(len(hashes) - start,
                self.block_pool.get_num_free_blocks())
        if n <= 0:
            return start * self.block_size
        blocks = self.block_pool.get_new_blocks(n)
        write_pages([b.block_id for b in blocks],
                    list(range(start, start + n)))
        self.block_pool.cache_full_blocks(blocks,
                                          hashes[start:start + n], 0, n)
        # drop our ref: the blocks stay registered in the prefix cache
        # (evictable, LRU) exactly like a finished request's blocks
        self.block_pool.free_blocks(blocks)
        return (start + n) * self.block_size

    def free(self, request: Request) -> None:
        """Release all blocks. Freed in reverse order so tail blocks are
        evicted before prefix blocks. With ``deferred_free`` (async
        scheduling), blocks sit in limbo for two finalize rounds so an
        in-flight device step can never write into reallocated pages."""
        blocks = self.req_to_blocks.pop(request.request_id, [])
        self.num_cached_block.pop(request.request_id, None)
        self._num_reclaimed.pop(request.request_id, None)
        null = self.block_pool.null_block
        blocks = [b for b in blocks if b is not null]
        if self.deferred_free:
            self._limbo_new.append(blocks)
        else:
            self.block_pool.free_blocks(list(reversed(blocks)))

    def flush_deferred(self) -> None:
        """Promote limbo'd blocks one stage; the older stage is freed."""
        for blocks in self._limbo_old:
            self.block_pool.free_blocks(list(reversed(blocks)))
        self._limbo_old = self._limbo_new
        self._limbo_new = []

    def free_block_hashes(self, request: Request) -> None:
        """Forget the hash chain once the request leaves the engine."""
        self.req_to_block_hashes.pop(request.request_id, None)

    def get_block_ids(self, request_id: str) -> List[int]:
        return [b.block_id for b in self.req_to_blocks.get(request_id, [])]

    def reset_prefix_cache(self) -> bool:
        return self.block_pool.reset_prefix_cache()
