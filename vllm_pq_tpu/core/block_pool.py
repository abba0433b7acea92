"""Ref-counted block pool with built-in prefix caching.

Behavioral parity with the reference's ``vllm/v1/core/block_pool.py``
(cached-block map, eviction-on-reuse :182, cache_full_blocks :70), own
implementation.
"""

from typing import Dict, List, Optional

from vllm_pq_tpu.core.kv_cache_utils import (BlockHash, FreeBlockQueue,
                                             KVCacheBlock)


class BlockPool:

    def __init__(self, num_blocks: int, enable_caching: bool = True):
        assert num_blocks > 0
        self.num_blocks = num_blocks
        self.enable_caching = enable_caching
        # Block 0 is the null block used to pad block tables; it is never
        # allocated to a request.
        self.blocks = [KVCacheBlock(i) for i in range(num_blocks)]
        self.null_block = self.blocks[0]
        self.null_block.ref_cnt = 1
        self.free_queue = FreeBlockQueue(self.blocks[1:])
        # content hash -> block (full blocks only)
        self.cached_blocks: Dict[BlockHash, KVCacheBlock] = {}
        # metrics
        self.query_count = 0
        self.hit_count = 0

    def get_num_free_blocks(self) -> int:
        return self.free_queue.num_free_blocks

    def get_usage(self) -> float:
        usable = self.num_blocks - 1
        return 1.0 - self.get_num_free_blocks() / usable if usable else 0.0

    def get_cached_block(self, block_hash: BlockHash) -> Optional[KVCacheBlock]:
        self.query_count += 1
        block = self.cached_blocks.get(block_hash)
        if block is not None:
            self.hit_count += 1
        return block

    def touch(self, blocks: List[KVCacheBlock]) -> None:
        """Take a reference on cached blocks (prefix hit). A block sitting
        in the free queue (ref 0, evictable) is resurrected by removing it
        from the queue."""
        for block in blocks:
            if block.ref_cnt == 0:
                self.free_queue.remove(block)
            block.ref_cnt += 1

    def get_new_blocks(self, num_blocks: int) -> List[KVCacheBlock]:
        """Allocate blocks from the free queue (LRU order). An evicted
        block that still carries a content hash is removed from the cache
        map (eviction happens on reuse, not on free)."""
        if num_blocks > self.get_num_free_blocks():
            raise ValueError("Cannot get more blocks than free blocks")
        out: List[KVCacheBlock] = []
        for _ in range(num_blocks):
            block = self.free_queue.popleft()
            if block.block_hash is not None:
                # evict from prefix cache
                cached = self.cached_blocks.get(block.block_hash)
                if cached is block:
                    del self.cached_blocks[block.block_hash]
                block.reset_hash()
            block.ref_cnt = 1
            out.append(block)
        return out

    def cache_full_blocks(self, blocks: List[KVCacheBlock],
                          block_hashes: List[BlockHash],
                          num_cached_blocks: int,
                          num_full_blocks: int) -> None:
        """Assign content hashes to blocks [num_cached, num_full) and
        register them in the cache map."""
        if not self.enable_caching:
            return
        for i in range(num_cached_blocks, num_full_blocks):
            block = blocks[i]
            if block is self.null_block:
                continue  # sliding-window-reclaimed table entry
            if block.block_hash is not None:
                continue
            block_hash = block_hashes[i]
            block.block_hash = block_hash
            self.cached_blocks[block_hash] = block

    def free_blocks(self, blocks: List[KVCacheBlock]) -> None:
        """Drop a reference; ref 0 blocks go to the free queue tail but
        stay in the cache map until evicted by reuse."""
        for block in blocks:
            block.ref_cnt -= 1
            assert block.ref_cnt >= 0, "double free"
            if block.ref_cnt == 0:
                self.free_queue.append(block)

    def reset_prefix_cache(self) -> bool:
        """Drop all cached hashes (role of /reset_prefix_cache). Only
        safe when no block is referenced."""
        if self.get_num_free_blocks() != self.num_blocks - 1:
            return False
        self.cached_blocks.clear()
        for block in self.blocks:
            block.reset_hash()
        self.query_count = 0
        self.hit_count = 0
        return True
