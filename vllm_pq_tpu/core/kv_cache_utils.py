"""KV-cache block bookkeeping primitives.

Own design following the behavior of the reference's
``vllm/v1/core/kv_cache_utils.py`` (BlockHashType :18, hash chain :349-412,
free-queue :145): ref-counted blocks, a doubly-linked free queue giving
LRU eviction with O(1) removal, and a content-hash chain over full blocks
for prefix caching.
"""

from dataclasses import dataclass
from typing import Any, List, NamedTuple, Optional, Tuple


class BlockHash(NamedTuple):
    """Content hash of one full block: chains the parent hash with this
    block's token ids (plus optional extra keys, e.g. LoRA id), so equal
    hashes imply equal full prefixes."""

    value: int
    token_ids: Tuple[int, ...]
    extra: Any = None


NONE_HASH = BlockHash(hash(("vpq-root",)), ())


def hash_block_tokens(parent: Optional[BlockHash],
                      token_ids: Tuple[int, ...],
                      extra: Any = None) -> BlockHash:
    parent_value = parent.value if parent is not None else NONE_HASH.value
    return BlockHash(hash((parent_value, token_ids, extra)), token_ids, extra)


def hash_request_tokens(block_size: int, token_ids: List[int],
                        extra: Any = None) -> List[BlockHash]:
    """Hash all *full* blocks of a token sequence (partial tail excluded)."""
    hashes: List[BlockHash] = []
    parent: Optional[BlockHash] = None
    for start in range(0, len(token_ids) - block_size + 1, block_size):
        chunk = tuple(token_ids[start:start + block_size])
        parent = hash_block_tokens(parent, chunk, extra)
        hashes.append(parent)
    return hashes


@dataclass
class KVCacheBlock:
    block_id: int
    ref_cnt: int = 0
    block_hash: Optional[BlockHash] = None
    # doubly-linked free-queue pointers
    prev_free: Optional["KVCacheBlock"] = None
    next_free: Optional["KVCacheBlock"] = None

    def reset_hash(self):
        self.block_hash = None

    def __repr__(self):
        return f"KVCacheBlock(id={self.block_id}, ref={self.ref_cnt})"


class FreeBlockQueue:
    """Doubly-linked LRU queue of free blocks.

    - popleft() evicts the least-recently-freed block first, so prefix
      tails freed in reverse order are evicted before their parents
      (reference behavior, kv_cache_manager.py:251-255).
    - remove() is O(1), used when a cached block is resurrected by a
      prefix hit while sitting in the free queue.
    """

    def __init__(self, blocks: List[KVCacheBlock]):
        self.num_free_blocks = len(blocks)
        # sentinel-less: track head/tail
        self._head: Optional[KVCacheBlock] = blocks[0] if blocks else None
        self._tail: Optional[KVCacheBlock] = blocks[-1] if blocks else None
        for i, b in enumerate(blocks):
            b.prev_free = blocks[i - 1] if i > 0 else None
            b.next_free = blocks[i + 1] if i < len(blocks) - 1 else None

    def popleft(self) -> KVCacheBlock:
        if self._head is None:
            raise ValueError("No free blocks")
        block = self._head
        self.remove(block)
        return block

    def remove(self, block: KVCacheBlock) -> None:
        if block.prev_free is not None:
            block.prev_free.next_free = block.next_free
        else:
            self._head = block.next_free
        if block.next_free is not None:
            block.next_free.prev_free = block.prev_free
        else:
            self._tail = block.prev_free
        block.prev_free = None
        block.next_free = None
        self.num_free_blocks -= 1

    def append(self, block: KVCacheBlock) -> None:
        if self._tail is None:
            self._head = self._tail = block
            block.prev_free = None
            block.next_free = None
        else:
            self._tail.next_free = block
            block.prev_free = self._tail
            block.next_free = None
            self._tail = block
        self.num_free_blocks += 1

    def get_all_ids(self) -> List[int]:
        out = []
        b = self._head
        while b is not None:
            out.append(b.block_id)
            b = b.next_free
        return out
