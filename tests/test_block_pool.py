"""BlockPool + FreeBlockQueue unit tests (pure data structures, no device;
test strategy mirrors reference tests/v1/core/, SURVEY.md §4)."""

import pytest

from vllm_pq_tpu.core.block_pool import BlockPool
from vllm_pq_tpu.core.kv_cache_utils import hash_request_tokens


def test_alloc_free_cycle():
    pool = BlockPool(num_blocks=11)
    assert pool.get_num_free_blocks() == 10
    blocks = pool.get_new_blocks(4)
    assert len(blocks) == 4
    assert all(b.ref_cnt == 1 for b in blocks)
    assert pool.get_num_free_blocks() == 6
    pool.free_blocks(blocks)
    assert pool.get_num_free_blocks() == 10


def test_null_block_never_allocated():
    pool = BlockPool(num_blocks=4)
    blocks = pool.get_new_blocks(3)
    assert all(b.block_id != 0 for b in blocks)
    with pytest.raises(ValueError):
        pool.get_new_blocks(1)


def test_lru_eviction_order():
    pool = BlockPool(num_blocks=5)
    blocks = pool.get_new_blocks(4)
    # free 2 then 1: 2 becomes LRU
    pool.free_blocks([blocks[2]])
    pool.free_blocks([blocks[1]])
    got = pool.get_new_blocks(2)
    assert [b.block_id for b in got] == [blocks[2].block_id,
                                         blocks[1].block_id]


def test_prefix_cache_hit_and_resurrection():
    pool = BlockPool(num_blocks=8)
    hashes = hash_request_tokens(4, list(range(8)))
    blocks = pool.get_new_blocks(2)
    pool.cache_full_blocks(blocks, hashes, 0, 2)
    # free all: blocks stay cached
    pool.free_blocks(blocks)
    hit = pool.get_cached_block(hashes[0])
    assert hit is blocks[0]
    # resurrect from free queue
    pool.touch([hit])
    assert hit.ref_cnt == 1
    assert pool.get_num_free_blocks() == 6


def test_eviction_removes_cache_entry():
    pool = BlockPool(num_blocks=3)
    hashes = hash_request_tokens(4, list(range(8)))
    blocks = pool.get_new_blocks(2)
    pool.cache_full_blocks(blocks, hashes, 0, 2)
    pool.free_blocks(blocks)
    # exhaust the pool: cached-but-free blocks get evicted on reuse
    pool.get_new_blocks(2)
    assert pool.get_cached_block(hashes[0]) is None


def test_hash_chain_depends_on_prefix():
    h1 = hash_request_tokens(4, [1, 2, 3, 4, 5, 6, 7, 8])
    h2 = hash_request_tokens(4, [9, 2, 3, 4, 5, 6, 7, 8])
    assert h1[0] != h2[0]
    # same second block tokens but different parent -> different hash
    assert h1[1] != h2[1]
    # partial tail block excluded
    h3 = hash_request_tokens(4, [1, 2, 3, 4, 5])
    assert len(h3) == 1


def test_reset_prefix_cache():
    pool = BlockPool(num_blocks=4)
    hashes = hash_request_tokens(2, [1, 2, 3, 4])
    blocks = pool.get_new_blocks(2)
    pool.cache_full_blocks(blocks, hashes, 0, 2)
    assert not pool.reset_prefix_cache()  # blocks still referenced
    pool.free_blocks(blocks)
    assert pool.reset_prefix_cache()
    assert pool.get_cached_block(hashes[0]) is None
