"""KVCacheManager unit tests (no device)."""

from vllm_pq_tpu.core.kv_cache_manager import KVCacheManager
from vllm_pq_tpu.request import Request
from vllm_pq_tpu.sampling_params import SamplingParams


def make_req(req_id, tokens):
    return Request(req_id, tokens, SamplingParams(max_tokens=8))


def make_mgr(num_blocks=32, block_size=4, prealloc=0, caching=True):
    return KVCacheManager(num_blocks=num_blocks, block_size=block_size,
                          max_model_len=256, enable_caching=caching,
                          num_preallocate_blocks=prealloc)


def test_allocate_and_free():
    mgr = make_mgr()
    req = make_req("r1", list(range(10)))
    blocks = mgr.allocate_slots(req, 10)
    assert blocks is not None and len(blocks) == 3  # ceil(10/4)
    assert mgr.block_pool.get_num_free_blocks() == 31 - 3
    mgr.free(req)
    assert mgr.block_pool.get_num_free_blocks() == 31


def test_prealloc_lookahead():
    mgr = make_mgr(prealloc=2)
    req = make_req("r1", list(range(4)))
    blocks = mgr.allocate_slots(req, 4)
    assert len(blocks) == 3  # 1 required + 2 lookahead


def test_prefix_cache_hit_across_requests():
    mgr = make_mgr()
    prompt = list(range(12))
    r1 = make_req("r1", prompt)
    mgr.allocate_slots(r1, 12)
    r1.num_computed_tokens = 12
    # caching happened at allocate time for full blocks
    mgr.free(r1)

    r2 = make_req("r2", prompt + [99, 100])
    computed, n = mgr.get_computed_blocks(r2)
    assert n == 12
    assert len(computed) == 3
    new_blocks = mgr.allocate_slots(r2, 2, computed)
    assert new_blocks is not None
    ids = mgr.get_block_ids("r2")
    assert ids[:3] == [b.block_id for b in computed]


def test_full_prompt_hit_trimmed():
    mgr = make_mgr()
    prompt = list(range(8))
    r1 = make_req("r1", prompt)
    mgr.allocate_slots(r1, 8)
    mgr.free(r1)
    r2 = make_req("r2", prompt)
    computed, n = mgr.get_computed_blocks(r2)
    # must leave >=1 token to compute logits
    assert n == 4
    assert len(computed) == 1


def test_alloc_refuses_counting_evictable_hits():
    # pool of 3 usable blocks; 2 are cached+free (evictable), ask for a
    # request that hits both and needs 2 more -> must refuse
    mgr = make_mgr(num_blocks=4)
    r1 = make_req("r1", list(range(8)))
    mgr.allocate_slots(r1, 8)
    mgr.free(r1)
    r2 = make_req("r2", list(range(8)) + [9] * 8)
    computed, n = mgr.get_computed_blocks(r2)
    assert n == 8 and len(computed) == 2
    out = mgr.allocate_slots(r2, 8, computed)
    assert out is None  # only 1 truly free block


def test_generated_tokens_get_cached():
    mgr = make_mgr()
    req = make_req("r1", [1, 2, 3])
    mgr.allocate_slots(req, 3)
    req.num_computed_tokens = 3
    # generate 5 tokens one by one -> blocks fill and get hashed
    for t in [10, 11, 12, 13, 14]:
        req.append_output_token_ids(t)
        mgr.allocate_slots(req, 1)
        req.num_computed_tokens += 1
    mgr.free(req)
    r2 = make_req("r2", [1, 2, 3, 10, 11, 12, 13, 14])
    computed, n = mgr.get_computed_blocks(r2)
    assert n == 4  # first full block [1,2,3,10] cached


def test_caching_disabled():
    mgr = make_mgr(caching=False)
    r1 = make_req("r1", list(range(8)))
    mgr.allocate_slots(r1, 8)
    mgr.free(r1)
    r2 = make_req("r2", list(range(8)))
    computed, n = mgr.get_computed_blocks(r2)
    assert n == 0 and computed == []
