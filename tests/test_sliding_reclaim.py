"""Sliding-window KV reclamation (role of reference KVCacheManager
sliding_window support, v1/core/kv_cache_manager.py:25): a long
uniform-sliding-window request must hold O(window) blocks, with leading
table entries nulled, token-exact vs. the mask-only path."""

import json
import os

import pytest

from vllm_pq_tpu.core.kv_cache_manager import KVCacheManager
from vllm_pq_tpu.request import Request
from vllm_pq_tpu.sampling_params import SamplingParams


def make_req(req_id, tokens, max_tokens=8):
    return Request(req_id, tokens, SamplingParams(max_tokens=max_tokens))


def make_mgr(sliding_window, num_blocks=64, block_size=4, prealloc=0):
    return KVCacheManager(num_blocks=num_blocks, block_size=block_size,
                          max_model_len=512, enable_caching=True,
                          num_preallocate_blocks=prealloc,
                          sliding_window=sliding_window)


def test_long_request_holds_o_window_blocks():
    bs, w = 4, 16
    mgr = make_mgr(sliding_window=w, block_size=bs)
    req = make_req("r1", list(range(8)), max_tokens=200)
    assert mgr.allocate_slots(req, 8) is not None
    req.num_computed_tokens = 8
    # decode 100 steps
    for step in range(100):
        req.append_output_token_ids(1000 + step)
        assert mgr.allocate_slots(req, 1) is not None
        req.num_computed_tokens += 1
    blocks = mgr.req_to_blocks["r1"]
    null = mgr.block_pool.null_block
    live = [b for b in blocks if b is not null]
    # live blocks bounded by window + current step + block rounding
    assert len(live) <= (w // bs) + 2, len(live)
    # leading entries are nulled
    n_dead = req.num_computed_tokens - w + 1
    assert all(b is null for b in blocks[:n_dead // bs])
    # and the pool got the memory back
    held = (mgr.block_pool.num_blocks - 1 -
            mgr.block_pool.get_num_free_blocks())
    assert held == len(live)
    # finishing must not double-free the nulls
    mgr.free(req)
    assert mgr.block_pool.get_num_free_blocks() == \
        mgr.block_pool.num_blocks - 1


def test_no_reclaim_without_window():
    mgr = KVCacheManager(num_blocks=64, block_size=4, max_model_len=512,
                         enable_caching=True, num_preallocate_blocks=0)
    req = make_req("r1", list(range(8)), max_tokens=100)
    mgr.allocate_slots(req, 8)
    req.num_computed_tokens = 8
    for step in range(60):
        req.append_output_token_ids(step)
        mgr.allocate_slots(req, 1)
        req.num_computed_tokens += 1
    null = mgr.block_pool.null_block
    assert all(b is not null for b in mgr.req_to_blocks["r1"])


def test_deferred_free_routes_reclaimed_through_limbo():
    bs, w = 4, 8
    mgr = make_mgr(sliding_window=w, block_size=bs)
    mgr.deferred_free = True
    req = make_req("r1", list(range(8)), max_tokens=64)
    mgr.allocate_slots(req, 8)
    req.num_computed_tokens = 8
    free0 = mgr.block_pool.get_num_free_blocks()
    for step in range(20):
        req.append_output_token_ids(step)
        mgr.allocate_slots(req, 1)
        req.num_computed_tokens += 1
    # reclaimed blocks are in limbo, not yet free
    assert mgr.block_pool.get_num_free_blocks() < free0
    mgr.flush_deferred()
    mgr.flush_deferred()
    # two flushes later they are truly free (minus the live tail growth)
    null = mgr.block_pool.null_block
    live = [b for b in mgr.req_to_blocks["r1"] if b is not null]
    held = (mgr.block_pool.num_blocks - 1 -
            mgr.block_pool.get_num_free_blocks())
    assert held == len(live)


TINY_SW = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 512,
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "num_key_value_heads": 2,
    "max_position_embeddings": 512,
    "sliding_window": 24,
}


@pytest.fixture(scope="module")
def sw_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_sw_model")
    with open(d / "config.json", "w") as f:
        json.dump(TINY_SW, f)
    return str(d)


def _gen(model_dir, reclaim: bool):
    os.environ["VPQ_SLIDING_RECLAIM"] = "1" if reclaim else "0"
    try:
        from vllm_pq_tpu import LLM, SamplingParams as SP
        llm = LLM(model=model_dir, load_format="dummy", dtype="float32",
                  max_model_len=128, max_num_seqs=4,
                  max_num_batched_tokens=128, block_size=16,
                  num_kv_blocks=48)
        sp = SP(temperature=0.0, max_tokens=48, ignore_eos=True)
        prompts = [{"prompt_token_ids": [7, 8, 9, 10, 11]},
                   {"prompt_token_ids": [3, 4, 5]}]
        outs = llm.generate(prompts, sp)
        sched = llm.llm_engine.engine_core.scheduler
        return ([o.outputs[0].token_ids for o in outs],
                sched.kv_cache_manager.sliding_window)
    finally:
        os.environ.pop("VPQ_SLIDING_RECLAIM", None)


def test_e2e_token_exact_vs_mask_only(sw_model_dir):
    """Decoding well past the window must be token-exact with and
    without reclamation (the mask already hides dead positions)."""
    ref, sw_off = _gen(sw_model_dir, reclaim=False)
    got, sw_on = _gen(sw_model_dir, reclaim=True)
    assert sw_off is None and sw_on == 24
    assert got == ref
