"""Int8 KV cache (--kv-cache-dtype int8): per-(token, head) absmax
scales, dequant fused into the XLA attention gathers (role of the
reference cache_dtype=fp8, vllm/config.py:1057)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

TINY = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 512,
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "num_key_value_heads": 2,
    "max_position_embeddings": 512,
}

KW = dict(load_format="dummy", dtype="float32", max_model_len=128,
          max_num_seqs=8, max_num_batched_tokens=128, block_size=16,
          num_kv_blocks=64)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_int8kv")
    with open(d / "config.json", "w") as f:
        json.dump(TINY, f)
    return str(d)


def test_quantize_roundtrip():
    from vllm_pq_tpu.ops.attention import quantize_kv_rows
    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.standard_normal((32, 4, 64)) * 3.0, jnp.float32)
    q, sc = quantize_kv_rows(kv)
    deq = np.asarray(q, np.float32) * np.asarray(sc)[..., None]
    err = np.abs(deq - np.asarray(kv))
    assert np.all(err <= np.asarray(sc)[..., None] * 0.51 + 1e-6)


def test_write_and_read_quantkv():
    from vllm_pq_tpu.ops.attention import (QuantKV,
                                           ref_ragged_paged_attention,
                                           write_kv_cache)
    rng = np.random.default_rng(1)
    p, ps, kvh, d = 8, 4, 2, 16
    cache = QuantKV(jnp.zeros((p, ps, 2 * kvh, d), jnp.int8),
                    jnp.zeros((p, ps, 2 * kvh), jnp.float32))
    dense = jnp.zeros((p, ps, 2 * kvh, d), jnp.float32)
    t = 8
    k = jnp.asarray(rng.standard_normal((t, kvh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, kvh, d)), jnp.float32)
    slots = jnp.asarray(np.arange(ps, ps + t, dtype=np.int32))  # page 1+
    cache = write_kv_cache(cache, k, v, slots)
    dense = write_kv_cache(dense, k, v, slots)

    q = jnp.asarray(rng.standard_normal((t, 2 * kvh, d)), jnp.float32)
    kv_lens = jnp.asarray([t], jnp.int32)
    page_indices = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    cu = jnp.asarray([0, t], jnp.int32)
    ns = jnp.asarray([1], jnp.int32)
    out_q = ref_ragged_paged_attention(q, cache, kv_lens, page_indices,
                                       cu, ns, sm_scale=0.25)
    out_d = ref_ragged_paged_attention(q, dense, kv_lens, page_indices,
                                       cu, ns, sm_scale=0.25)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_d),
                               rtol=0.05, atol=0.05)


def _gen(model_dir, **extra):
    from vllm_pq_tpu import LLM, SamplingParams
    llm = LLM(model=model_dir, **KW, **extra)
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    prompts = [{"prompt_token_ids": [7, 8, 9, 10, 11]},
               {"prompt_token_ids": [3, 4, 5]}]
    outs = llm.generate(prompts, sp)
    runner = llm.llm_engine.engine_core.runner
    return [o.outputs[0].token_ids for o in outs], runner


def test_e2e_int8_kv_token_matching(model_dir):
    """End-to-end with an int8 cache: generation completes, the cache
    really is quantized, and the leading tokens match the bf16 run.
    (Random-weight tiny models have near-flat logits, so greedy decode
    eventually diverges under ANY cache quantization — the numeric
    tolerance guarantees live in the ops-level tests above.)"""
    ref, _ = _gen(model_dir)
    got, runner = _gen(model_dir, kv_cache_dtype="int8")
    from vllm_pq_tpu.ops.attention import QuantKV
    assert isinstance(runner.kv_caches[0], QuantKV)
    for r, g in zip(ref, got):
        assert len(g) == len(r)
        m = 0
        for a, b in zip(r, g):
            if a != b:
                break
            m += 1
        assert m >= 1, (r, g)


def test_int8_kv_block_budget(model_dir):
    """The memory probe must account int8 bytes: with the same util the
    pool holds ~2x the blocks of the bf16 cache."""
    from vllm_pq_tpu.config import CacheConfig
    from vllm_pq_tpu.engine.arg_utils import EngineArgs

    def blocks(dtype):
        kw = dict(KW)
        kw.pop("num_kv_blocks")
        cfg = EngineArgs(model=model_dir, kv_cache_dtype=dtype,
                         **kw).create_engine_config()
        cfg.model.dtype = "bfloat16"
        from vllm_pq_tpu.worker.worker import Worker
        w = Worker(cfg)
        w.load_model()
        return w.determine_num_kv_blocks()

    b_bf16 = blocks("auto")
    b_int8 = blocks("int8")
    # capped by max_useful in small configs; at least never fewer
    assert b_int8 >= b_bf16


def test_int8_window_arena_matches_dense_arena():
    """Multi-step decode-window attention over an int8 arena: the
    per-column scale factors out of the dot product exactly, so the
    int8-arena scores must match dequantize-then-attend within int8
    quantization noise."""
    import jax.numpy as jnp
    from vllm_pq_tpu.ops.attention import QuantKV, quantize_kv_rows
    from vllm_pq_tpu.ops.window_attention import (build_window_cache,
                                                  append_ring,
                                                  window_attention)
    rng = np.random.default_rng(3)
    ps, kvh, d, s = 16, 2, 32, 4
    n_pages_pool = 8
    kv = rng.standard_normal((n_pages_pool * ps, 2 * kvh, d)).astype(
        np.float32)
    qrows, scales = quantize_kv_rows(jnp.asarray(kv))
    qcache = QuantKV(
        jnp.asarray(qrows).reshape(n_pages_pool, ps, 2 * kvh, d),
        jnp.asarray(scales).reshape(n_pages_pool, ps, 2 * kvh))
    dense = (np.asarray(qrows, np.float32)
             * np.asarray(scales)[..., None]).reshape(
        n_pages_pool, ps, 2 * kvh, d).astype(np.float32)

    page_indices = jnp.asarray(
        [[1, 2, 0, 0], [3, 4, 0, 0], [5, 6, 0, 0], [7, 1, 0, 0]],
        jnp.int32)
    base_lens = jnp.asarray([20, 9, 31, 16], jnp.int32)

    wc_q = build_window_cache(qcache, page_indices, 2, ring_n=2)
    wc_d = build_window_cache(jnp.asarray(dense), page_indices, 2,
                              ring_n=2)
    assert wc_q.aK.dtype == jnp.int8
    k_new = jnp.asarray(rng.standard_normal((s, kvh, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((s, kvh, d)), jnp.float32)
    wc_q = append_ring(wc_q, k_new, v_new)
    wc_d = append_ring(wc_d, k_new, v_new)

    q = jnp.asarray(rng.standard_normal((s, 2 * kvh, d)), jnp.float32)
    out_q = window_attention(q, wc_q, base_lens, sm_scale=0.2)
    out_d = window_attention(q, wc_d, base_lens, sm_scale=0.2)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_d),
                               rtol=2e-2, atol=2e-2)


def test_e2e_int8_kv_multistep_windows(model_dir):
    """int8 pool + multi-step windows (int8 arena path) generates and
    stays prefix-consistent with the bf16 multi-step run."""
    ref, _ = _gen(model_dir, num_scheduler_steps=4)
    got, runner = _gen(model_dir, kv_cache_dtype="int8",
                       num_scheduler_steps=4)
    from vllm_pq_tpu.ops.attention import QuantKV
    assert isinstance(runner.kv_caches[0], QuantKV)
    for r, g in zip(ref, got):
        assert len(g) == len(r)
        m = sum(1 for a, b in zip(r, g) if a == b)
        assert m >= 1, (r, g)
