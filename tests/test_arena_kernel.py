"""Pallas arena-attention kernel vs the XLA einsum window path.

The kernel (ops/arena_kernel.py) is the decode hot path on TPU; these
tests run it in interpreter mode on CPU against the round-3 XLA
segmented-softmax path (VPQ_ARENA_KERNEL=0), which is itself validated
against dense attention in tests/test_attention.py / test_int8_kv.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_pq_tpu.ops.attention import QuantKV, quantize_kv_rows
from vllm_pq_tpu.ops.window_attention import (append_ring,
                                              build_window_cache,
                                              window_attention)


def _setup(rng, s, kvh, d, n_pages, ps, int8, ring_writes, hq=None):
    pool_pages = s * n_pages + 1
    kv = rng.standard_normal(
        (pool_pages * ps, 2 * kvh, d)).astype(np.float32)
    if int8:
        qrows, scales = quantize_kv_rows(jnp.asarray(kv))
        cache = QuantKV(
            jnp.asarray(qrows).reshape(pool_pages, ps, 2 * kvh, d),
            jnp.asarray(scales).reshape(pool_pages, ps, 2 * kvh))
    else:
        cache = jnp.asarray(kv).reshape(pool_pages, ps, 2 * kvh, d)
    page_indices = jnp.asarray(
        1 + rng.permutation(s * n_pages).reshape(s, n_pages), jnp.int32)
    wc = build_window_cache(cache, page_indices, n_pages,
                            ring_n=max(ring_writes, 1))
    for _ in range(ring_writes):
        k_new = jnp.asarray(rng.standard_normal((s, kvh, d)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((s, kvh, d)), jnp.float32)
        wc = append_ring(wc, k_new, v_new)
    hq = hq or 2 * kvh
    q = jnp.asarray(rng.standard_normal((s, hq, d)), jnp.float32)
    return q, wc


def _compare(monkeypatch, q, wc, base_lens, **kw):
    monkeypatch.setenv("VPQ_ARENA_KERNEL", "0")
    ref = np.asarray(window_attention(q, wc, base_lens, **kw))
    monkeypatch.setenv("VPQ_ARENA_KERNEL", "1")
    got = np.asarray(window_attention(q, wc, base_lens, **kw))
    act = np.asarray(base_lens) > 0
    # int8 arenas: the XLA path rounds probabilities to bf16 before the
    # V contraction while the kernel keeps the q dtype (f32 here), so
    # they agree only to bf16 probability rounding
    tol = 1e-2 if wc.aK.dtype == jnp.int8 else 2e-5
    np.testing.assert_allclose(got[act], ref[act], rtol=tol, atol=tol)


@pytest.mark.parametrize("int8", [False, True])
def test_arena_kernel_matches_xla(monkeypatch, int8):
    rng = np.random.default_rng(0)
    s, kvh, d, n_pages, ps = 8, 2, 64, 4, 16
    q, wc = _setup(rng, s, kvh, d, n_pages, ps, int8, ring_writes=3)
    # ragged lengths incl. an inactive row and a full row
    base_lens = jnp.asarray([17, 0, 64, 33, 1, 50, 64, 9], jnp.int32)
    _compare(monkeypatch, q, wc, base_lens, sm_scale=0.17)


def test_arena_kernel_multi_tile(monkeypatch):
    """ctx beyond one 256-wide tile exercises the running softmax and
    the scalar-prefetch tile clamp for short rows."""
    rng = np.random.default_rng(1)
    s, kvh, d, n_pages, ps = 8, 2, 64, 32, 16   # ctx = 512
    q, wc = _setup(rng, s, kvh, d, n_pages, ps, int8=True, ring_writes=2)
    base_lens = jnp.asarray([512, 3, 257, 256, 100, 511, 0, 33],
                            jnp.int32)
    _compare(monkeypatch, q, wc, base_lens, sm_scale=0.125)


def test_arena_kernel_mha_and_gqa(monkeypatch):
    rng = np.random.default_rng(2)
    # MHA (rep=1), odd row count (s_blk=1 path), head_dim 128
    s, kvh, d, n_pages, ps = 4, 4, 128, 2, 16
    q, wc = _setup(rng, s, kvh, d, n_pages, ps, int8=False,
                   ring_writes=1, hq=kvh)
    base_lens = jnp.asarray([32, 17, 1, 24], jnp.int32)
    _compare(monkeypatch, q, wc, base_lens, sm_scale=0.09)
    # GQA rep=8
    q, wc = _setup(rng, 8, 1, 64, 2, 16, int8=True, ring_writes=2,
                   hq=8)
    base_lens = jnp.asarray([32, 17, 1, 24, 0, 31, 2, 16], jnp.int32)
    _compare(monkeypatch, q, wc, base_lens, sm_scale=0.2)


def test_arena_kernel_sliding_window(monkeypatch):
    rng = np.random.default_rng(3)
    s, kvh, d, n_pages, ps = 8, 2, 64, 4, 16
    q, wc = _setup(rng, s, kvh, d, n_pages, ps, int8=False,
                   ring_writes=3)
    base_lens = jnp.asarray([17, 0, 64, 33, 1, 50, 64, 9], jnp.int32)
    _compare(monkeypatch, q, wc, base_lens, sm_scale=0.17,
             sliding_window=20)


def test_arena_kernel_padded_queries(monkeypatch):
    """q token bucket != row count: pad/trim handling around the call."""
    rng = np.random.default_rng(4)
    s, kvh, d, n_pages, ps = 8, 2, 64, 2, 16
    q, wc = _setup(rng, s, kvh, d, n_pages, ps, int8=False,
                   ring_writes=1)
    base_lens = jnp.asarray([5, 9, 0, 32, 1, 2, 30, 31], jnp.int32)
    q16 = jnp.pad(q, ((0, 8), (0, 0), (0, 0)))
    monkeypatch.setenv("VPQ_ARENA_KERNEL", "0")
    ref = np.asarray(window_attention(q16, wc, base_lens, sm_scale=0.2))
    monkeypatch.setenv("VPQ_ARENA_KERNEL", "1")
    got = np.asarray(window_attention(q16, wc, base_lens, sm_scale=0.2))
    act = np.concatenate([np.asarray(base_lens) > 0, np.zeros(8, bool)])
    np.testing.assert_allclose(got[act], ref[act], rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("int8", [False, True])
def test_arena_kernel_packed_matches_xla(monkeypatch, int8):
    """Lane-packed arena (VPQ_ARENA_KERNEL=2): K|V of one head share a
    128-lane group; compact tiles stream at the true byte roofline."""
    rng = np.random.default_rng(7)
    s, kvh, d, n_pages, ps = 16, 2, 64, 4, 16
    # reference build + run (unpacked, XLA)
    monkeypatch.setenv("VPQ_ARENA_KERNEL", "0")
    q, wc = _setup(np.random.default_rng(7), s, kvh, d, n_pages, ps,
                   int8, ring_writes=3)
    base_lens = jnp.asarray(
        rng.integers(1, n_pages * ps, s), jnp.int32)
    ref = np.asarray(window_attention(q, wc, base_lens,
                                      sm_scale=d ** -0.5))
    # packed build + kernel run (same rng stream -> same cache/q/ring)
    monkeypatch.setenv("VPQ_ARENA_KERNEL", "2")
    q2, wc2 = _setup(np.random.default_rng(7), s, kvh, d, n_pages, ps,
                     int8, ring_writes=3)
    assert wc2.aK.shape[-1] == 2 * d and wc2.aV.shape[2] == 0
    got = np.asarray(window_attention(q2, wc2, base_lens,
                                      sm_scale=d ** -0.5))
    tol = 1e-2 if int8 else 2e-5
    np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)


def test_arena_kernel_packed_gqa_and_window(monkeypatch):
    rng = np.random.default_rng(9)
    s, kvh, d, n_pages, ps = 8, 4, 64, 2, 16
    monkeypatch.setenv("VPQ_ARENA_KERNEL", "0")
    q, wc = _setup(np.random.default_rng(9), s, kvh, d, n_pages, ps,
                   False, ring_writes=2, hq=16)
    base_lens = jnp.asarray(rng.integers(1, n_pages * ps, s), jnp.int32)
    ref = np.asarray(window_attention(q, wc, base_lens,
                                      sm_scale=d ** -0.5,
                                      sliding_window=24))
    monkeypatch.setenv("VPQ_ARENA_KERNEL", "2")
    q2, wc2 = _setup(np.random.default_rng(9), s, kvh, d, n_pages, ps,
                     False, ring_writes=2, hq=16)
    got = np.asarray(window_attention(q2, wc2, base_lens,
                                      sm_scale=d ** -0.5,
                                      sliding_window=24))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
