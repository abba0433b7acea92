"""Ragged paged attention tests: Pallas kernel (interpret) vs jnp
reference vs a straightforward per-sequence numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_pq_tpu.ops.attention import (ref_ragged_paged_attention,
                                       write_kv_cache)
from vllm_pq_tpu.ops.rpa_kernel import ragged_paged_attention_pallas


def numpy_oracle(q, k_all, v_all, q_lens, kv_lens, sm_scale,
                 sliding_window=None, soft_cap=None):
    """Plain per-sequence causal attention (no paging)."""
    t, hq, d = q.shape
    kvh = k_all[0].shape[1]
    rep = hq // kvh
    out = np.zeros_like(q, dtype=np.float32)
    start = 0
    for s, (ql, kl) in enumerate(zip(q_lens, kv_lens)):
        k = k_all[s][:kl]  # [kl, KVH, D]
        v = v_all[s][:kl]
        for i in range(ql):
            qpos = kl - ql + i
            for h in range(hq):
                kh = h // rep
                sc = (q[start + i, h].astype(np.float32) @
                      k[:, kh].T.astype(np.float32)) * sm_scale
                if soft_cap is not None:
                    sc = np.tanh(sc / soft_cap) * soft_cap
                mask = np.arange(kl) <= qpos
                if sliding_window is not None:
                    mask &= np.arange(kl) > qpos - sliding_window
                sc = np.where(mask, sc, -1e30)
                p = np.exp(sc - sc.max())
                p /= p.sum()
                out[start + i, h] = p @ v[:, kh].astype(np.float32)
        start += ql
    return out


def build_case(seed, q_lens, kv_lens, hq=4, kvh=2, d=128, page_size=16,
               pages_per_seq=8, num_pages=64, t_pad=None, s_pad=None):
    rng = np.random.default_rng(seed)
    s = len(q_lens)
    t = sum(q_lens)
    t_pad = t_pad or t
    s_pad = s_pad or s
    assert all(k >= q for q, k in zip(q_lens, kv_lens))

    q = rng.standard_normal((t_pad, hq, d)).astype(np.float32) * 0.5
    kv_pages = rng.standard_normal(
        (num_pages, page_size, 2 * kvh, d)).astype(np.float32) * 0.5

    # assign distinct pages per sequence
    page_indices = np.zeros((s_pad, pages_per_seq), np.int32)
    next_page = 1
    k_all, v_all = [], []
    for i, kl in enumerate(kv_lens):
        n = -(-kl // page_size)
        ids = np.arange(next_page, next_page + n)
        next_page += n
        page_indices[i, :n] = ids
        seq_kv = kv_pages[ids].reshape(-1, 2 * kvh, d)
        k_all.append(seq_kv[:, 0::2, :])
        v_all.append(seq_kv[:, 1::2, :])
    assert next_page <= num_pages

    cu = np.zeros(s_pad + 1, np.int32)
    cu[1:s + 1] = np.cumsum(q_lens)
    cu[s + 1:] = cu[s]
    kv_lens_arr = np.zeros(s_pad, np.int32)
    kv_lens_arr[:s] = kv_lens

    args = (jnp.asarray(q), jnp.asarray(kv_pages),
            jnp.asarray(kv_lens_arr), jnp.asarray(page_indices),
            jnp.asarray(cu), jnp.asarray([s], np.int32))
    oracle = numpy_oracle(q[:t], k_all, v_all, q_lens, kv_lens, 0.5)
    return args, oracle, t


CASES = [
    ("decode_only", [1, 1, 1, 1], [17, 32, 5, 128]),
    ("prefill_only", [16, 32], [16, 32]),
    ("mixed", [1, 12, 1, 7], [33, 12, 90, 40]),
    ("chunked_prefill", [8, 16], [24, 100]),
    ("single_long", [64], [64]),
]


@pytest.mark.parametrize("name,q_lens,kv_lens", CASES)
def test_ref_matches_oracle(name, q_lens, kv_lens):
    args, oracle, t = build_case(0, q_lens, kv_lens)
    got = np.asarray(ref_ragged_paged_attention(*args, sm_scale=0.5))[:t]
    np.testing.assert_allclose(got, oracle, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("name,q_lens,kv_lens", CASES)
def test_pallas_matches_oracle(name, q_lens, kv_lens):
    t = sum(q_lens)
    t_pad = -(-t // 32) * 32
    args, oracle, t = build_case(0, q_lens, kv_lens, t_pad=t_pad)
    got = np.asarray(
        ragged_paged_attention_pallas(*args, sm_scale=0.5,
                                      interpret=True))[:t]
    np.testing.assert_allclose(got, oracle, rtol=2e-3, atol=2e-3)


def test_pallas_padded_seqs():
    """Padded (empty) sequences beyond num_seqs must be ignored."""
    t_pad = 32
    args, oracle, t = build_case(1, [1, 5], [9, 33], s_pad=6, t_pad=t_pad)
    got = np.asarray(
        ragged_paged_attention_pallas(*args, sm_scale=0.5,
                                      interpret=True))[:t]
    np.testing.assert_allclose(got, oracle, rtol=2e-3, atol=2e-3)


def test_pallas_gqa():
    args, oracle, t = build_case(2, [4, 1], [20, 40], hq=8, kvh=2,
                                 t_pad=32)
    got = np.asarray(
        ragged_paged_attention_pallas(*args, sm_scale=0.5,
                                      interpret=True))[:t]
    np.testing.assert_allclose(got, oracle, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("d,hq,kvh,nseq", [(64, 32, 4, 12), (128, 8, 2, 5)])
def test_pallas_decode_mode(d, hq, kvh, nseq):
    """Decode kernel (1 query/seq, token index == seq index) matches the
    oracle, including padded trailing rows."""
    q_lens = [1] * nseq
    kv_lens = (np.arange(nseq) * 7 % 120 + 1).tolist()
    t_pad = -(-nseq // 16) * 16
    args, oracle, t = build_case(7, q_lens, kv_lens, hq=hq, kvh=kvh, d=d,
                                 t_pad=t_pad, s_pad=t_pad, num_pages=256,
                                 pages_per_seq=8)
    got = np.asarray(ragged_paged_attention_pallas(
        *args, sm_scale=0.5, decode_mode=True, interpret=True))[:t]
    np.testing.assert_allclose(got, oracle, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("d,hq,kvh", [(64, 8, 4), (64, 32, 4), (32, 8, 2)])
def test_pallas_small_head_dim(d, hq, kvh):
    """head_dim < 128 uses the lane-packed KV view (TinyLlama d=64)."""
    args, oracle, t = build_case(5, [3, 1, 9], [20, 40, 9], hq=hq, kvh=kvh,
                                 d=d, t_pad=32)
    got = np.asarray(
        ragged_paged_attention_pallas(*args, sm_scale=0.5,
                                      interpret=True))[:t]
    np.testing.assert_allclose(got, oracle, rtol=2e-3, atol=2e-3)


def test_sliding_window():
    args, oracle, t = build_case(3, [1, 3], [60, 30], t_pad=32)
    oracle = numpy_oracle
    # recompute oracle with window
    args2, _, _ = build_case(3, [1, 3], [60, 30], t_pad=32)
    # build oracle manually
    rng_args, orc, t = build_case(3, [1, 3], [60, 30], t_pad=32)
    ref = np.asarray(ref_ragged_paged_attention(
        *rng_args, sm_scale=0.5, sliding_window=16))[:t]
    got = np.asarray(ragged_paged_attention_pallas(
        *rng_args, sm_scale=0.5, sliding_window=16, interpret=True))[:t]
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_write_kv_cache_roundtrip():
    rng = np.random.default_rng(0)
    kvh, d, ps, pages = 2, 128, 16, 8
    cache = jnp.zeros((pages, ps, 2 * kvh, d), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, kvh, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((5, kvh, d)).astype(np.float32))
    # tokens land in page 3 slots 2..6
    slots = jnp.asarray(3 * ps + 2 + np.arange(5), jnp.int32)
    cache = write_kv_cache(cache, k, v, slots)
    got_k = np.asarray(cache[3, 2:7, 0::2, :])
    got_v = np.asarray(cache[3, 2:7, 1::2, :])
    np.testing.assert_allclose(got_k, np.asarray(k))
    np.testing.assert_allclose(got_v, np.asarray(v))
    # null-page write for padding
    cache = write_kv_cache(cache, k, v, jnp.zeros(5, jnp.int32))
    assert np.asarray(cache[0]).any()  # harmless scribble into page 0
