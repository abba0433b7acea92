"""Speculative decode-window attention: multi-query arena op.

Covers ops/window_attention.py::window_attention_spec and the
multi-entry append_ring — the device machinery that lets speculative
drafts run inside multi-step decode windows (reference analog: spec
tokens scheduled through the one V1 loop,
vllm/v1/core/sched/scheduler.py spec-token scheduling).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_pq_tpu.ops.window_attention import (WindowCache,
                                              build_window_cache,
                                              append_ring,
                                              window_attention_spec)
from vllm_pq_tpu.ops.attention import QuantKV


def _dense_ref(q, q_pos, keys, vals, kpos, kvalid, sm_scale, sw=None):
    """Per-(row, query, head) masked softmax over an explicit K/V list.

    q [S, Q, HQ, D]; keys/vals [S, L, KVH, D]; kpos i32[S, L];
    kvalid bool[S, L]."""
    s, nq, hq, d = q.shape
    kvh = keys.shape[2]
    rep = hq // kvh
    out = np.zeros((s, nq, hq, d), np.float32)
    for i in range(s):
        for j in range(nq):
            for h in range(hq):
                g = h // rep
                mask = kvalid[i] & (kpos[i] <= q_pos[i, j])
                if sw is not None:
                    mask = mask & (kpos[i] > q_pos[i, j] - sw)
                sc = (keys[i, :, g, :] @ q[i, j, h]) * sm_scale
                sc = np.where(mask, sc, -np.inf)
                p = np.exp(sc - sc.max())
                p = p / p.sum()
                out[i, j, h] = p @ vals[i, :, g, :]
    return out


def _build_case(rng, *, s=4, kvh=2, rep=2, d=8, page=8, n_pages=3,
                n_ring=6, nq=3, int8=False):
    hq = kvh * rep
    ctx = n_pages * page
    pool = 1 + s * n_pages  # page 0 = null page
    kv = rng.standard_normal((pool, page, 2 * kvh, d)).astype(np.float32)
    cache = jnp.asarray(kv, jnp.float32)
    if int8:
        from vllm_pq_tpu.ops.attention import quantize_kv_rows
        qd, sc = quantize_kv_rows(cache.reshape(pool * page, 2 * kvh, d))
        cache = QuantKV(qd.reshape(pool, page, 2 * kvh, d),
                        sc.reshape(pool, page, 2 * kvh))
    page_indices = jnp.asarray(
        1 + np.arange(s * n_pages).reshape(s, n_pages), jnp.int32)
    base_lens = jnp.asarray(rng.integers(3, ctx - 1, s), jnp.int32)

    wc = build_window_cache(cache, page_indices, n_pages, n_ring)
    # two multi-entry appends (Q entries per iteration)
    ringk = rng.standard_normal((2, s * nq, kvh, d)).astype(np.float32)
    ringv = rng.standard_normal((2, s * nq, kvh, d)).astype(np.float32)
    for it in range(2):
        wc = append_ring(wc, jnp.asarray(ringk[it], jnp.bfloat16),
                         jnp.asarray(ringv[it], jnp.bfloat16))
    assert int(wc.step) == 2 * nq - 1

    # ring positions/validity: iteration 0 wrote at base..base+nq-1,
    # verification accepted `acc0` of them; iteration 1 rewrote from
    # base+acc0 (stale rejected entries stay in slots with valid=False)
    acc0 = rng.integers(1, nq + 1, s)
    ring_pos = np.zeros((s, n_ring), np.int32)
    ring_valid = np.zeros((s, n_ring), bool)
    bl = np.asarray(base_lens)
    for i in range(s):
        ring_pos[i, :nq] = bl[i] + np.arange(nq)
        ring_valid[i, :nq] = np.arange(nq) < acc0[i]
        start1 = bl[i] + acc0[i]
        ring_pos[i, nq:2 * nq] = start1 + np.arange(nq)
        ring_valid[i, nq:2 * nq] = True  # current iter: all visible
    q_pos = np.stack([bl + acc0 + j for j in range(nq)], 1).astype(
        np.int32)

    q = rng.standard_normal((s * nq, hq, d)).astype(np.float32) * 0.5
    spec_md = {"q_pos": jnp.asarray(q_pos),
               "ring_pos": jnp.asarray(ring_pos),
               "ring_valid": jnp.asarray(ring_valid),
               "base_lens": base_lens}

    # explicit K/V list for the reference: arena positions then ring
    if int8:
        deq = (cache.data.astype(np.float32)
               * np.asarray(cache.scale)[..., None])
        kvd = np.asarray(deq)
    else:
        kvd = kv
    gath = kvd[np.asarray(page_indices).reshape(-1)].reshape(
        s, ctx, 2 * kvh, d)
    keys = np.concatenate(
        [gath[:, :, 0::2, :],
         np.asarray(wc.ringK.astype(jnp.float32)).transpose(1, 0, 2, 3)],
        axis=1)
    vals = np.concatenate(
        [gath[:, :, 1::2, :],
         np.asarray(wc.ringV.astype(jnp.float32)).transpose(1, 0, 2, 3)],
        axis=1)
    kpos = np.concatenate(
        [np.broadcast_to(np.arange(ctx, dtype=np.int32), (s, ctx)),
         ring_pos], axis=1)
    kvalid = np.concatenate(
        [np.arange(ctx)[None] < bl[:, None], ring_valid], axis=1)
    return (q, q_pos, wc, spec_md, keys, vals, kpos, kvalid, hq, d)


@pytest.mark.parametrize("int8", [False, True])
def test_spec_window_matches_dense_reference(int8):
    rng = np.random.default_rng(0 if not int8 else 1)
    (q, q_pos, wc, spec_md, keys, vals, kpos, kvalid,
     hq, d) = _build_case(rng, int8=int8)
    sm = 1.0 / np.sqrt(d)
    out = jax.jit(
        lambda q, wc, md: window_attention_spec(q, wc, md, sm_scale=sm)
    )(jnp.asarray(q), wc, spec_md)
    s, nq = q_pos.shape
    ref = _dense_ref(q.reshape(s, nq, hq, d), q_pos, keys, vals, kpos,
                     kvalid, sm)
    np.testing.assert_allclose(
        np.asarray(out, np.float32).reshape(s, nq, hq, d), ref,
        rtol=0.08, atol=0.08)


def test_spec_window_sliding_window():
    rng = np.random.default_rng(2)
    (q, q_pos, wc, spec_md, keys, vals, kpos, kvalid,
     hq, d) = _build_case(rng)
    sm = 1.0 / np.sqrt(d)
    sw = 7
    out = jax.jit(
        lambda q, wc, md: window_attention_spec(
            q, wc, md, sm_scale=sm, sliding_window=sw)
    )(jnp.asarray(q), wc, spec_md)
    s, nq = q_pos.shape
    ref = _dense_ref(q.reshape(s, nq, hq, d), q_pos, keys, vals, kpos,
                     kvalid, sm, sw=sw)
    np.testing.assert_allclose(
        np.asarray(out, np.float32).reshape(s, nq, hq, d), ref,
        rtol=0.05, atol=0.05)


def test_append_ring_single_entry_unchanged():
    """Q=1 appends keep the plain-window semantics (step advances 1)."""
    rng = np.random.default_rng(3)
    s, kvh, d, page, n_pages = 3, 2, 8, 8, 2
    pool = 1 + s * n_pages
    cache = jnp.asarray(
        rng.standard_normal((pool, page, 2 * kvh, d)), jnp.float32)
    pi = jnp.asarray(1 + np.arange(s * n_pages).reshape(s, n_pages),
                     jnp.int32)
    wc = build_window_cache(cache, pi, n_pages, 4)
    k = jnp.asarray(rng.standard_normal((s, kvh, d)), jnp.bfloat16)
    wc = append_ring(wc, k, k)
    assert int(wc.step) == 0
    np.testing.assert_allclose(np.asarray(wc.ringK[0], np.float32),
                               np.asarray(k, np.float32))
    wc = append_ring(wc, k, k)
    assert int(wc.step) == 1
