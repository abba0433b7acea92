"""Decode-window KV arena: immutable dense KV + per-window ring.

Round-2 finding (see BENCHMARKS.md): inside one XLA program, any op
reading a buffer that a Pallas call aliases in place forces XLA to
materialize whole-buffer protective copies — a multi-step decode loop
that pallas-writes the paged cache and then gathers from it pays
~40 ms/iteration in copies (the same mechanism behind round 1's
"oversized pool donation cliff"). The fix is structural:

- at window START the live KV prefix is gathered ONCE from the paged
  cache into a dense, contiguous arena (aK/aV [S, CTX, KVH, D]) that is
  NEVER written during the window;
- each iteration's new K/V rows append to a small per-layer ring
  ([N, S, KVH, D], dynamic_update_slice on the leading axis — in-place,
  ~MBs);
- attention merges arena and ring scores in one softmax (dense masked
  attention at the HBM roofline: measured 4.0 ms/iter for the 22-layer
  TinyLlama chain at batch 256 vs 54 ms/iter for pallas-write + gather);
- at window END a separate dispatch folds the rings into the paged
  cache with the Pallas KV-write kernel (donation-clean: that graph
  contains no other reader of the cache).

``WindowCache`` is a pytree that flows through the unchanged model code
in place of the paged per-layer cache array: ``write_kv_cache`` appends
to the ring and ``ragged_paged_attention`` runs the merged dense
attention (see the dispatch hooks in ``ops/attention.py``).
"""

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp

MASK_VALUE = -1e30


@jax.tree_util.register_dataclass
@dataclass
class WindowCache:
    aK: jax.Array      # [S, CTX, KVH, D] dense arena keys (immutable)
    aV: jax.Array      # [S, CTX, KVH, D]
    sK: jax.Array      # [Ls, KVH, D] SHARED-prefix keys (cascade role:
    sV: jax.Array      #   stored and read once for the whole batch)
    ringK: jax.Array   # [N, S, KVH, D] this window's appended keys
    ringV: jax.Array   # [N, S, KVH, D]
    step: jax.Array    # i32[] index of the last written ring row (-1)


def build_window_cache(kv_cache: jax.Array, page_indices: jax.Array,
                       n_pages: int, ring_n: int,
                       shared_pages: int = 0) -> WindowCache:
    """Gather the live KV prefix into a dense arena (once per window).

    kv_cache [P, ps, 2*KVH, D]; page_indices i32[S, >= shared_pages +
    n_pages]. ``shared_pages`` leading pages are identical across every
    active row (prefix-cache hits): they are gathered ONCE into sK/sV —
    the cascade-attention bandwidth saving (reference
    use_cascade_attention, v1/worker/gpu_model_runner.py:665)."""
    from vllm_pq_tpu.ops.attention import QuantKV, _gather_pages
    arr = kv_cache.data if isinstance(kv_cache, QuantKV) else kv_cache
    s = page_indices.shape[0]
    ps = arr.shape[1]
    kvh = arr.shape[2] // 2
    d = arr.shape[3]
    # int8 caches dequantize INTO the arena: the capacity win lives in
    # the paged pool; window attention reads bf16 either way
    sh = jnp.bfloat16 if isinstance(kv_cache, QuantKV) else arr.dtype
    if shared_pages:
        spages = _gather_pages(kv_cache, page_indices[0, :shared_pages],
                               sh).reshape(shared_pages * ps, 2 * kvh, d)
        sK, sV = spages[:, 0::2, :], spages[:, 1::2, :]
    else:
        sK = jnp.zeros((0, kvh, d), sh)
        sV = jnp.zeros((0, kvh, d), sh)
    pages = _gather_pages(
        kv_cache,
        page_indices[:, shared_pages:shared_pages + n_pages], sh)
    pages = pages.reshape(s, n_pages * ps, 2 * kvh, d)
    aK = pages[:, :, 0::2, :]
    aV = pages[:, :, 1::2, :]
    ring_shape = (ring_n, s, kvh, d)
    return WindowCache(
        aK=aK, aV=aV, sK=sK, sV=sV,
        ringK=jnp.zeros(ring_shape, sh),
        ringV=jnp.zeros(ring_shape, sh),
        step=jnp.int32(-1))


def append_ring(wc: WindowCache, k: jax.Array, v: jax.Array) -> WindowCache:
    """Append this iteration's K/V rows ([S, KVH, D]) to the ring."""
    j = wc.step + 1
    ringK = jax.lax.dynamic_update_slice(
        wc.ringK, k[None].astype(wc.ringK.dtype), (j, 0, 0, 0))
    ringV = jax.lax.dynamic_update_slice(
        wc.ringV, v[None].astype(wc.ringV.dtype), (j, 0, 0, 0))
    return WindowCache(aK=wc.aK, aV=wc.aV, sK=wc.sK, sV=wc.sV,
                       ringK=ringK, ringV=ringV, step=j)


def window_attention(q: jax.Array, wc: WindowCache, base_lens: jax.Array,
                     *, sm_scale: float,
                     sliding_window: Optional[int] = None,
                     soft_cap: Optional[float] = None,
                     alibi_slopes: Optional[jax.Array] = None) -> jax.Array:
    """Merged dense attention over arena + ring.

    q [S(+pad), HQ, D] (row i = sequence i); base_lens i32[S] = each
    row's kv length at WINDOW START (arena-valid prefix); ring cols
    0..wc.step hold the window's tokens (query attends through its own
    ring position)."""
    s, ctx, kvh, d = wc.aK.shape
    n = wc.ringK.shape[0]
    ls = wc.sK.shape[0]            # shared-prefix length (cascade)
    t = q.shape[0]
    qs = q[:s] if t >= s else jnp.pad(q, ((0, s - t), (0, 0), (0, 0)))
    hq = qs.shape[1]
    rep = hq // kvh
    qh = qs.reshape(s, kvh, rep, d)
    qscaled = qh * jnp.asarray(sm_scale, qh.dtype)

    sc_a = jnp.einsum("sgrd,slgd->sgrl", qscaled, wc.aK,
                      preferred_element_type=jnp.float32)
    sc_r = jnp.einsum("sgrd,nsgd->sgrn", qscaled, wc.ringK,
                      preferred_element_type=jnp.float32)

    cur_pos = base_lens[:, None] + wc.step  # query's absolute position
    # arena columns hold absolute positions [ls, ls + ctx)
    apos = ls + jnp.arange(ctx, dtype=jnp.int32)[None, :]
    valid_a = apos < base_lens[:, None]
    rpos = base_lens[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]
    valid_r = jnp.arange(n, dtype=jnp.int32)[None, :] <= wc.step
    if sliding_window is not None:
        valid_a &= apos > (cur_pos - sliding_window)
        valid_r &= rpos > (cur_pos - sliding_window)

    if alibi_slopes is not None:
        sl = alibi_slopes.reshape(kvh, rep)
        dist_a = (apos - cur_pos).astype(jnp.float32)
        dist_r = (rpos - cur_pos).astype(jnp.float32)
        sc_a = sc_a + sl[None, :, :, None] * dist_a[:, None, None, :]
        sc_r = sc_r + sl[None, :, :, None] * dist_r[:, None, None, :]
    if soft_cap is not None:
        sc_a = jnp.tanh(sc_a / soft_cap) * soft_cap
        sc_r = jnp.tanh(sc_r / soft_cap) * soft_cap

    sc_a = jnp.where(valid_a[:, None, None, :], sc_a, MASK_VALUE)
    sc_r = jnp.where(valid_r[:, None, None, :], sc_r, MASK_VALUE)
    parts = [sc_a, sc_r]
    if ls:
        # shared prefix scored against ONE stored copy (the whole
        # point: its KV is read once for the batch, not per row)
        sc_s = jnp.einsum("sgrd,lgd->sgrl", qscaled, wc.sK,
                          preferred_element_type=jnp.float32)
        spos = jnp.arange(ls, dtype=jnp.int32)[None, :]
        valid_s = spos < jnp.minimum(base_lens[:, None], ls)
        if sliding_window is not None:
            valid_s &= spos > (cur_pos - sliding_window)
        if alibi_slopes is not None:
            dist_s = (spos - cur_pos).astype(jnp.float32)
            sc_s = sc_s + sl[None, :, :, None] * dist_s[:, None, None, :]
        if soft_cap is not None:
            sc_s = jnp.tanh(sc_s / soft_cap) * soft_cap
        sc_s = jnp.where(valid_s[:, None, None, :], sc_s, MASK_VALUE)
        parts = [sc_s] + parts
    sc = jnp.concatenate(parts, axis=-1)
    p = jax.nn.softmax(sc, axis=-1)
    pss, pa, pr = p[..., :ls], p[..., ls:ls + ctx], p[..., ls + ctx:]
    out = jnp.einsum("sgrl,slgd->sgrd", pa.astype(wc.aV.dtype), wc.aV,
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("sgrn,nsgd->sgrd", pr.astype(wc.ringV.dtype),
                           wc.ringV, preferred_element_type=jnp.float32)
    if ls:
        out = out + jnp.einsum("sgrl,lgd->sgrd",
                               pss.astype(wc.sV.dtype), wc.sV,
                               preferred_element_type=jnp.float32)
    out = out.reshape(s, hq, d).astype(q.dtype)
    if t > s:
        out = jnp.pad(out, ((0, t - s), (0, 0), (0, 0)))
    elif t < s:
        out = out[:t]
    return out
