"""Ragged paged attention + KV-cache write ops.

KV-cache layout: ``[num_pages, page_size, 2*num_kv_heads, head_dim]``
with K at even and V at odd combined-head indices (matches the JAX
ecosystem ragged-paged-attention convention so kernels are
interchangeable; role of the reference kv-cache shape decisions in
``attention/backends/pallas.py:34-44``).

Page 0 is the *null page*: padded slots in ``slot_mapping`` point at it,
so scatter writes of padding tokens are harmless (the BlockPool never
allocates block 0 to a request).

Three implementations:
- ``ref_ragged_paged_attention``: jittable XLA reference (static shapes,
  masked), used on CPU and as the correctness oracle;
- ``ragged_paged_attention_pallas``: our own Pallas kernel (see
  ``ops/rpa_kernel.py``);
- dispatch in ``ragged_paged_attention``.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

import vllm_pq_tpu.envs as envs

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


class QuantKV(NamedTuple):
    """Int8 paged KV cache with per-(token, head) absmax scales —
    halves KV bytes, so decode attention streams half the HBM and the
    pool holds twice the tokens (role of the reference's fp8
    cache_dtype, vllm/config.py:1057 + csrc/cache_kernels.cu fp8
    conversion; int8 is the TPU-native narrow type)."""
    data: jax.Array    # int8 [P, page_size, 2*KVH, D]
    scale: jax.Array   # f32  [P, page_size, 2*KVH]


def quantize_kv_rows(kv: jax.Array):
    """[T, 2*KVH, D] -> (int8 rows, f32 per-head scales [T, 2*KVH])."""
    amax = jnp.max(jnp.abs(kv.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0 + 1e-8
    q = jnp.clip(jnp.round(kv.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def _gather_pages(kv_pages, idx, out_dtype=jnp.bfloat16):
    """take() pages from a plain or quantized cache, dequantizing."""
    # mode="clip": match TPU gather semantics everywhere. JAX's default
    # out-of-bounds fill is NaN on CPU, which silently poisons the
    # 0-weighted padded-page terms of the softmax-weighted sum.
    if isinstance(kv_pages, QuantKV):
        pages = jnp.take(kv_pages.data, idx, axis=0, mode="clip")
        scales = jnp.take(kv_pages.scale, idx, axis=0, mode="clip")
        return (pages.astype(jnp.float32)
                * scales[..., None]).astype(out_dtype)
    return jnp.take(kv_pages, idx, axis=0, mode="clip")


def write_kv_cache(kv_cache, k: jax.Array, v: jax.Array,
                   slot_mapping: jax.Array, q_per_row: int = 1):
    """Scatter new K/V rows into the paged cache.

    kv_cache [P, page_size, 2*KVH, D]; k, v [T, KVH, D];
    slot_mapping [T] flat slot ids (page*page_size + offset); padding
    slots must point into page 0.

    Inside a decode window the cache is a ``WindowCache`` (immutable
    arena + ring, ops/window_attention.py): the write appends to the
    ring instead (the paged fold happens in a separate dispatch).
    ``q_per_row`` > 1 (speculative windows) appends that many ring
    entries per sequence from the flat row-major [S*Q, KVH, D] input."""
    from vllm_pq_tpu.ops.window_attention import WindowCache, append_ring
    if isinstance(kv_cache, WindowCache):
        s = kv_cache.aK.shape[0] * q_per_row
        t = k.shape[0]
        ks = k[:s] if t >= s else jnp.pad(k, ((0, s - t), (0, 0), (0, 0)))
        vs = v[:s] if t >= s else jnp.pad(v, ((0, s - t), (0, 0), (0, 0)))
        return append_ring(kv_cache, ks, vs)
    if isinstance(kv_cache, QuantKV):
        p, ps, ckv, d = kv_cache.data.shape
        kv = jnp.stack([k, v], axis=2).reshape(k.shape[0], ckv, d)
        q, sc = quantize_kv_rows(kv)
        data = kv_cache.data.reshape(p * ps, ckv, d).at[
            slot_mapping].set(q).reshape(p, ps, ckv, d)
        scale = kv_cache.scale.reshape(p * ps, ckv).at[
            slot_mapping].set(sc).reshape(p, ps, ckv)
        return QuantKV(data, scale)
    p, ps, ckv, d = kv_cache.shape
    kv = jnp.stack([k, v], axis=2).reshape(k.shape[0], ckv, d)
    if (jax.default_backend() == "tpu"
            and envs.VPQ_ATTENTION_BACKEND != "ref"):
        from vllm_pq_tpu.ops.kv_write_kernel import kv_write_pallas
        return kv_write_pallas(kv_cache, kv, slot_mapping)
    flat = kv_cache.reshape(p * ps, ckv, d)
    flat = flat.at[slot_mapping].set(kv.astype(flat.dtype))
    return flat.reshape(p, ps, ckv, d)


def ref_ragged_paged_attention(
    q: jax.Array,              # [T, num_q_heads, head_dim]
    kv_pages: jax.Array,       # [P, page_size, 2*KVH, D]
    kv_lens: jax.Array,        # i32[S]
    page_indices: jax.Array,   # i32[S, pages_per_seq]
    cu_q_lens: jax.Array,      # i32[S+1]
    num_seqs: jax.Array,       # i32[] or i32[1]
    *,
    sm_scale: float = 1.0,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,  # f32[HQ] (local shard)
    blocksparse: Optional[tuple] = None,
) -> jax.Array:
    """Jittable masked reference. O(S * pages_per_seq * page_size * T)
    memory — fine for tests/CPU, not for production TPU.

    ``blocksparse`` = (block_size, local_blocks, vert_stride,
    head_step): Phi-3-Small's local+vertical-strided block mask
    (reference attention/ops/blocksparse_attention/utils.py
    get_sparse_attn_mask) applied per query head h = g*rep + r."""
    t, hq, d = q.shape
    arr = kv_pages.data if isinstance(kv_pages, QuantKV) else kv_pages
    p, ps, ckv, _ = arr.shape
    kvh = ckv // 2
    s, pages_per_seq = page_indices.shape
    rep = hq // kvh
    num_seqs = jnp.reshape(num_seqs, ())

    # Gather each sequence's pages: [S, pages*ps, CKV, D]
    seq_kv = _gather_pages(kv_pages, page_indices.reshape(-1),
                           q.dtype).reshape(
        s, pages_per_seq * ps, ckv, d)
    k = seq_kv[:, :, 0::2, :]  # [S, L, KVH, D]
    v = seq_kv[:, :, 1::2, :]

    # token -> seq id map [T]
    tok = jnp.arange(t, dtype=jnp.int32)
    seq_of_tok = jnp.sum(
        (tok[None, :] >= cu_q_lens[1:][:, None]).astype(jnp.int32), axis=0)
    seq_of_tok = jnp.minimum(seq_of_tok, s - 1)
    # query position within the full sequence: kv_len - q_len + local_idx
    local = tok - cu_q_lens[seq_of_tok]
    q_lens = cu_q_lens[1:] - cu_q_lens[:-1]
    qpos = kv_lens[seq_of_tok] - q_lens[seq_of_tok] + local  # [T]

    kq = k[seq_of_tok]  # [T, L, KVH, D]
    vq = v[seq_of_tok]

    qf = q.astype(jnp.float32).reshape(t, kvh, rep, d)
    scores = jnp.einsum("tkrd,tlkd->tkrl", qf * sm_scale,
                        kq.astype(jnp.float32))
    if alibi_slopes is not None:
        # bias = slope_h * (col_pos - q_pos): 0 at the query, more
        # negative further back (ALiBi; reference alibi handling in
        # attention backends / csrc paged_attention alibi_slopes)
        lpos_a = jnp.arange(pages_per_seq * ps, dtype=jnp.float32)
        dist = lpos_a[None, :] - qpos[:, None].astype(jnp.float32)
        sl = alibi_slopes.reshape(kvh, rep)
        scores = scores + sl[None, :, :, None] * dist[:, None, None, :]
    if soft_cap is not None:
        scores = jnp.tanh(scores / soft_cap) * soft_cap

    lpos = jnp.arange(pages_per_seq * ps, dtype=jnp.int32)
    valid = (lpos[None, :] <= qpos[:, None]) & \
            (lpos[None, :] < kv_lens[seq_of_tok][:, None])
    if sliding_window is not None:
        valid &= lpos[None, :] > (qpos[:, None] - sliding_window)
    # disable padded tokens/seqs
    valid &= (tok < cu_q_lens[num_seqs])[:, None]
    scores = jnp.where(valid[:, None, None, :], scores, MASK_VALUE)
    if blocksparse is not None:
        bs_sz, local_b, vs, hstep = blocksparse
        qb = qpos // bs_sz                          # [T]
        kb = lpos // bs_sz                          # [L]
        h_idx = (jnp.arange(kvh, dtype=jnp.int32)[:, None] * rep
                 + jnp.arange(rep, dtype=jnp.int32)[None])  # [g, r]
        loc = (qb[:, None] - kb[None]) < local_b    # [T, L]
        vert = ((kb[None, None, None, :]
                 + h_idx[None, :, :, None] * hstep + 1) % vs == 0)
        ok = loc[:, None, None, :] | vert
        scores = jnp.where(ok, scores, MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("tkrl,tlkd->tkrd", probs, vq.astype(jnp.float32))
    return out.reshape(t, hq, d).astype(q.dtype)


def xla_decode_attention(q, kv_pages, kv_lens, page_indices, *,
                         n_pages: int, sm_scale: float = 1.0,
                         sliding_window: Optional[int] = None,
                         soft_cap: Optional[float] = None,
                         alibi_slopes: Optional[jax.Array] = None,
                         blocksparse: Optional[tuple] = None
                         ) -> jax.Array:
    """Pure-XLA decode attention: gather this step's KV pages densely
    and run one batched masked attention.

    Measured on v5e this beats the Pallas decode kernel ~6-7x at
    practical batch/context (the per-invocation Mosaic pipeline cost
    dominates a decode kernel whose per-cell work is tiny; the gather +
    two einsums are HBM-bandwidth-bound, which is the roofline for
    decode attention anyway — the role the reference fills with
    paged_attention v1/v2, csrc/attention/paged_attention_v*.cu).

    ``n_pages`` is STATIC: the bucketed max pages per sequence this
    step. q rows beyond the sequence count are padding (masked rows
    produce garbage that the caller never reads)."""
    s = page_indices.shape[0]
    t, hq, d = q.shape
    arr = kv_pages.data if isinstance(kv_pages, QuantKV) else kv_pages
    ps = arr.shape[1]
    kvh = arr.shape[2] // 2
    rep = hq // kvh
    # q row i is seq i's single query; a token bucket smaller than the
    # row count just means the tail rows are inactive (kv_len 0)
    qs = q[:s] if t >= s else jnp.pad(q, ((0, s - t), (0, 0), (0, 0)))
    pages = _gather_pages(kv_pages, page_indices[:, :n_pages], q.dtype)
    pages = pages.reshape(s, n_pages * ps, 2 * kvh, d)
    k = pages[:, :, 0::2, :]                      # [S, Lk, KVH, D]
    v = pages[:, :, 1::2, :]
    qh = qs.reshape(s, kvh, rep, d)
    scores = jnp.einsum("sgrd,slgd->sgrl",
                        qh.astype(jnp.float32) * sm_scale,
                        k.astype(jnp.float32))
    if alibi_slopes is not None:
        lpos_a = jnp.arange(n_pages * ps, dtype=jnp.float32)
        qpos_a = (kv_lens[:s] - 1).astype(jnp.float32)
        dist = lpos_a[None, :] - qpos_a[:, None]  # [S, L]
        sl = alibi_slopes.reshape(kvh, rep)
        scores = scores + sl[None, :, :, None] * dist[:, None, None, :]
    if soft_cap is not None:
        scores = jnp.tanh(scores / soft_cap) * soft_cap
    pos = jnp.arange(n_pages * ps, dtype=jnp.int32)[None, None, None, :]
    lens = kv_lens[:s, None, None, None]
    mask = pos < lens
    if sliding_window is not None:
        mask &= pos > lens - 1 - sliding_window
    scores = jnp.where(mask, scores, MASK_VALUE)
    if blocksparse is not None:
        bs_sz, local_b, vs, hstep = blocksparse
        qpos_b = (kv_lens[:s] - 1) // bs_sz              # [S]
        kb = jnp.arange(n_pages * ps, dtype=jnp.int32) // bs_sz
        h_idx = (jnp.arange(kvh, dtype=jnp.int32)[:, None] * rep
                 + jnp.arange(rep, dtype=jnp.int32)[None])
        loc = (qpos_b[:, None] - kb[None]) < local_b     # [S, L]
        vert = ((kb[None, None, None, :]
                 + h_idx[None, :, :, None] * hstep + 1) % vs == 0)
        ok = loc[:, None, None, :] | vert
        scores = jnp.where(ok, scores, MASK_VALUE)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("sgrl,slgd->sgrd", p.astype(v.dtype), v)
    out = out.reshape(s, hq, d)
    if t > s:
        out = jnp.pad(out, ((0, t - s), (0, 0), (0, 0)))
    elif t < s:
        out = out[:t]
    return out


def write_latent_cache(cache: jax.Array, c: jax.Array,
                       slot_mapping: jax.Array) -> jax.Array:
    """Scatter per-token MLA latents into the paged latent cache.

    cache [P, page_size, D_lat]; c [T, D_lat] (normalized c_kv | roped
    k_pe); padding slots point into null page 0 (see write_kv_cache).
    One row per token — the whole point of MLA: the cache holds the
    compressed latent, not per-head K/V (role of the reference's
    concat_and_cache_mla, csrc/cache_kernels.cu:308)."""
    p, ps, d = cache.shape
    flat = cache.reshape(p * ps, d)
    flat = flat.at[slot_mapping].set(c.astype(flat.dtype))
    return flat.reshape(p, ps, d)


def mla_ragged_paged_attention(
    q: jax.Array,              # [T, H, D_lat] (absorbed q | q_pe)
    cache: jax.Array,          # [P, page_size, D_lat]
    kv_lens: jax.Array,        # i32[S]
    page_indices: jax.Array,   # i32[S, pages_per_seq]
    cu_q_lens: jax.Array,      # i32[S+1]
    num_seqs: jax.Array,       # i32[] or i32[1]
    *,
    v_dim: int,                # value = first v_dim dims of the latent
    sm_scale: float = 1.0,
    decode_mode: bool = False,
    decode_pages: Optional[int] = None,
) -> jax.Array:
    """MLA attention over the latent cache (absorbed-weights execution,
    role of the reference triton_mla/flashmla backends).

    Multi-query attention: every q head attends to the SAME single
    latent stream; scores use the full latent row (c_kv | k_pe), the
    value is its first ``v_dim`` dims (c_kv). Returns [T, H, v_dim] —
    the caller up-projects with the absorbed W_UV."""
    t, hq, d = q.shape
    p, ps, _ = cache.shape
    s, pages_per_seq = page_indices.shape
    num_seqs = jnp.reshape(num_seqs, ())

    if decode_mode:
        n_pages = decode_pages or pages_per_seq
        qs = q[:s] if t >= s else jnp.pad(q, ((0, s - t), (0, 0), (0, 0)))
        pages = jnp.take(cache, page_indices[:, :n_pages], axis=0)
        k = pages.reshape(s, n_pages * ps, d)           # [S, L, D]
        scores = jnp.einsum("shd,sld->shl",
                            qs.astype(jnp.float32) * sm_scale,
                            k.astype(jnp.float32))
        pos = jnp.arange(n_pages * ps, dtype=jnp.int32)[None, None, :]
        mask = pos < kv_lens[:s, None, None]
        scores = jnp.where(mask, scores, MASK_VALUE)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("shl,sld->shd", probs.astype(k.dtype),
                         k[..., :v_dim])
        if t > s:
            out = jnp.pad(out, ((0, t - s), (0, 0), (0, 0)))
        elif t < s:
            out = out[:t]
        return out.astype(q.dtype)

    # ragged mixed prefill+decode (masked XLA reference shape)
    seq_kv = cache[page_indices.reshape(-1)].reshape(
        s, pages_per_seq * ps, d)
    tok = jnp.arange(t, dtype=jnp.int32)
    seq_of_tok = jnp.sum(
        (tok[None, :] >= cu_q_lens[1:][:, None]).astype(jnp.int32), axis=0)
    seq_of_tok = jnp.minimum(seq_of_tok, s - 1)
    local = tok - cu_q_lens[seq_of_tok]
    q_lens = cu_q_lens[1:] - cu_q_lens[:-1]
    qpos = kv_lens[seq_of_tok] - q_lens[seq_of_tok] + local
    kq = seq_kv[seq_of_tok]                             # [T, L, D]
    scores = jnp.einsum("thd,tld->thl", q.astype(jnp.float32) * sm_scale,
                        kq.astype(jnp.float32))
    lpos = jnp.arange(pages_per_seq * ps, dtype=jnp.int32)
    valid = (lpos[None, :] <= qpos[:, None]) & \
            (lpos[None, :] < kv_lens[seq_of_tok][:, None])
    valid &= (tok < cu_q_lens[num_seqs])[:, None]
    scores = jnp.where(valid[:, None, :], scores, MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("thl,tld->thd", probs, kq[..., :v_dim]
                     .astype(jnp.float32))
    return out.astype(q.dtype)


def ragged_paged_attention(q, kv_pages, kv_lens, page_indices, cu_q_lens,
                           num_seqs, *, sm_scale: float = 1.0,
                           sliding_window: Optional[int] = None,
                           soft_cap: Optional[float] = None,
                           decode_mode: bool = False,
                           decode_pages: Optional[int] = None,
                           alibi_slopes: Optional[jax.Array] = None,
                           spec_md: Optional[dict] = None,
                           blocksparse: Optional[tuple] = None
                           ) -> jax.Array:
    """Dispatch to the best implementation for the current device.

    ``decode_mode`` (static): every sequence has exactly one query token
    at flat position == its row index; uses the gather-based XLA decode
    path (``decode_pages`` = static bucketed max pages per sequence).

    ``spec_md``: speculative decode-window metadata (q_pos / ring_pos /
    ring_valid / base_lens) — each row contributes Q queries per
    iteration; only the arena path supports it."""
    from vllm_pq_tpu.ops.window_attention import (WindowCache,
                                                  window_attention,
                                                  window_attention_spec)
    if isinstance(kv_pages, WindowCache):
        if spec_md is not None:
            assert alibi_slopes is None, \
                "spec decode windows do not compose with ALiBi"
            return window_attention_spec(
                q, kv_pages, spec_md, sm_scale=sm_scale,
                sliding_window=sliding_window, soft_cap=soft_cap)
        # decode-window arena path: row i's kv length at window start =
        # current kv_len minus the ring tokens written so far
        base_lens = kv_lens - (kv_pages.step + 1)
        return window_attention(
            q, kv_pages, base_lens, sm_scale=sm_scale,
            sliding_window=sliding_window, soft_cap=soft_cap,
            alibi_slopes=alibi_slopes)
    backend = envs.VPQ_ATTENTION_BACKEND
    on_tpu = jax.default_backend() == "tpu"
    # the Pallas kernels' lane packing supports head_dim 64/128; other
    # dims (e.g. DeepSeek MLA's 192) take the XLA paths. Int8 KV
    # dequant is fused into the XLA gather paths only.
    kernel_ok = (q.shape[-1] in (64, 128)
                 and not isinstance(kv_pages, QuantKV)
                 and blocksparse is None)
    if decode_mode and (not kernel_ok or alibi_slopes is not None):
        return xla_decode_attention(
            q, kv_pages, kv_lens, page_indices,
            n_pages=decode_pages or page_indices.shape[1],
            sm_scale=sm_scale, sliding_window=sliding_window,
            soft_cap=soft_cap, alibi_slopes=alibi_slopes,
            blocksparse=blocksparse)
    if not kernel_ok and backend != "ref":
        backend = "ref"
    # decode dispatch: the XLA gather path IS the decode default. On
    # v5e (round-2 microbench, benchmarks/microbench.py) the 22-layer
    # decode chain at batch 256/ctx 128 measures 1.42 ms (1.6x the KV
    # HBM roofline) vs 16.9 ms for the per-page-DMA Pallas kernel —
    # Mosaic's per-page async-copy issue cost dominates a decode cell
    # whose compute is tiny, exactly the failure mode VERDICT.md #2
    # called out. (Round 1 kept the Pallas kernel based on an in-context
    # comparison that turned out to be mismeasured: under the tunneled
    # runtime block_until_ready returns at enqueue time, so short
    # benchmarks measured dispatch rate, not execution.) The Pallas
    # decode kernel stays as VPQ_ATTENTION_BACKEND=pallas for A/B.
    if decode_mode and backend != "pallas":
        return xla_decode_attention(
            q, kv_pages, kv_lens, page_indices,
            n_pages=decode_pages or page_indices.shape[1],
            sm_scale=sm_scale, sliding_window=sliding_window,
            soft_cap=soft_cap, blocksparse=blocksparse)
    if backend == "ref" or (not on_tpu and backend != "pallas") \
            or blocksparse is not None:
        return ref_ragged_paged_attention(
            q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
            sm_scale=sm_scale, sliding_window=sliding_window,
            soft_cap=soft_cap, alibi_slopes=alibi_slopes,
            blocksparse=blocksparse)
    from vllm_pq_tpu.ops.rpa_kernel import ragged_paged_attention_pallas
    if alibi_slopes is not None:
        alibi_slopes = jnp.asarray(alibi_slopes, jnp.float32)
    return ragged_paged_attention_pallas(
        q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
        sm_scale=sm_scale, sliding_window=sliding_window,
        soft_cap=soft_cap, decode_mode=decode_mode,
        alibi_slopes=alibi_slopes)
