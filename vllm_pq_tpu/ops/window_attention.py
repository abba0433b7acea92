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
    aK: jax.Array      # [S, KVH, CTX, D] dense arena keys (immutable;
    #                    int8 when the paged pool is int8 — the arena
    #                    streams HALF the bytes per step, the dominant
    #                    decode-window bandwidth term). Head-major so a
    #                    Pallas (row, head, ctx-tile) block is one
    #                    contiguous DMA run per head (ops/arena_kernel).
    aV: jax.Array      # [S, KVH, CTX, D]
    aKs: jax.Array     # f32 [S, KVH, CTX] arena K scales ([S,KVH,0]
    #                    when bf16: the scale factors out of the dot
    #                    product exactly, so int8 arenas are as exact
    #                    as the int8 pool itself)
    aVs: jax.Array     # f32 [S, KVH, CTX]
    sK: jax.Array      # [Ls, KVH, D] SHARED-prefix keys (cascade role:
    sV: jax.Array      #   stored and read once for the whole batch)
    sKs: jax.Array     # f32 [Ls, KVH] ([0, KVH] when bf16)
    sVs: jax.Array     # f32 [Ls, KVH]
    ringK: jax.Array   # [N, S, KVH, D] this window's appended keys
    ringV: jax.Array   # [N, S, KVH, D] (always bf16: ~MBs, bandwidth-
    #                    irrelevant, and the fold consumes them as-is)
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
    int8 = isinstance(kv_cache, QuantKV)
    arr = kv_cache.data if int8 else kv_cache
    s = page_indices.shape[0]
    ps = arr.shape[1]
    kvh = arr.shape[2] // 2
    d = arr.shape[3]
    sh = jnp.bfloat16 if int8 else arr.dtype

    def raw_gather(idx):
        """(data, scales) gathered WITHOUT dequantizing: an int8 arena
        streams half the bytes every iteration; the scales ride as
        separate f32 planes (1/128 the data size)."""
        if int8:
            dd = jnp.take(kv_cache.data, idx, axis=0, mode="clip")
            sc = jnp.take(kv_cache.scale, idx, axis=0, mode="clip")
            return dd, sc
        return jnp.take(kv_cache, idx, axis=0, mode="clip"), None

    if shared_pages:
        sp, ss = raw_gather(page_indices[0, :shared_pages])
        sp = sp.reshape(shared_pages * ps, 2 * kvh, d)
        sK, sV = sp[:, 0::2, :], sp[:, 1::2, :]
        if int8:
            ss = ss.reshape(shared_pages * ps, 2 * kvh)
            sKs, sVs = ss[:, 0::2], ss[:, 1::2]
        else:
            sKs = jnp.zeros((0, kvh), jnp.float32)
            sVs = jnp.zeros((0, kvh), jnp.float32)
    else:
        kdt = jnp.int8 if int8 else sh
        sK = jnp.zeros((0, kvh, d), kdt)
        sV = jnp.zeros((0, kvh, d), kdt)
        sKs = jnp.zeros((0, kvh), jnp.float32)
        sVs = jnp.zeros((0, kvh), jnp.float32)
    pages, pscl = raw_gather(
        page_indices[:, shared_pages:shared_pages + n_pages])
    pages = pages.reshape(s, n_pages * ps, 2 * kvh, d)
    # packed arena: one head's K and V share a 128-lane group
    # ([S, KVH, CTX, 2D]; the page layout interleaves K_h/V_h in dim 2,
    # so the pairing is a free reshape). Mosaic pads D=64 slices to 128
    # lanes, which would DOUBLE the arena's HBM bytes — packing streams
    # K and V compactly in ONE tile and the kernel slices V's lanes for
    # the P@V contraction (same trick as ops/rpa_kernel.py head
    # packing). Only the Pallas packed kernel consumes this layout.
    import vllm_pq_tpu.envs as envs2
    packed = (envs2.VPQ_ARENA_KERNEL == "2" and 2 * d == 128
              and shared_pages == 0)
    if packed:
        aK = pages.reshape(s, n_pages * ps, kvh, 2 * d) \
            .transpose(0, 2, 1, 3)
        aV = jnp.zeros((s, kvh, 0, 2 * d), pages.dtype)
    else:
        # head-major arena [S, KVH, CTX, D]: the relayout is paid once
        # per window; every iteration's attention then streams
        # contiguous (ctx, d) runs per head
        aK = pages[:, :, 0::2, :].transpose(0, 2, 1, 3)
        aV = pages[:, :, 1::2, :].transpose(0, 2, 1, 3)
    if int8:
        pscl = pscl.reshape(s, n_pages * ps, 2 * kvh)
        aKs = pscl[:, :, 0::2].transpose(0, 2, 1)
        aVs = pscl[:, :, 1::2].transpose(0, 2, 1)
    else:
        aKs = jnp.zeros((s, kvh, 0), jnp.float32)
        aVs = jnp.zeros((s, kvh, 0), jnp.float32)
    ring_shape = (ring_n, s, kvh, d)
    return WindowCache(
        aK=aK, aV=aV, aKs=aKs, aVs=aVs, sK=sK, sV=sV, sKs=sKs, sVs=sVs,
        ringK=jnp.zeros(ring_shape, sh),
        ringV=jnp.zeros(ring_shape, sh),
        step=jnp.int32(-1))


def append_ring(wc: WindowCache, k: jax.Array, v: jax.Array) -> WindowCache:
    """Append this iteration's K/V rows to the ring.

    k/v [S, KVH, D] appends ONE ring entry (plain decode windows);
    [S*Q, KVH, D] (flat row r*Q+j = row r's query j, the speculative
    window layout) appends Q entries at once — entry slots step+1 ..
    step+Q hold the row-major [Q, S, KVH, D] transpose."""
    s = wc.aK.shape[0]
    t = k.shape[0]
    q_per = t // s
    if q_per > 1:
        kq = k.reshape(s, q_per, *k.shape[1:]).swapaxes(0, 1)
        vq = v.reshape(s, q_per, *v.shape[1:]).swapaxes(0, 1)
    else:
        kq, vq = k[None], v[None]
    j = wc.step + 1
    ringK = jax.lax.dynamic_update_slice(
        wc.ringK, kq.astype(wc.ringK.dtype), (j, 0, 0, 0))
    ringV = jax.lax.dynamic_update_slice(
        wc.ringV, vq.astype(wc.ringV.dtype), (j, 0, 0, 0))
    return WindowCache(aK=wc.aK, aV=wc.aV, aKs=wc.aKs, aVs=wc.aVs,
                       sK=wc.sK, sV=wc.sV, sKs=wc.sKs, sVs=wc.sVs,
                       ringK=ringK, ringV=ringV, step=j + q_per - 1)


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
    s, kvh, ctx, d = wc.aK.shape
    n = wc.ringK.shape[0]
    ls = wc.sK.shape[0]            # shared-prefix length (cascade)
    int8 = wc.aK.dtype == jnp.int8
    t = q.shape[0]
    qs = q[:s] if t >= s else jnp.pad(q, ((0, s - t), (0, 0), (0, 0)))
    hq = qs.shape[1]
    rep = hq // kvh

    # Pallas flash kernel (ops/arena_kernel.py), VPQ_ARENA_KERNEL=1
    # only: on v5e the XLA einsum path over the head-major arena
    # measures AT the KV roofline (bf16 1.45 ms vs 1.80 roofline, int8
    # 1.01 vs 0.96 for the 22-layer batch-256 ctx-256 chain —
    # benchmarks/microbench.py arena, round 4), while the Pallas kernel
    # measures 3.1 ms: Mosaic lowers the tiny per-(row, head) GQA dots
    # as a serial matmul loop. The kernel is kept for A/B and for its
    # per-row tile clamp (ragged batches skip dead context tiles).
    import vllm_pq_tpu.envs as envs
    mode = envs.VPQ_ARENA_KERNEL
    if wc.aV.shape[2] == 0 and wc.aK.shape[-1] == 2 * q.shape[2]:
        # lane-packed arena (build_window_cache VPQ_ARENA_KERNEL=2):
        # only the packed kernel can consume it
        from vllm_pq_tpu.ops.arena_kernel import arena_attention_packed
        out = arena_attention_packed(
            qs, wc.aK, wc.aKs if int8 else None,
            wc.aVs if int8 else None,
            wc.ringK.astype(qs.dtype), wc.ringV.astype(qs.dtype),
            base_lens[:s], wc.step, sm_scale=sm_scale,
            sliding_window=sliding_window,
            interpret=jax.default_backend() != "tpu")
        if t > s:
            out = jnp.pad(out, ((0, t - s), (0, 0), (0, 0)))
        elif t < s:
            out = out[:t]
        return out
    use_kernel = (
        mode == "1" and ls == 0 and alibi_slopes is None
        and soft_cap is None and d in (64, 128))
    if use_kernel:
        from vllm_pq_tpu.ops.arena_kernel import arena_attention_pallas
        ring = wc.ringK.astype(qs.dtype)
        out = arena_attention_pallas(
            qs, wc.aK, wc.aV, wc.aKs if int8 else None,
            wc.aVs if int8 else None, ring,
            wc.ringV.astype(qs.dtype), base_lens[:s], wc.step,
            sm_scale=sm_scale, sliding_window=sliding_window,
            interpret=jax.default_backend() != "tpu")
        if t > s:
            out = jnp.pad(out, ((0, t - s), (0, 0), (0, 0)))
        elif t < s:
            out = out[:t]
        return out

    qh = qs.reshape(s, kvh, rep, d)
    qscaled = qh * jnp.asarray(sm_scale, qh.dtype)

    aK = wc.aK.astype(qscaled.dtype) if int8 else wc.aK
    sc_a = jnp.einsum("sgrd,sgld->sgrl", qscaled, aK,
                      preferred_element_type=jnp.float32)
    if int8:
        # per-(row, col, head) scale factors OUT of the dot product:
        # int8 arena scoring is exact w.r.t. the int8 pool contents
        sc_a = sc_a * wc.aKs[:, :, None, :]
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
    sc_s = None
    if ls:
        # shared prefix scored against ONE stored copy (the whole
        # point: its KV is read once for the batch, not per row)
        sK = wc.sK.astype(qscaled.dtype) if int8 else wc.sK
        sc_s = jnp.einsum("sgrd,lgd->sgrl", qscaled, sK,
                          preferred_element_type=jnp.float32)
        if int8:
            sc_s = sc_s * wc.sKs.T[None, :, None, :]
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

    # segmented softmax: normalize each segment against the GLOBAL max
    # and a shared denominator instead of concatenating the score
    # tensors (the concat materialized ~1 ms/step of pure copies at
    # batch 256 — profiler round 3)
    segs = ([sc_s] if sc_s is not None else []) + [sc_a, sc_r]
    gmax = segs[0].max(axis=-1)
    for sg in segs[1:]:
        gmax = jnp.maximum(gmax, sg.max(axis=-1))
    gmax = gmax[..., None]
    exps = [jnp.exp(sg - gmax) for sg in segs]
    denom = sum(e.sum(axis=-1) for e in exps)[..., None]
    if sc_s is not None:
        ess, ea, er = exps
    else:
        ea, er = exps
        ess = None
    vdt = jnp.bfloat16 if int8 else wc.aV.dtype
    # division DEFERRED past the V contractions: out/denom on the
    # [s,g,r,d] result divides 4x fewer elements than normalizing the
    # [s,g,r,l] probabilities, and drops one full-size f32 pass over
    # the score tensor (VERDICT r4 weak #8)
    pa = ea
    pr = er
    if int8:
        # fold the V scales into the (small) probability tensor so the
        # big arena V streams raw int8
        pa = pa * wc.aVs[:, :, None, :]
    out = jnp.einsum("sgrl,sgld->sgrd", pa.astype(vdt),
                     wc.aV.astype(vdt) if int8 else wc.aV,
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("sgrn,nsgd->sgrd", pr.astype(wc.ringV.dtype),
                           wc.ringV, preferred_element_type=jnp.float32)
    if ess is not None:
        pss = ess
        if int8:
            pss = pss * wc.sVs.T[None, :, None, :]
        out = out + jnp.einsum("sgrl,lgd->sgrd", pss.astype(vdt),
                               wc.sV.astype(vdt) if int8 else wc.sV,
                               preferred_element_type=jnp.float32)
    out = (out / denom).reshape(s, hq, d).astype(q.dtype)
    if t > s:
        out = jnp.pad(out, ((0, t - s), (0, 0), (0, 0)))
    elif t < s:
        out = out[:t]
    return out


def window_attention_spec(q: jax.Array, wc: WindowCache, spec_md: dict,
                          *, sm_scale: float,
                          sliding_window: Optional[int] = None,
                          soft_cap: Optional[float] = None) -> jax.Array:
    """Multi-query arena attention for SPECULATIVE decode windows.

    Each sequence contributes Q = 1 + num_spec_tokens queries per window
    iteration (the last committed token + the drafts); flat row r*Q+j is
    row r's query j. Unlike the plain window, ring entries cannot be
    masked by slot index alone: rejected drafts leave stale entries
    whose positions later iterations REWRITE at new slots, so validity
    and positions ride in ``spec_md`` (carried by the window body):

      q_pos      i32[S, Q]  absolute position of each query token
      ring_pos   i32[S, N]  absolute position each ring entry holds
      ring_valid bool[S, N] entry is live (accepted, or the current
                            iteration's not-yet-verified entries)
      base_lens  i32[S]     arena-valid prefix length (window start)

    A ring entry is visible to a query iff it is valid AND its position
    <= the query's position (so draft j sees drafts < j of the same
    iteration, and stale rejected entries are never visible). The score
    einsums are the plain window's with the fused (Q, rep) head dim —
    same MXU shapes, masks reshaped per query. Reference analog: spec
    tokens scheduled through the one V1 loop
    (vllm/v1/core/sched/scheduler.py) with FlashAttention handling the
    multi-token query window."""
    s, kvh, ctx, d = wc.aK.shape
    n = wc.ringK.shape[0]
    ls = wc.sK.shape[0]
    int8 = wc.aK.dtype == jnp.int8
    t = q.shape[0]
    nq = spec_md["q_pos"].shape[1]
    assert t == s * nq, (t, s, nq)
    hq = q.shape[1]
    rep = hq // kvh

    qh = q.reshape(s, nq, kvh, rep, d).transpose(0, 2, 1, 3, 4)
    qscaled = qh * jnp.asarray(sm_scale, qh.dtype)   # [s, g, Q, r, d]

    q_pos = spec_md["q_pos"]                          # [s, Q]
    ring_pos = spec_md["ring_pos"]                    # [s, N]
    ring_valid = spec_md["ring_valid"]                # [s, N]
    base_lens = spec_md["base_lens"]                  # [s]

    aK = wc.aK.astype(qscaled.dtype) if int8 else wc.aK
    sc_a = jnp.einsum("sgqrd,sgld->sgqrl", qscaled, aK,
                      preferred_element_type=jnp.float32)
    if int8:
        sc_a = sc_a * wc.aKs[:, :, None, None, :]
    ring = wc.ringK.astype(qscaled.dtype)
    sc_r = jnp.einsum("sgqrd,nsgd->sgqrn", qscaled, ring,
                      preferred_element_type=jnp.float32)

    apos = ls + jnp.arange(ctx, dtype=jnp.int32)[None, :]
    valid_a = (apos < base_lens[:, None])[:, None, :]      # [s, 1, l]
    valid_a = jnp.broadcast_to(valid_a, (s, nq, ctx))
    valid_r = (ring_valid[:, None, :]
               & (ring_pos[:, None, :] <= q_pos[:, :, None]))  # [s,Q,n]
    if sliding_window is not None:
        valid_a = valid_a & (apos[:, None] > q_pos[:, :, None]
                             - sliding_window)
        valid_r = valid_r & (ring_pos[:, None, :] > q_pos[:, :, None]
                             - sliding_window)
    if soft_cap is not None:
        sc_a = jnp.tanh(sc_a / soft_cap) * soft_cap
        sc_r = jnp.tanh(sc_r / soft_cap) * soft_cap
    sc_a = jnp.where(valid_a[:, None, :, None, :], sc_a, MASK_VALUE)
    sc_r = jnp.where(valid_r[:, None, :, None, :], sc_r, MASK_VALUE)

    sc_s = None
    if ls:
        sK = wc.sK.astype(qscaled.dtype) if int8 else wc.sK
        sc_s = jnp.einsum("sgqrd,lgd->sgqrl", qscaled, sK,
                          preferred_element_type=jnp.float32)
        if int8:
            sc_s = sc_s * wc.sKs.T[None, :, None, None, :]
        spos = jnp.arange(ls, dtype=jnp.int32)[None, :]
        valid_s = (spos < jnp.minimum(base_lens[:, None], ls))[:, None]
        valid_s = jnp.broadcast_to(valid_s, (s, nq, ls))
        if sliding_window is not None:
            valid_s = valid_s & (spos[:, None] > q_pos[:, :, None]
                                 - sliding_window)
        if soft_cap is not None:
            sc_s = jnp.tanh(sc_s / soft_cap) * soft_cap
        sc_s = jnp.where(valid_s[:, None, :, None, :], sc_s, MASK_VALUE)

    segs = ([sc_s] if sc_s is not None else []) + [sc_a, sc_r]
    gmax = segs[0].max(axis=-1)
    for sg in segs[1:]:
        gmax = jnp.maximum(gmax, sg.max(axis=-1))
    gmax = gmax[..., None]
    exps = [jnp.exp(sg - gmax) for sg in segs]
    denom = sum(e.sum(axis=-1) for e in exps)[..., None]
    if sc_s is not None:
        ess, ea, er = exps
    else:
        ea, er = exps
        ess = None
    vdt = jnp.bfloat16 if int8 else wc.aV.dtype
    # division deferred past the V contractions (see window_attention)
    pa = ea
    pr = er
    if int8:
        pa = pa * wc.aVs[:, :, None, None, :]
    out = jnp.einsum("sgqrl,sgld->sgqrd", pa.astype(vdt),
                     wc.aV.astype(vdt) if int8 else wc.aV,
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("sgqrn,nsgd->sgqrd",
                           pr.astype(wc.ringV.dtype), wc.ringV,
                           preferred_element_type=jnp.float32)
    if ess is not None:
        pss = ess
        if int8:
            pss = pss * wc.sVs.T[None, :, None, None, :]
        out = out + jnp.einsum("sgqrl,lgd->sgqrd", pss.astype(vdt),
                               wc.sV.astype(vdt) if int8 else wc.sV,
                               preferred_element_type=jnp.float32)
    out = out / denom
    # [s, g, Q, r, d] -> flat [s*Q, hq, d]
    out = out.transpose(0, 2, 1, 3, 4).reshape(t, hq, d)
    return out.astype(q.dtype)
