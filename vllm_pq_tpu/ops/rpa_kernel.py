"""Ragged paged attention — own Pallas TPU kernel.

One kernel handles mixed prefill+decode batches (the V1 design point;
role of the reference's ``torch.ops.xla.ragged_paged_attention``,
``v1/attention/backends/pallas.py:161-172``, rebuilt from scratch):

- grid = global query blocks of ``num_queries_per_block`` tokens; a block
  may span several sequences (decode-heavy batches put many seqs in one
  block); an inner dynamic loop visits each sequence overlapping the
  block with row masks;
- per sequence, a flash-attention (online softmax) loop walks its KV
  pages in blocks of ``num_kv_pages_per_block``, each block DMA'd
  HBM->VMEM with double buffering so the copy of block i+1 overlaps the
  compute of block i (decode attention is DMA-bound; this is the
  speed-of-light path);
- KV heads are a static python loop; per-head flash state lives in VMEM
  scratch.

KV layout: ``[num_pages, page_size, 2*num_kv_heads, head_dim]``, K even /
V odd — see ``ops/attention.py``.

Head dims below 128 (e.g. 64 for TinyLlama/Llama-2-7B-ish models) cannot
be DMA'd as HBM lane slices (Mosaic requires 128-aligned last-dim
slices). For ``head_dim * pack == 128`` the page layout is viewed as
``[P, ps, 2*KVH/pack, 128]`` — K/V of one head already share a 128-lane
group, so this is a free reshape — q is zero-padded into the K lanes,
and the score/PV matmuls run on full 128-wide tiles (which the MXU pads
to anyway; no extra FLOP cost). The V half of the accumulator is
extracted once per sequence in the epilogue. The reference's torch_xla
kernel simply forbids these models (``v1/attention/backends/pallas.py:
98-110`` requires head_size % 128); supporting them is deliberate.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_pq_tpu.utils import cdiv

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _rpa_kernel(
    # scalar prefetch
    kv_lens_ref,        # i32[S]
    page_indices_ref,   # i32[S * pages_per_seq]
    cu_q_lens_ref,      # i32[S+1]
    seq_range_ref,      # i32[2 * n_q_blks]: (first_seq, last_seq+1) per blk
    *args,
    sm_scale: float,
    num_kv_heads: int,
    rep: int,
    tile_q: int,
    page_size: int,
    pages_per_blk: int,
    pages_per_seq: int,
    head_dim: int,
    pack: int,          # heads-per-128-lane-group packing (1 if D%128==0)
    sliding_window: Optional[int],
    soft_cap: Optional[float],
    use_alibi: bool = False,
):
    # optional 5th prefetch arg: ALiBi slopes (f32 bitcast to i32 —
    # scalar prefetch is integer-typed)
    if use_alibi:
        alibi_ref, args = args[0], args[1:]
    (q_ref,              # [TQ, HQ, D] VMEM (block)
     kv_hbm_ref,         # [P, ps, 2*KVH, D] HBM (full)
     out_ref,            # [TQ, HQ, D] VMEM (block)
     kv_buf,             # [2, ps*ppb, C, LANES] VMEM
     acc_ref,            # [KVH, TQ*rep, LANES] f32
     m_ref,              # [KVH, TQ*rep, 128] f32 (max, col-bcast)
     l_ref,              # [KVH, TQ*rep, 128] f32 (denominator)
     sems,               # DMA sems [2]
     ) = args
    blk = pl.program_id(0)
    q_blk_start = blk * tile_q
    first_seq = seq_range_ref[2 * blk]
    end_seq = seq_range_ref[2 * blk + 1]
    kv_blk_len = page_size * pages_per_blk

    def _page_copy(s, kv_blk_idx, slot, i):
        # one shared semaphore per slot (waited once per page): hardware
        # DMA semaphores are a scarce per-program resource and multi-step
        # graphs instantiate this kernel dozens of times
        pidx = page_indices_ref[s * pages_per_seq +
                                kv_blk_idx * pages_per_blk + i]
        return pltpu.make_async_copy(
            kv_hbm_ref.at[pidx],
            kv_buf.at[slot, pl.ds(i * page_size, page_size)],
            sems.at[slot],
        )

    def kv_dma(s, kv_blk_idx, slot):
        """DMA pages [kv_blk_idx*ppb, ...) of sequence s into kv_buf[slot]."""
        for i in range(pages_per_blk):
            _page_copy(s, kv_blk_idx, slot, i).start()

    def kv_wait(s, kv_blk_idx, slot):
        for i in range(pages_per_blk):
            _page_copy(s, kv_blk_idx, slot, i).wait()

    def n_blks(s):
        return pl.cdiv(kv_lens_ref[s], kv_blk_len)

    def next_item(s, i):
        """Linearized (seq, kv_block) successor. Every seq in
        [first_seq, end_seq) has >= 1 q row hence >= 1 kv block."""
        last_of_seq = i + 1 >= n_blks(s)
        s2 = jnp.where(last_of_seq, s + 1, s)
        i2 = jnp.where(last_of_seq, 0, i + 1)
        return s2, i2

    def compute_item(s, kv_i, slot):
        """One (seq, kv-block) flash-attention step; decode batches are
        DMA-latency-bound, so the NEXT item's DMA was already started
        before this is called (cross-sequence software pipelining — the
        reason this loop is linearized rather than nested per-seq)."""
        q_start = cu_q_lens_ref[s]
        q_end = cu_q_lens_ref[s + 1]
        kv_len = kv_lens_ref[s]
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (tile_q * rep, 1), 0) // rep + q_blk_start
        row_valid = (row_ids >= q_start) & (row_ids < q_end)
        qpos = kv_len - (q_end - q_start) + (row_ids - q_start)

        @pl.when(kv_i == 0)
        def _():  # new sequence: reset flash state
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, MASK_VALUE)
            l_ref[:] = jnp.zeros_like(l_ref)

        col_base = kv_i * kv_blk_len
        col_ids = col_base + jax.lax.broadcasted_iota(
            jnp.int32, (1, kv_blk_len), 1)  # [1, L]
        mask = (col_ids < kv_len) & (col_ids <= qpos) & row_valid
        if sliding_window is not None:
            mask &= col_ids > (qpos - sliding_window)

        for h in range(num_kv_heads):
            # q rows for this head group: [TQ, rep, D|128] ->
            # [TQ*rep, D|128] (pack>1: q pre-padded into the K lanes)
            qh = q_ref[:, h * rep:(h + 1) * rep, :].reshape(
                tile_q * rep, -1)
            if pack == 1:
                k = kv_buf[slot, :, 2 * h, :]      # [L, D]
                v = kv_buf[slot, :, 2 * h + 1, :]  # [L, D]
            else:
                # packed: one [L, 128] tile holds this head's K and V
                # lanes; zero q-lanes cancel the V columns in scores.
                k = kv_buf[slot, :, (2 * h * head_dim) // 128, :]
                v = k
            scores = jax.lax.dot_general(
                qh.astype(jnp.float32) * sm_scale,
                k.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [TQ*rep, L]
            if use_alibi:
                sl = jax.lax.bitcast_convert_type(
                    alibi_ref[h * rep:(h + 1) * rep], jnp.float32)
                slope_row = jnp.tile(sl, tile_q)[:, None]  # [TQ*rep, 1]
                scores = scores + slope_row * (
                    col_ids - qpos).astype(jnp.float32)
            if soft_cap is not None:
                scores = jnp.tanh(scores / soft_cap) * soft_cap
            scores = jnp.where(mask, scores, MASK_VALUE)

            m_prev = m_ref[h, :, 0:1]                  # [R,1]
            m_cur = jnp.max(scores, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)            # [R,1]
            p = jnp.exp(scores - m_new)                # [R,L]
            p = jnp.where(mask, p, 0.0)
            l_new = l_ref[h, :, 0:1] * alpha + jnp.sum(
                p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [R,D]
            acc_ref[h] = acc_ref[h] * alpha + pv
            m_ref[h] = jnp.broadcast_to(m_new, m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(l_new, l_ref.shape[1:])

        @pl.when(kv_i + 1 >= n_blks(s))
        def _():  # last block: finalize and write this seq's rows
            for h in range(num_kv_heads):
                l = l_ref[h, :, 0:1]
                res = acc_ref[h] / jnp.where(l == 0.0, 1.0, l)
                if pack > 1:
                    off_v = ((2 * h + 1) * head_dim) % 128
                    res = res[:, off_v:off_v + head_dim]
                res = res.reshape(tile_q, rep, -1).astype(out_ref.dtype)
                rv = row_valid.reshape(tile_q, rep, 1)
                cur = out_ref[:, h * rep:(h + 1) * rep, :]
                out_ref[:, h * rep:(h + 1) * rep, :] = jnp.where(
                    rv, res, cur)

    @pl.when(first_seq < end_seq)
    def _():
        kv_dma(first_seq, 0, 0)

        def cond(carry):
            s, i, slot = carry
            return s < end_seq

        def body(carry):
            s, i, slot = carry
            s2, i2 = next_item(s, i)

            @pl.when(s2 < end_seq)
            def _():  # prefetch the next item into the other slot
                kv_dma(s2, i2, 1 - slot)

            kv_wait(s, i, slot)
            compute_item(s, i, slot)
            return (s2, i2, 1 - slot)

        jax.lax.while_loop(cond, body, (first_seq, jnp.int32(0),
                                        jnp.int32(0)))


def _rpa_decode_kernel(
    # scalar prefetch
    kv_lens_ref,        # i32[S]
    page_indices_ref,   # i32[S * pages_per_seq]
    # inputs
    q_ref,              # [seqs_per_blk, HQ, LANES] VMEM (block)
    kv_hbm_ref,         # [P, ps, C, LANES] HBM (full)
    # outputs
    out_ref,            # [seqs_per_blk, HQ, D] VMEM (block)
    # scratch
    kv_buf,             # [2, spb*ps*ppb, C, LANES] VMEM
    acc_ref,            # [KVH, spb*rep, LANES] f32
    m_ref,              # [KVH, spb*rep, 128] f32
    l_ref,              # [KVH, spb*rep, 128] f32
    sems,               # DMA sems [2]
    *,
    sm_scale: float,
    num_kv_heads: int,
    rep: int,
    seqs_per_blk: int,
    page_size: int,
    pages_per_blk: int,
    pages_per_seq: int,
    head_dim: int,
    pack: int,
    sliding_window,
    soft_cap,
):
    """Decode-only variant: every sequence has exactly ONE query token.

    All ``seqs_per_blk`` sequences' kv blocks are DMA'd together and
    attended in ONE block-diagonal matmul per head: rows are grouped by
    sequence and a (row_seq == col_seq) mask kills the cross-sequence
    blocks. This trades seqs_per_blk x extra MXU flops (idle at decode
    anyway) for seqs_per_blk x fewer serialized DMA-wait/compute items —
    decode attention is item-overhead-bound, not FLOP-bound."""
    blk = pl.program_id(0)
    base_seq = blk * seqs_per_blk
    kv_blk_len = page_size * pages_per_blk
    spb = seqs_per_blk
    rows = spb * rep

    def _page_copy(j, kv_blk_idx, slot, i):
        pidx = page_indices_ref[(base_seq + j) * pages_per_seq +
                                kv_blk_idx * pages_per_blk + i]
        return pltpu.make_async_copy(
            kv_hbm_ref.at[pidx],
            kv_buf.at[slot, pl.ds((j * pages_per_blk + i) * page_size,
                                  page_size)],
            sems.at[slot],
        )

    def _page_valid(j, kv_blk_idx, i):
        # skip null-page (0) DMAs: padding beyond a sequence's length
        # is masked in compute anyway, and DMA issue cost dominates
        # decode attention at large batch
        pidx = page_indices_ref[(base_seq + j) * pages_per_seq +
                                kv_blk_idx * pages_per_blk + i]
        return pidx != 0

    def kv_dma(kv_blk_idx, slot):
        for j in range(spb):
            for i in range(pages_per_blk):
                valid = _page_valid(j, kv_blk_idx, i)

                @pl.when(valid)
                def _():
                    _page_copy(j, kv_blk_idx, slot, i).start()

                @pl.when(jnp.logical_not(valid))
                def _():
                    # zero-fill: scratch VMEM is uninitialized and a NaN
                    # times a zero probability is still NaN in the PV dot
                    kv_buf[slot, pl.ds((j * pages_per_blk + i) * page_size,
                                       page_size)] = jnp.zeros(
                        (page_size,) + kv_buf.shape[2:], kv_buf.dtype)

    def kv_wait(kv_blk_idx, slot):
        for j in range(spb):
            for i in range(pages_per_blk):
                @pl.when(_page_valid(j, kv_blk_idx, i))
                def _():
                    _page_copy(j, kv_blk_idx, slot, i).wait()

    # max kv blocks over this cell's sequences
    n_blks = jnp.int32(0)
    for j in range(spb):
        n_blks = jnp.maximum(n_blks, pl.cdiv(
            kv_lens_ref[base_seq + j], kv_blk_len))

    # per-row (seq) lengths broadcast to the row axis [rows, 1]
    row_seq = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // rep
    kv_len_row = jnp.zeros((rows, 1), jnp.int32)
    for j in range(spb):
        kv_len_row = jnp.where(row_seq == j,
                               kv_lens_ref[base_seq + j], kv_len_row)
    qpos_row = kv_len_row - 1
    # column coordinates [1, spb*kv_blk_len]: owning seq + position
    total_cols = spb * kv_blk_len
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, total_cols), 1)
    col_seq = col_idx // kv_blk_len
    col_off = col_idx % kv_blk_len

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, MASK_VALUE)
    l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(n_blks > 0)  # fully-padded cells must not leave DMAs in flight
    def _():
        kv_dma(0, 0)

    def body(kv_i, slot):
        @pl.when(kv_i + 1 < n_blks)
        def _():
            kv_dma(kv_i + 1, 1 - slot)

        kv_wait(kv_i, slot)

        col_pos = kv_i * kv_blk_len + col_off
        mask = ((row_seq == col_seq) & (col_pos < kv_len_row)
                & (col_pos <= qpos_row))
        if sliding_window is not None:
            mask &= col_pos > (qpos_row - sliding_window)

        for h in range(num_kv_heads):
            # [spb, rep, LANES] -> [rows, LANES], rows grouped by seq
            qh = q_ref[:, h * rep:(h + 1) * rep, :].reshape(rows, -1)
            if pack == 1:
                k = kv_buf[slot, :, 2 * h, :]      # [spb*L, D]
                v = kv_buf[slot, :, 2 * h + 1, :]
            else:
                k = kv_buf[slot, :, (2 * h * head_dim) // 128, :]
                v = k
            scores = jax.lax.dot_general(
                qh.astype(jnp.float32) * sm_scale,
                k.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [rows, spb*L]
            if soft_cap is not None:
                scores = jnp.tanh(scores / soft_cap) * soft_cap
            scores = jnp.where(mask, scores, MASK_VALUE)

            m_prev = m_ref[h, :, 0:1]
            m_cur = jnp.max(scores, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(scores - m_new)
            p = jnp.where(mask, p, 0.0)
            l_new = l_ref[h, :, 0:1] * alpha + jnp.sum(
                p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[h] = acc_ref[h] * alpha + pv
            m_ref[h] = jnp.broadcast_to(m_new, m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(l_new, l_ref.shape[1:])
        return 1 - slot

    jax.lax.fori_loop(0, n_blks, body, jnp.int32(0))

    for h in range(num_kv_heads):
        l = l_ref[h, :, 0:1]
        res = acc_ref[h] / jnp.where(l == 0.0, 1.0, l)  # [rows, LANES]
        if pack > 1:
            off_v = ((2 * h + 1) * head_dim) % 128
            res = res[:, off_v:off_v + head_dim]
        res = res.reshape(spb, rep, -1).astype(out_ref.dtype)
        out_ref[:, h * rep:(h + 1) * rep, :] = res


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "sliding_window", "soft_cap",
                     "num_kv_pages_per_block", "num_queries_per_block",
                     "decode_mode", "interpret"))
def ragged_paged_attention_pallas(
    q: jax.Array,             # [T, HQ, D]
    kv_pages: jax.Array,      # [P, ps, 2*KVH, D]
    kv_lens: jax.Array,       # i32[S]
    page_indices: jax.Array,  # i32[S, pages_per_seq]
    cu_q_lens: jax.Array,     # i32[S+1]
    num_seqs: jax.Array,      # i32[1] (unused: seq_range covers it)
    *,
    sm_scale: float = 1.0,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    num_kv_pages_per_block: int = 8,
    num_queries_per_block: int = 32,
    decode_mode: bool = False,
    interpret: bool = False,
    alibi_slopes: Optional[jax.Array] = None,  # f32[HQ]
) -> jax.Array:
    t, hq, d = q.shape
    p, ps, ckv, _ = kv_pages.shape
    kvh = ckv // 2
    rep = hq // kvh
    s, pages_per_seq = page_indices.shape
    tile_q = min(num_queries_per_block, t)
    assert t % tile_q == 0, (t, tile_q)
    ppb = min(num_kv_pages_per_block, pages_per_seq)
    # the last (partial) kv block still DMAs ppb pages; the runner pads
    # page tables with null page 0, so the table must cover a whole block
    assert pages_per_seq % ppb == 0, (pages_per_seq, ppb)
    n_q_blks = t // tile_q

    # Lane packing for head_dim < 128 (see module docstring).
    if d % 128 == 0:
        pack = 1
        q_in = q
    else:
        assert 128 % d == 0, f"head_dim {d} must divide or be a multiple " \
                             "of 128"
        pack = 128 // d
        assert ckv % pack == 0, (ckv, pack)
        kv_pages = kv_pages.reshape(p, ps, ckv // pack, 128)
        # place each q head's values into its K lanes, zeros elsewhere
        q_in = jnp.zeros((t, hq, 128), q.dtype)
        head_kv = np.arange(hq) // rep
        offs = (2 * head_kv * d) % 128
        for o in sorted(set(offs.tolist())):
            sel = np.where(offs == o)[0]
            q_in = q_in.at[:, sel, o:o + d].set(q[:, sel, :])

    # seq_range per q block is data-dependent on cu_q_lens; computed
    # jit-side (tiny) so the op stays a pure function of its args.
    starts = jnp.arange(n_q_blks, dtype=jnp.int32) * tile_q
    ends = starts + tile_q
    # first seq whose q range intersects the block; cu_q_lens padded seqs
    # have empty ranges and are skipped by the intersection test
    cu = cu_q_lens
    nseq = jnp.reshape(num_seqs, ())[None]
    valid_seq = jnp.arange(s, dtype=jnp.int32)[None, :] < nseq  # [1,S]
    s_start = cu[:-1][None, :]  # [1, S]
    s_end = cu[1:][None, :]
    inter = (s_start < ends[:, None]) & (s_end > starts[:, None])
    inter &= valid_seq & (s_end > s_start)
    sidx = jnp.arange(s, dtype=jnp.int32)[None, :]
    first = jnp.min(jnp.where(inter, sidx, s), axis=1)
    last1 = jnp.max(jnp.where(inter, sidx + 1, 0), axis=1)
    seq_range = jnp.stack([first, last1], axis=1).reshape(-1)

    lanes = d if pack == 1 else 128

    if decode_mode:
        assert alibi_slopes is None, \
            "alibi decode uses the XLA gather path (ops/attention.py)"
        # one query token per sequence (token index == seq index); use
        # the per-seq small-tile kernel
        spb = 8
        s_eff = min(s, t)
        n_blocks = cdiv(s_eff, spb)
        q_rows = n_blocks * spb
        rows = max(spb * rep, 8)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((spb, hq, lanes), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((spb, hq, d), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, spb * ps * ppb, ckv // pack, lanes),
                           kv_pages.dtype),
                pltpu.VMEM((kvh, rows, lanes), jnp.float32),
                pltpu.VMEM((kvh, rows, 128), jnp.float32),
                pltpu.VMEM((kvh, rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = functools.partial(
            _rpa_decode_kernel,
            sm_scale=sm_scale, num_kv_heads=kvh, rep=rep,
            seqs_per_blk=spb, page_size=ps, pages_per_blk=ppb,
            pages_per_seq=pages_per_seq, head_dim=d, pack=pack,
            sliding_window=sliding_window, soft_cap=soft_cap)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((q_rows, hq, d), q.dtype),
            interpret=interpret,
        )(kv_lens, page_indices.reshape(-1), q_in[:q_rows], kv_pages)
        if q_rows < t:
            out = jnp.pad(out, ((0, t - q_rows), (0, 0), (0, 0)))
        return out

    use_alibi = alibi_slopes is not None
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5 if use_alibi else 4,
        grid=(n_q_blks,),
        in_specs=[
            pl.BlockSpec((tile_q, hq, lanes), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile_q, hq, d), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, ps * ppb, ckv // pack, lanes), kv_pages.dtype),
            pltpu.VMEM((kvh, tile_q * rep, lanes), jnp.float32),
            pltpu.VMEM((kvh, tile_q * rep, 128), jnp.float32),
            pltpu.VMEM((kvh, tile_q * rep, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _rpa_kernel,
        sm_scale=sm_scale,
        num_kv_heads=kvh,
        rep=rep,
        tile_q=tile_q,
        page_size=ps,
        pages_per_blk=ppb,
        pages_per_seq=pages_per_seq,
        head_dim=d,
        pack=pack,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        use_alibi=use_alibi,
    )
    prefetch = [kv_lens, page_indices.reshape(-1), cu_q_lens, seq_range]
    if use_alibi:
        prefetch.append(jax.lax.bitcast_convert_type(
            jnp.asarray(alibi_slopes, jnp.float32), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, hq, d), q.dtype),
        interpret=interpret,
    )(*prefetch, q_in, kv_pages)
    return out
