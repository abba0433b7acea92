"""Pallas decode arena-attention kernel (flash-style, inline int8 dequant).

The decode-window hot path (ops/window_attention.py) reads an immutable
dense KV arena plus a small per-window ring. Round 3 ran it as XLA
einsums: 3.6 ms/step for the 22-layer TinyLlama chain at batch 256 vs a
~1.8 ms bf16 HBM roofline, and the int8 arena measured speed-NEUTRAL
because XLA materialized the int8->bf16 converts instead of fusing them
into the dots (BENCHMARKS.md round-3 budget). This kernel closes both
gaps:

- one flash-attention pass per (row-block, head-block): running max /
  denominator / accumulator live in VMEM scratch across context tiles,
  so no score tensor or converted arena copy ever touches HBM;
- int8 arenas are dequantized IN REGISTER: K tiles convert int8->bf16
  on the VPU (exact: |int8| <= 127 fits bf16's 8-bit mantissa) and the
  per-token K scales multiply the f32 scores, the V scales fold into
  the (tiny) probability tensor — HBM streams raw int8, which is the
  whole bandwidth point of the int8 cache;
- per-row-block context clamping: the tile index map consults a
  scalar-prefetched per-block max kv-length and re-serves the last
  needed tile for grid steps past it (Pallas skips the refetch when the
  block index repeats), so short rows in a long-context bucket don't
  stream dead arena bytes;
- the window ring (this window's freshly appended K/V) merges into the
  same softmax at the final tile.

Role of the reference's decode attention kernels
(csrc/attention/paged_attention_v2.cu:176 — partition-then-reduce over
512-token chunks; tmp accumulators merged by a reduce kernel): here the
"partitions" are the flash tiles and the merge is the running-softmax
scratch, which is the TPU-native shape of the same idea. The arena's
page-gather indirection already happened once per window, so this
kernel streams CONTIGUOUS [rows, heads, ctx, dim] tiles — exactly the
layout the round-2 per-page decode kernel (16.9 ms, DMA-issue-bound)
could not get from the paged pool.

Layouts (chosen for DMA contiguity; build_window_cache produces them):
  q        [S, HQ, D]            queries, one row per sequence
  aK, aV   [S, KVH, CTX, D]      arena (int8 or bf16/f32)
  aKs, aVs [S, KVH, CTX] f32     per-(token, head) scales (int8 only)
  ringK/V  [N, S, KVH, D]        window ring (always q-dtype)
  base     i32[S]                kv length at window start per row
  step     i32[]                 last written ring row (-1 = none)
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e30


def _choose_tiles(s: int, kvh: int, ctx: int, d: int, esize: int):
    """Pick (s_blk, kvh_blk, tile) so one K tile stays ~<=1 MiB of VMEM
    (counting lane padding of D<128) while each grid cell still moves
    hundreds of KB per DMA — per-cell issue overhead killed the round-2
    per-page decode kernel, oversized tiles blow the VMEM budget."""
    d_pad = max(d, 128)
    tile = min(ctx, 256)
    s_blk = 8 if s % 8 == 0 else 1
    kvh_blk = kvh

    def nbytes():
        return s_blk * kvh_blk * tile * d_pad * esize

    budget = 1024 * 1024
    while nbytes() > budget:
        if s_blk > 1:
            s_blk //= 2
        elif kvh_blk > 1 and kvh % (kvh_blk // 2) == 0:
            kvh_blk //= 2
        elif tile > 128:
            tile //= 2
        else:
            break
    return s_blk, kvh_blk, tile


def _kernel(meta_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
            rk_ref, rv_ref, o_ref, acc, m_scr, l_scr, *,
            tile: int, rep: int, sm_scale: float,
            sliding_window: Optional[int], n_tiles: int, int8: bool,
            n_rows: int):
    i = pl.program_id(0)
    t = pl.program_id(2)
    s_blk, kvh_blk, _, d = k_ref.shape
    n = rk_ref.shape[0]
    cdt = q_ref.dtype
    # meta layout: [0:S) per-row base lens | [S:S+S_blocks) per-block
    # max (tile clamp, used by the index maps) | [S+S_blocks] ring step
    stp = meta_ref[n_rows + pl.num_programs(0)]
    # per-row kv-at-window-start as a [S_BLK, 1] vector (SMEM scalar
    # reads; a VMEM operand would need 8-row-aligned blocks)
    base = jnp.concatenate(
        [jnp.full((1, 1), meta_ref[i * s_blk + r], jnp.int32)
         for r in range(s_blk)], axis=0)
    base4 = base[:, None, None, :]                   # [S_BLK,1,1,1]

    @pl.when(t == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)

    def flash(scores, valid, vs_tile):
        """One running-softmax update over scores f32
        [S_BLK, KVH_BLK, rep, L]; returns (alpha, p) for the caller's
        P@V contraction."""
        m_prev = m_scr[..., :1]
        l_prev = l_scr[..., :1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        # re-mask after exp: for fully-masked rows m_new stays
        # MASK_VALUE and exp(score - m_new) would be exp(0) = 1
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
        l_scr[...] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True),
            l_scr.shape)
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        if vs_tile is not None:
            # V scales fold into the probabilities (tiny) so the big V
            # tile is consumed as raw int8-converted values
            p = p * vs_tile
        return alpha, p.astype(cdt)

    # Mosaic's tpu.matmul supports ONE batch dim: merge (row, head)
    # blocks into B = s_blk * kvh_blk around every dot
    b = s_blk * kvh_blk
    q3 = q_ref[...].reshape(b, rep, d)

    blk_max = meta_ref[n_rows + i]

    @pl.when(t * tile < blk_max)
    def _arena_tile():
        k = k_ref[...]
        if int8:
            k = k.astype(cdt)
        scores = jax.lax.dot_general(
            q3, k.reshape(b, tile, d), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(
                s_blk, kvh_blk, rep, tile) * sm_scale
        if int8:
            scores = scores * ks_ref[...][:, :, None, :]
        col = t * tile + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, 1, tile), 3)
        valid = col < base4
        if sliding_window is not None:
            cur = base4 + stp  # the query's absolute position
            valid &= col > cur - sliding_window
        scores = jnp.where(valid, scores, MASK_VALUE)
        v = v_ref[...]
        if int8:
            v = v.astype(cdt)
        vs = vs_ref[...][:, :, None, :] if int8 else None
        alpha, p = flash(scores, valid, vs)
        o_t = jax.lax.dot_general(
            p.reshape(b, rep, tile), v.reshape(b, tile, d),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(
                s_blk, kvh_blk, rep, d)
        acc[...] = acc[...] * alpha + o_t

    @pl.when(t == n_tiles - 1)
    def _ring_and_emit():
        # ring tiles are tiny ([N, s_blk, g, d]); transpose to put the
        # (row, head) batch in front for the single-batch-dim matmul
        rk = rk_ref[...].transpose(1, 2, 0, 3).reshape(b, n, d)
        rv = rv_ref[...].transpose(1, 2, 0, 3).reshape(b, n, d)
        scores = jax.lax.dot_general(
            q3, rk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(
                s_blk, kvh_blk, rep, n) * sm_scale
        nidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, n), 3)
        valid = nidx <= stp
        if sliding_window is not None:
            valid &= nidx > stp - sliding_window
        scores = jnp.where(valid, scores, MASK_VALUE)
        alpha, p = flash(scores, valid, None)
        o_t = jax.lax.dot_general(
            p.reshape(b, rep, n), rv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(
                s_blk, kvh_blk, rep, d)
        accv = acc[...] * alpha + o_t
        l = jnp.maximum(l_scr[..., :1], 1e-30)
        out = accv / l
        o_ref[...] = out.reshape(s_blk, kvh_blk * rep, d).astype(
            o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "sliding_window", "interpret"))
def arena_attention_pallas(
    q: jax.Array,              # [S, HQ, D]
    aK: jax.Array,             # [S, KVH, CTX, D] int8 | bf16 | f32
    aV: jax.Array,
    aKs: Optional[jax.Array],  # f32 [S, KVH, CTX] (int8 arenas only)
    aVs: Optional[jax.Array],
    ringK: jax.Array,          # [N, S, KVH, D] (q dtype)
    ringV: jax.Array,
    base_lens: jax.Array,      # i32[S]
    step: jax.Array,           # i32[] last written ring row
    *,
    sm_scale: float = 1.0,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    s, kvh, ctx, d = aK.shape
    hq = q.shape[1]
    rep = hq // kvh
    n = ringK.shape[0]
    int8 = aK.dtype == jnp.int8

    s_blk, kvh_blk, tile = _choose_tiles(
        s, kvh, ctx, d, 1 if int8 else q.dtype.itemsize)
    n_tiles = pl.cdiv(ctx, tile)
    s_blocks = s // s_blk

    # meta: per-row base lens | per-row-block max (tile clamp) | step
    blk_max = jnp.max(base_lens.reshape(s_blocks, s_blk), axis=1)
    meta = jnp.concatenate(
        [base_lens.astype(jnp.int32), blk_max.astype(jnp.int32),
         jnp.reshape(step, (1,)).astype(jnp.int32)])

    def tile_idx(i, g, t, meta_ref):
        last = jnp.maximum((meta_ref[s + i] + tile - 1) // tile - 1, 0)
        return (i, g, jnp.minimum(t, last), 0)

    def tile_idx3(i, g, t, meta_ref):
        last = jnp.maximum((meta_ref[s + i] + tile - 1) // tile - 1, 0)
        return (i, g, jnp.minimum(t, last))

    in_specs = [
        pl.BlockSpec((s_blk, kvh_blk * rep, d),
                     lambda i, g, t, m: (i, g, 0)),
        pl.BlockSpec((s_blk, kvh_blk, tile, d), tile_idx),
    ]
    args = [q, aK]
    if int8:
        in_specs.append(pl.BlockSpec((s_blk, kvh_blk, tile), tile_idx3))
        args.append(aKs)
    in_specs.append(pl.BlockSpec((s_blk, kvh_blk, tile, d), tile_idx))
    args.append(aV)
    if int8:
        in_specs.append(pl.BlockSpec((s_blk, kvh_blk, tile), tile_idx3))
        args.append(aVs)
    in_specs += [
        pl.BlockSpec((n, s_blk, kvh_blk, d),
                     lambda i, g, t, m: (0, i, g, 0)),
        pl.BlockSpec((n, s_blk, kvh_blk, d),
                     lambda i, g, t, m: (0, i, g, 0)),
    ]
    args += [ringK, ringV]

    kernel = functools.partial(
        _kernel, tile=tile, rep=rep, sm_scale=float(sm_scale),
        sliding_window=sliding_window, n_tiles=n_tiles, int8=int8,
        n_rows=s)
    if not int8:
        def kernel_noscale(meta_ref, q_ref, k_ref, v_ref,
                           rk_ref, rv_ref, o_ref, acc, m_scr, l_scr):
            return kernel(meta_ref, q_ref, k_ref, None, v_ref,
                          None, rk_ref, rv_ref, o_ref, acc, m_scr, l_scr)
        body = kernel_noscale
    else:
        body = kernel

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_blocks, kvh // kvh_blk, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((s_blk, kvh_blk * rep, d),
                               lambda i, g, t, m: (i, g, 0)),
        scratch_shapes=[
            pltpu.VMEM((s_blk, kvh_blk, rep, d), jnp.float32),
            pltpu.VMEM((s_blk, kvh_blk, rep, 128), jnp.float32),
            pltpu.VMEM((s_blk, kvh_blk, rep, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, hq, d), q.dtype),
        interpret=interpret,
    )(meta, *args)


# ---------------------------------------------------------------------------
# packed-lane variant: one head's K and V share a 128-lane group


def _kernel_packed(meta_ref, q_ref, kv_ref, ks_ref, vs_ref,
                   rk_ref, rv_ref, o_ref, acc, m_scr, l_scr, *,
                   tile: int, rep: int, d: int, sm_scale: float,
                   sliding_window: Optional[int], n_tiles: int,
                   int8: bool, n_rows: int):
    """Packed arena tile [S_BLK, KVH_BLK, L, 2D]: lanes [0:D) = K,
    [D:2D) = V. q arrives zero-padded to 2D, so the score contraction
    over all 2D lanes equals the K-only dot; the P@V contraction slices
    the V lanes. Streaming K and V as ONE compact 128-lane tile is the
    whole point: a D=64 slice would be lane-padded to 128 by Mosaic and
    DOUBLE the arena's HBM bytes (see ops/rpa_kernel.py head packing,
    the same trick on the paged layout)."""
    i = pl.program_id(0)
    t = pl.program_id(2)
    s_blk, kvh_blk, _, d2 = kv_ref.shape
    n = rk_ref.shape[0]
    cdt = q_ref.dtype
    stp = meta_ref[n_rows + pl.num_programs(0)]
    base = jnp.concatenate(
        [jnp.full((1, 1), meta_ref[i * s_blk + r], jnp.int32)
         for r in range(s_blk)], axis=0)
    base4 = base[:, None, None, :]

    @pl.when(t == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)

    def flash(scores, valid, vs_tile):
        m_prev = m_scr[..., :1]
        l_prev = l_scr[..., :1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
        l_scr[...] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True),
            l_scr.shape)
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        if vs_tile is not None:
            p = p * vs_tile
        return alpha, p.astype(cdt)

    b = s_blk * kvh_blk
    q3 = q_ref[...].reshape(b, rep, d2)   # zero-padded V lanes

    blk_max = meta_ref[n_rows + i]

    @pl.when(t * tile < blk_max)
    def _arena_tile():
        kv = kv_ref[...]
        if int8:
            kv = kv.astype(cdt)
        kv3 = kv.reshape(b, tile, d2)
        # q's V lanes are zero: contraction over 2D == K-only dot
        scores = jax.lax.dot_general(
            q3, kv3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(
                s_blk, kvh_blk, rep, tile) * sm_scale
        if int8:
            scores = scores * ks_ref[...][:, :, None, :]
        col = t * tile + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, 1, tile), 3)
        valid = col < base4
        if sliding_window is not None:
            cur = base4 + stp
            valid &= col > cur - sliding_window
        scores = jnp.where(valid, scores, MASK_VALUE)
        vs = vs_ref[...][:, :, None, :] if int8 else None
        alpha, p = flash(scores, valid, vs)
        o_t = jax.lax.dot_general(
            p.reshape(b, rep, tile), kv3[:, :, d:],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(
                s_blk, kvh_blk, rep, d)
        acc[...] = acc[...] * alpha + o_t

    @pl.when(t == n_tiles - 1)
    def _ring_and_emit():
        rk = rk_ref[...].transpose(1, 2, 0, 3).reshape(b, n, d)
        rv = rv_ref[...].transpose(1, 2, 0, 3).reshape(b, n, d)
        scores = jax.lax.dot_general(
            q3[:, :, :d], rk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(
                s_blk, kvh_blk, rep, n) * sm_scale
        nidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, n), 3)
        valid = nidx <= stp
        if sliding_window is not None:
            valid &= nidx > stp - sliding_window
        scores = jnp.where(valid, scores, MASK_VALUE)
        alpha, p = flash(scores, valid, None)
        o_t = jax.lax.dot_general(
            p.reshape(b, rep, n), rv,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(
                s_blk, kvh_blk, rep, d)
        accv = acc[...] * alpha + o_t
        l = jnp.maximum(l_scr[..., :1], 1e-30)
        out = accv / l
        o_ref[...] = out.reshape(s_blk, kvh_blk * rep, d).astype(
            o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "sliding_window", "interpret"))
def arena_attention_packed(
    q: jax.Array,              # [S, HQ, D]
    aKV: jax.Array,            # [S, KVH, CTX, 2D] K|V lane-packed
    aKs: Optional[jax.Array],  # f32 [S, KVH, CTX] (int8 arenas only)
    aVs: Optional[jax.Array],
    ringK: jax.Array,          # [N, S, KVH, D] (q dtype)
    ringV: jax.Array,
    base_lens: jax.Array,      # i32[S]
    step: jax.Array,           # i32[] last written ring row
    *,
    sm_scale: float = 1.0,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    s, kvh, ctx, d2 = aKV.shape
    d = d2 // 2
    hq = q.shape[1]
    rep = hq // kvh
    n = ringK.shape[0]
    int8 = aKV.dtype == jnp.int8

    # zero-pad q's V lanes so the packed score contraction is K-only
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, d2 - q.shape[2])))

    s_blk, kvh_blk, tile = _choose_tiles(
        s, kvh, ctx, d2, 1 if int8 else q.dtype.itemsize)
    n_tiles = pl.cdiv(ctx, tile)
    s_blocks = s // s_blk

    blk_max = jnp.max(base_lens.reshape(s_blocks, s_blk), axis=1)
    meta = jnp.concatenate(
        [base_lens.astype(jnp.int32), blk_max.astype(jnp.int32),
         jnp.reshape(step, (1,)).astype(jnp.int32)])

    def tile_idx(i, g, t, meta_ref):
        last = jnp.maximum((meta_ref[s + i] + tile - 1) // tile - 1, 0)
        return (i, g, jnp.minimum(t, last), 0)

    def tile_idx3(i, g, t, meta_ref):
        last = jnp.maximum((meta_ref[s + i] + tile - 1) // tile - 1, 0)
        return (i, g, jnp.minimum(t, last))

    in_specs = [
        pl.BlockSpec((s_blk, kvh_blk * rep, d2),
                     lambda i, g, t, m: (i, g, 0)),
        pl.BlockSpec((s_blk, kvh_blk, tile, d2), tile_idx),
    ]
    args = [qp, aKV]
    if int8:
        in_specs.append(pl.BlockSpec((s_blk, kvh_blk, tile), tile_idx3))
        args.append(aKs)
        in_specs.append(pl.BlockSpec((s_blk, kvh_blk, tile), tile_idx3))
        args.append(aVs)
    in_specs += [
        pl.BlockSpec((n, s_blk, kvh_blk, d),
                     lambda i, g, t, m: (0, i, g, 0)),
        pl.BlockSpec((n, s_blk, kvh_blk, d),
                     lambda i, g, t, m: (0, i, g, 0)),
    ]
    args += [ringK, ringV]

    kernel = functools.partial(
        _kernel_packed, tile=tile, rep=rep, d=d,
        sm_scale=float(sm_scale), sliding_window=sliding_window,
        n_tiles=n_tiles, int8=int8, n_rows=s)
    if not int8:
        def kernel_noscale(meta_ref, q_ref, kv_ref, rk_ref, rv_ref,
                           o_ref, acc, m_scr, l_scr):
            return kernel(meta_ref, q_ref, kv_ref, None, None,
                          rk_ref, rv_ref, o_ref, acc, m_scr, l_scr)
        body = kernel_noscale
    else:
        body = kernel

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_blocks, kvh // kvh_blk, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((s_blk, kvh_blk * rep, d),
                               lambda i, g, t, m: (i, g, 0)),
        scratch_shapes=[
            pltpu.VMEM((s_blk, kvh_blk, rep, d), jnp.float32),
            pltpu.VMEM((s_blk, kvh_blk, rep, 128), jnp.float32),
            pltpu.VMEM((s_blk, kvh_blk, rep, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, hq, d), q.dtype),
        interpret=interpret,
    )(meta, *args)
