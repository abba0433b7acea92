"""Fused PQ (codebook) matmul — the centerpiece op.

Computes ``y = x @ W`` where ``W[in, out]`` is product-quantized as
``W[j*g+p, o] = (sum_k codebooks[k, codes[k, j, o], p]) * scales[o]``.

Two execution paths (role of the reference's AQLM GEMV/dequant crossover,
``aqlm.py:344-364``, rebuilt TPU-first):

- ``pq_dequant_matmul_pallas``: grid over (T, out, in-group) tiles; codes
  stream HBM->VMEM; dequant uses the TPU lane-gather primitive
  (``take_along_axis`` on a 128-lane table; 256-entry codebooks are split
  into low/high halves selected by the code's top bit — the VMEM analog
  of the reference's smem-resident codebooks, ``gemm_kernels.cu:137-142``)
  feeding MXU matmuls per subvector position.
- XLA fallback (``pq_matmul_xla``): full dequant via XLA gather + dot.
  Used on CPU, for 16-bit codebooks, and as the correctness oracle.

Codes layout is ``[num_codebooks, in/g, out]`` (out on TPU lanes); see
``vllm_pq_tpu.quantization.pq``.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_pq_tpu.quantization.pq import pq_dequantize_ref

# Tile sizes (tuned for v5e; out tile fixed at 128 lanes by the gather
# primitive's table width).
_TILE_T = 256
_TILE_O = 128
_TILE_J = 128


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def pq_matmul_xla(x: jax.Array, codes: jax.Array, codebooks: jax.Array,
                  scales: jax.Array) -> jax.Array:
    w = pq_dequantize_ref(codes, codebooks, scales, out_dtype=x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas fused dequant + matmul
# ---------------------------------------------------------------------------
#
# Gather strategy (round-3): a 256-entry codebook does not fit the
# 128-lane gather table, so the round-2 kernels gathered BOTH halves in
# f32 and selected by the code's top bit — two gather ops per
# (codebook, position). The packed variant stores the entry pair
# (e, e+128) as two bf16 bit-patterns in ONE int32 lane; a single gather
# with (code & 127) fetches both, and the top bit picks a 16-bit half
# with int32 mask/shift. A bf16 value is exactly an f32 with zero low
# bits, so unpacking is `bitcast(word & ~0xffff)` / `bitcast(word<<16)`
# — no 16-bit ops needed. This HALVES the VPU gather count (the measured
# bottleneck: BENCHMARKS.md, ~180 G elem/s pipelined ceiling).


def _pack_codebooks(codebooks: jax.Array) -> jax.Array:
    """[m, C, g] f32 -> [m, g, 128] int32: lanes hold bf16 bit-pairs
    (entry e in low 16 bits, entry e+128 in high 16 bits)."""
    cb = codebooks.transpose(0, 2, 1).astype(jnp.bfloat16)  # [m, g, C]
    bits = jax.lax.bitcast_convert_type(cb, jnp.uint16).astype(jnp.uint32)
    packed = bits[..., :128] | (bits[..., 128:] << 16)
    return jax.lax.bitcast_convert_type(packed, jnp.int32)


def _gathered_entry(tbl_row, lows_k, his_k, tile_j):
    """One packed gather + half-select -> f32 [tile_j, 128]."""
    tbl = jnp.broadcast_to(tbl_row[None, :], (tile_j, 128))
    word = jnp.take_along_axis(tbl, lows_k, axis=1)
    masked = jnp.where(his_k,
                       word & jnp.int32(-65536),       # hi entry bits
                       word << 16)                     # lo entry bits
    return jax.lax.bitcast_convert_type(masked, jnp.float32)


def _dequant_matmul_kernel(xp_ref, codes_ref, cbp_ref, scales_ref,
                           out_ref, acc_ref, w_ref, *, m: int, g: int,
                           tile_t: int, tile_j: int, n_j: int, n_t: int):
    """Packed-gather fused kernel. Same grid contract as the split
    variant below, but (a) one gather per (codebook, position) and
    (b) each position's matmul issues right after its dequant, so MXU
    work overlaps the next position's VPU gathers.

    cbp_ref [m, g, 128] int32 packed codebook pairs.
    """
    j_idx = pl.program_id(1)
    t_idx = pl.program_id(2)

    @pl.when(j_idx == 0)
    def _():
        acc_ref[t_idx] = jnp.zeros_like(acc_ref[t_idx])

    @pl.when(t_idx == 0)
    def _():
        codes = codes_ref[:].astype(jnp.int32)  # [m, tile_j, 128]
        lows = [codes[k] & 127 for k in range(m)]
        is_his = [codes[k] >= 128 for k in range(m)]
        acc = acc_ref[t_idx]
        for p in range(g):
            w_p = None
            for k in range(m):
                val = _gathered_entry(cbp_ref[k, p, :], lows[k],
                                      is_his[k], tile_j)
                w_p = val if w_p is None else w_p + val
            w_p = w_p.astype(w_ref.dtype)
            w_ref[p] = w_p
            acc = acc + jax.lax.dot_general(
                xp_ref[p], w_p,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc_ref[t_idx] = acc

    @pl.when(t_idx != 0)
    def _():
        acc = acc_ref[t_idx]
        for p in range(g):
            acc = acc + jax.lax.dot_general(
                xp_ref[p], w_ref[p],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc_ref[t_idx] = acc

    @pl.when(j_idx == n_j - 1)
    def _():
        out_ref[:] = (acc_ref[t_idx] *
                      scales_ref[0, :][None, :]).astype(out_ref.dtype)


def _dequant_matmul_kernel_split(xp_ref, codes_ref, cb_lo_ref, cb_hi_ref,
                                 scales_ref, out_ref, acc_ref, w_ref, *,
                                 m: int, g: int, tile_t: int, tile_j: int,
                                 n_j: int, n_t: int):
    """One (o, j, t) grid cell — t innermost so the dequantized weight
    tile (the VPU-bound part) is computed ONCE per (o, j) and reused by
    every token tile (prefill runs many token tiles per weight tile;
    SURVEY hard part #1).

    xp_ref     [g, tile_t, tile_j]  bf16  x permuted to position-major
    codes_ref  [m, tile_j, 128]     int   (uint8 viewed as int32 below)
    cb_lo_ref  [m, g, 128]          f32   codebook entries 0..127
    cb_hi_ref  [m, g, 128]          f32   codebook entries 128..255
    scales_ref [1, 128]             f32
    out_ref    [tile_t, 128]        bf16/f32 (written at last j step)
    acc_ref    [n_t, tile_t, 128]   f32 accumulators (one per t tile)
    w_ref      [g, tile_j, 128]     bf16 dequantized weight scratch
    """
    j_idx = pl.program_id(1)
    t_idx = pl.program_id(2)

    @pl.when(j_idx == 0)
    def _():
        acc_ref[t_idx] = jnp.zeros_like(acc_ref[t_idx])

    @pl.when(t_idx == 0)
    def _():
        # dequantize this (o, j) weight tile once; hoist per-code index
        # math out of the position loop (the VPU gathers are the
        # bottleneck)
        codes = codes_ref[:].astype(jnp.int32)  # [m, tile_j, 128]
        lows = [codes[k] & 127 for k in range(m)]
        is_his = [codes[k] >= 128 for k in range(m)]
        for p in range(g):
            w_p = None
            for k in range(m):
                t_lo = jnp.broadcast_to(cb_lo_ref[k, p, :][None, :],
                                        (tile_j, 128))
                t_hi = jnp.broadcast_to(cb_hi_ref[k, p, :][None, :],
                                        (tile_j, 128))
                g_lo = jnp.take_along_axis(t_lo, lows[k], axis=1)
                g_hi = jnp.take_along_axis(t_hi, lows[k], axis=1)
                val = jnp.where(is_his[k], g_hi, g_lo)
                w_p = val if w_p is None else w_p + val
            w_ref[p] = w_p.astype(w_ref.dtype)

    acc = acc_ref[t_idx]
    for p in range(g):
        # [tile_t, tile_j] @ [tile_j, 128] on the MXU
        acc = acc + jax.lax.dot_general(
            xp_ref[p], w_ref[p],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_ref[t_idx] = acc

    @pl.when(j_idx == n_j - 1)
    def _():
        out_ref[:] = (acc_ref[t_idx] *
                      scales_ref[0, :][None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "variant"))
def pq_dequant_matmul_pallas(x: jax.Array, codes: jax.Array,
                             codebooks: jax.Array, scales: jax.Array,
                             interpret: bool = False,
                             variant: str = "packed") -> jax.Array:
    """y = x @ dequant(codes).  x [T, I]; returns [T, O].

    Requires O % 128 == 0 and 8-bit codebooks; T and in-groups are padded
    internally. ``variant``: "packed" (one int32 gather per codebook and
    position, bf16 entries) or "split" (two f32 gathers, round-2 kernel,
    kept for A/B).
    """
    t, i = x.shape
    m, j, o = codes.shape
    c, g = codebooks.shape[1], codebooks.shape[2]
    assert i == j * g, (i, j, g)
    assert c == 256, "pallas path supports 8-bit codebooks"
    assert o % _TILE_O == 0, f"out dim {o} must be a multiple of {_TILE_O}"

    tile_t = min(_TILE_T, max(8, 1 << (t - 1).bit_length()))
    tile_j = min(_TILE_J, j)

    # pad T and J
    t_pad = -t % tile_t
    j_pad = -j % tile_j
    if j_pad:
        codes = jnp.pad(codes, ((0, 0), (0, j_pad), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, j_pad * g)))
    if t_pad:
        x = jnp.pad(x, ((0, t_pad), (0, 0)))
    tp, jp = t + t_pad, j + j_pad

    # x -> position-major [g, T, J] so each subvector position is a
    # contiguous [T, J] operand for the per-position matmul.
    xp = x.reshape(tp, jp, g).transpose(2, 0, 1)

    scales2d = scales.reshape(1, o).astype(jnp.float32)

    n_t = tp // tile_t
    n_o = o // _TILE_O
    n_j = jp // tile_j

    # t innermost: the dequantized weight tile is computed once per
    # (o, j) and reused by all token tiles
    grid = (n_o, n_j, n_t)
    common = dict(m=m, g=g, tile_t=tile_t, tile_j=tile_j, n_j=n_j, n_t=n_t)
    xp_spec = pl.BlockSpec((g, tile_t, tile_j),
                           lambda oi, ji, ti: (0, ti, ji),
                           memory_space=pltpu.VMEM)
    codes_spec = pl.BlockSpec((m, tile_j, _TILE_O),
                              lambda oi, ji, ti: (0, ji, oi),
                              memory_space=pltpu.VMEM)
    scales_spec = pl.BlockSpec((1, _TILE_O), lambda oi, ji, ti: (0, oi),
                               memory_space=pltpu.VMEM)
    if variant == "packed":
        kernel = functools.partial(_dequant_matmul_kernel, **common)
        operands = (xp, codes, _pack_codebooks(codebooks), scales2d)
        in_specs = [xp_spec, codes_spec,
                    pl.BlockSpec(memory_space=pltpu.VMEM), scales_spec]
    else:
        kernel = functools.partial(_dequant_matmul_kernel_split, **common)
        cb = codebooks.transpose(0, 2, 1)  # [m, g, C]
        operands = (xp, codes, cb[:, :, :128], cb[:, :, 128:], scales2d)
        in_specs = [xp_spec, codes_spec,
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM), scales_spec]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_t, _TILE_O),
                               lambda oi, ji, ti: (ti, oi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, o), x.dtype),
        scratch_shapes=[pltpu.VMEM((n_t, tile_t, _TILE_O), jnp.float32),
                        pltpu.VMEM((g, tile_j, _TILE_O), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * i * o,
            bytes_accessed=codes.size + tp * i * 2 + tp * o * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:t] if t_pad else out


def _variant() -> str:
    import vllm_pq_tpu.envs as envs
    return envs.VPQ_PQ_GATHER


def pq_matmul(x: jax.Array, codes: jax.Array, codebooks: jax.Array,
              scales: jax.Array) -> jax.Array:
    """Dispatch to the best path for the current device/shape."""
    nbits8 = codebooks.shape[1] == 256
    if _on_tpu() and nbits8 and codes.shape[2] % _TILE_O == 0:
        return pq_dequant_matmul_pallas(x, codes, codebooks, scales,
                                        variant=_variant())
    return pq_matmul_xla(x, codes, codebooks, scales)


# ---------------------------------------------------------------------------
# Dequant-only kernel (multi-step window dequant): codes -> dense bf16
# weights in HBM, paid ONCE per N-step decode window and amortized. On
# v5e the VPU table-gather rate (~40 G weights/s measured in-chain,
# benchmarks/microbench.py) makes fused per-step dequant compute-bound at
# ~20 ms per TinyLlama step; a dense bf16 matmul streams the same layer
# stack at the HBM roofline (~2.4 ms). Role of the reference's
# aqlm_dequant + F.linear crossover (aqlm.py:352-364,
# csrc/quantization/aqlm/gemm_kernels.cu:544) — the reference also
# dequantizes for batched shapes; here the result is cached for a window.
# ---------------------------------------------------------------------------


def _dequant_kernel(codes_ref, cbp_ref, scales_ref, out_ref,
                    *, m: int, g: int, tile_j: int):
    """Packed-gather dequant (see _pack_codebooks above)."""
    codes = codes_ref[:].astype(jnp.int32)  # [m, tile_j, 128]
    lows = [codes[k] & 127 for k in range(m)]
    is_his = [codes[k] >= 128 for k in range(m)]
    sc = scales_ref[0, :][None, :]
    for p in range(g):
        w_p = None
        for k in range(m):
            val = _gathered_entry(cbp_ref[k, p, :], lows[k], is_his[k],
                                  tile_j)
            w_p = val if w_p is None else w_p + val
        out_ref[:, p, :] = (w_p * sc).astype(out_ref.dtype)


def _dequant_kernel_split(codes_ref, cb_lo_ref, cb_hi_ref, scales_ref,
                          out_ref, *, m: int, g: int, tile_j: int):
    codes = codes_ref[:].astype(jnp.int32)  # [m, tile_j, 128]
    lows = [codes[k] & 127 for k in range(m)]
    is_his = [codes[k] >= 128 for k in range(m)]
    sc = scales_ref[0, :][None, :]
    for p in range(g):
        w_p = None
        for k in range(m):
            t_lo = jnp.broadcast_to(cb_lo_ref[k, p, :][None, :],
                                    (tile_j, 128))
            t_hi = jnp.broadcast_to(cb_hi_ref[k, p, :][None, :],
                                    (tile_j, 128))
            g_lo = jnp.take_along_axis(t_lo, lows[k], axis=1)
            g_hi = jnp.take_along_axis(t_hi, lows[k], axis=1)
            val = jnp.where(is_his[k], g_hi, g_lo)
            w_p = val if w_p is None else w_p + val
        out_ref[:, p, :] = (w_p * sc).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret", "variant"))
def pq_dequant_full_pallas(codes: jax.Array, codebooks: jax.Array,
                           scales: jax.Array, out_dtype=jnp.bfloat16,
                           interpret: bool = False,
                           variant: str = "packed") -> jax.Array:
    """Dequantize the whole weight: returns dense [in, out]."""
    m, j, o = codes.shape
    c, g = codebooks.shape[1], codebooks.shape[2]
    assert c == 256, "pallas dequant supports 8-bit codebooks"
    assert o % _TILE_O == 0, o
    tile_j = min(_TILE_J, j)
    j_pad = -j % tile_j
    if j_pad:
        codes = jnp.pad(codes, ((0, 0), (0, j_pad), (0, 0)))
    jp = j + j_pad
    scales2d = scales.reshape(1, o).astype(jnp.float32)
    grid = (jp // tile_j, o // _TILE_O)
    codes_spec = pl.BlockSpec((m, tile_j, _TILE_O),
                              lambda ji, oi: (0, ji, oi),
                              memory_space=pltpu.VMEM)
    scales_spec = pl.BlockSpec((1, _TILE_O), lambda ji, oi: (0, oi),
                               memory_space=pltpu.VMEM)
    if variant == "packed":
        kernel = functools.partial(_dequant_kernel, m=m, g=g,
                                   tile_j=tile_j)
        operands = (codes, _pack_codebooks(codebooks), scales2d)
        in_specs = [codes_spec, pl.BlockSpec(memory_space=pltpu.VMEM),
                    scales_spec]
    else:
        kernel = functools.partial(_dequant_kernel_split, m=m, g=g,
                                   tile_j=tile_j)
        cb = codebooks.transpose(0, 2, 1)  # [m, g, C]
        operands = (codes, cb[:, :, :128], cb[:, :, 128:], scales2d)
        in_specs = [codes_spec, pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM), scales_spec]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_j, g, _TILE_O),
                               lambda ji, oi: (ji, 0, oi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((jp, g, o), out_dtype),
        interpret=interpret,
    )(*operands)
    return out[:j].reshape(j * g, o)


def pq_dequantize(codes: jax.Array, codebooks: jax.Array,
                  scales: jax.Array, out_dtype=jnp.bfloat16) -> jax.Array:
    """Full dequantization dispatch (used by the window-dequant path)."""
    if (_on_tpu() and codebooks.shape[1] == 256
            and codes.shape[2] % _TILE_O == 0):
        return pq_dequant_full_pallas(codes, codebooks, scales,
                                      out_dtype=out_dtype,
                                      variant=_variant())
    return pq_dequantize_ref(codes, codebooks, scales, out_dtype=out_dtype)
