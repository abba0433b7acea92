"""Fused per-token activation quantization (Pallas).

Role of the reference's dynamic-quant epilogue in
``csrc/quantization/compressed_tensors/int8_quant_kernels.cu``
(dynamic_scaled_int8_quant): one pass over the activations computes the
per-row absmax scale AND the rounded int8 values.

Why a kernel: XLA lowers ``absmax -> scale -> clamp(round(x/s))`` as a
separate lane-reduction op plus a quantize op per linear; the profiler
measured the reduction at ~13 us per call (latency-bound, not
bandwidth), x4 linears x n_layers = ~1.2 ms of a 6.6 ms decode
iteration. Fusing the reduce with the quantize reads x once and pays
one op per linear instead of two.

The scales output is lane-broadcast to [T, 128] (a [T, 1] block is not
a legal TPU tile); consumers slice column 0 — the slice fuses into the
scale-multiply epilogue of the following dot.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import vllm_pq_tpu.envs as envs


def _quant_kernel(x_ref, q_ref, s_ref):
    x = x_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)  # [TB, 1]
    s = absmax / 127.0 + 1e-8
    q = jnp.clip(jnp.round(x / s), -127, 127)
    q_ref[:] = q.astype(jnp.int8)
    s_ref[:] = jnp.broadcast_to(s, s_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_rows(x: jax.Array, *, interpret: bool = False):
    """x [T, H] (bf16/f32) -> (q int8 [T, H], scale f32 [T, 1]).

    Per-row symmetric absmax quantization, single pass. Rows whose
    absmax is 0 quantize to 0 with the epsilon floor scale.
    """
    t, h = x.shape
    # one row-block when it fits VMEM comfortably (x f32 + q + s);
    # otherwise tile rows. Block row counts must keep the int8 output
    # tile legal: multiples of 32, or the whole array.
    tb = t
    while tb > 32 and tb % 2 == 0 and tb * h * 4 > 6 * 2**20:
        tb //= 2
    grid = (t // tb,) if t % tb == 0 else (1,)
    if t % tb:
        tb = t  # non-power-of-two row count: single block

    q, s = pl.pallas_call(
        _quant_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tb, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((tb, h), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tb, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((t, h), jnp.int8),
                   jax.ShapeDtypeStruct((t, 128), jnp.float32)),
        interpret=interpret,
    )(x)
    return q, s[:, :1]


def quantize_rows_ref(x: jax.Array):
    """XLA reference path (also the off-TPU fallback)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                     keepdims=True)
    s = absmax / 127.0 + 1e-8
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                 -127, 127).astype(jnp.int8)
    return q, s


def quantize_rows_auto(x: jax.Array):
    """Pick the Pallas kernel on TPU (VPQ_ACT_QUANT gates it), the XLA
    chain elsewhere."""
    mode = envs.VPQ_ACT_QUANT
    if mode == "0":
        return quantize_rows_ref(x)
    if mode == "1":
        on_tpu = jax.devices()[0].platform == "tpu"
        return quantize_rows(x, interpret=not on_tpu)
    # auto
    if jax.devices()[0].platform == "tpu" and x.shape[0] >= 8:
        return quantize_rows(x)
    return quantize_rows_ref(x)
