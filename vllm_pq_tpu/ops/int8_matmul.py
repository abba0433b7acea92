"""Pallas weight-only int8 matmul (w8a16): in-register dequant + MXU.

Role of the reference's quantized-GEMM kernel families — tpu_int8's
``quantized_matmul`` (``vllm/model_executor/layers/quantization/
tpu_int8.py:116``) and the Marlin/Machete W8A16 forests
(``csrc/quantization/marlin``) — and the serving matmul for our PQ
int8-resident form (quantization/resident.py).

Why a kernel: ``jnp.dot(x, w.astype(bf16))`` lets XLA materialize the
bf16 weight copy in HBM (round-3 finding for the analogous int8 KV
converts, BENCHMARKS.md), which spends 3x the int8 streaming bytes
(read int8 + write bf16 + read bf16). Here each weight tile converts
int8->bf16 on the VPU *in VMEM* right before feeding the MXU, so HBM
streams exactly 1 byte/weight — the whole point of the int8-resident
form. Per-output-channel scales multiply the f32 accumulator once at
the last K tile.

x [T, K] (bf16/f32) @ w [K, N] int8, scale f32[N] -> [T, N] in x.dtype.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_blk(dim: int, prefs=(512, 256, 128)) -> Optional[int]:
    for b in prefs:
        if dim % b == 0:
            return b
    return None


def supported(k: int) -> bool:
    """The contraction dim must tile exactly (partial K tiles would
    accumulate garbage); T and N tiles may be partial (clipped)."""
    return _pick_blk(k) is not None


def _kernel(x_ref, w_ref, s_ref, o_ref, acc):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    wt = w_ref[...].astype(x_ref.dtype)   # in-register int8 -> bf16
    acc[...] += jax.lax.dot_general(
        x_ref[...], wt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _emit():
        o_ref[...] = (acc[...] * s_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_matmul(x: jax.Array, w: jax.Array, scale: jax.Array,
                *, interpret: bool = False) -> jax.Array:
    """x [..., K] @ (w int8 [K, N] * scale[N]) -> [..., N] (x dtype)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w.shape[1]
    x2 = x.reshape(-1, k)
    t = x2.shape[0]

    k_blk = _pick_blk(k)
    assert k_blk is not None, f"K={k} needs a 128-divisible tiling"
    # wide N tiles: the x block is refetched once per (n, k) grid cell,
    # so x over-traffic = cdiv(N, n_blk) * T * K — at n_blk 256 that
    # measured 4.4 ms for the TinyLlama stack vs 2.4 ms XLA; n_blk 2048
    # caps the over-fetch at ~2x of x (usually << weight bytes)
    n_blk = min(n, 2048)
    t_blk = min(max(t, 8), 256)

    out = pl.pallas_call(
        _kernel,
        grid=(pl.cdiv(t, t_blk), pl.cdiv(n, n_blk), k // k_blk),
        in_specs=[
            pl.BlockSpec((t_blk, k_blk), lambda ti, ni, ki: (ti, ki)),
            pl.BlockSpec((k_blk, n_blk), lambda ti, ni, ki: (ki, ni)),
            pl.BlockSpec((1, n_blk), lambda ti, ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((t_blk, n_blk),
                               lambda ti, ni, ki: (ti, ni)),
        out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((t_blk, n_blk), jnp.float32)],
        interpret=interpret,
    )(x2, w, scale.astype(jnp.float32).reshape(1, n))
    return out.reshape(*lead, n)
