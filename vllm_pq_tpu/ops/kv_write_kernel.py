"""Pallas KV-cache write: scatter new K/V rows into the paged cache by
direct per-token DMA (role of reference ``reshape_and_cache_flash``,
``csrc/cache_kernels.cu:411``).

XLA's scatter lowering on TPU is catastrophically slow for this access
pattern (measured ~0.5 ms per layer at batch 256 — 50x the bytes-moved
cost); this kernel instead issues one small VMEM->HBM DMA per token into
``cache[page, offset]`` with the cache aliased in place
(input_output_aliases), all copies in flight simultaneously.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kvw_kernel(slots_ref, kv_new_ref, cache_in_ref, cache_ref, sem, *,
                page_size: int, t: int):
    def copy(i):
        s = slots_ref[i]
        return pltpu.make_async_copy(
            kv_new_ref.at[i],
            cache_ref.at[s // page_size, s % page_size],
            sem,
        )

    if t <= 512:
        # fully unrolled: all copies in flight simultaneously
        for i in range(t):
            copy(i).start()
        for i in range(t):
            copy(i).wait()
        return

    # large row counts (window fold: N*S rows): fori-loop with a
    # sliding in-flight window so code size and outstanding-DMA count
    # stay bounded
    lag = 256

    def body(i, _):
        copy(i).start()

        @pl.when(i >= lag)
        def _():
            copy(i - lag).wait()
        return 0

    jax.lax.fori_loop(0, t, body, 0)

    def tail(i, _):
        copy(i).wait()
        return 0

    jax.lax.fori_loop(max(t - lag, 0), t, tail, 0)


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("interpret",))
def kv_write_pallas(kv_cache: jax.Array, kv_new: jax.Array,
                    slot_mapping: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """kv_cache [P, ps, C, D] (donated); kv_new [T, C, D];
    slot_mapping i32[T] (page*ps + offset; duplicates only on the null
    page 0, where garbage is tolerated)."""
    p, ps, c, d = kv_cache.shape
    t = kv_new.shape[0]
    # lane-pack (C, D) into 128-wide groups so per-token DMA slices are
    # tile-aligned (same trick as the attention kernel for D < 128)
    flat = c * d
    assert flat % 128 == 0, (c, d)
    cw = flat // 128
    cache2 = kv_cache.reshape(p, ps, cw, 128)
    kv2 = kv_new.astype(kv_cache.dtype).reshape(t, cw, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((t, cw, 128), lambda *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    kernel = functools.partial(_kvw_kernel, page_size=ps, t=t)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache2.shape, cache2.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(slot_mapping, kv2, cache2)
    return out.reshape(p, ps, c, d)
