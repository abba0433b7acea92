"""Per-kernel microbenchmarks: decode attention, PQ matmul, KV write,
full fused step. The regression table lives in BENCHMARKS.md; run this on
the real chip after touching any hot kernel.

Role of the reference's kernel benches (``benchmarks/kernels/``) rebuilt
for the TPU hot ops.

Usage:
  python benchmarks/microbench.py attn   [--batch 256] [--ctx 128]
  python benchmarks/microbench.py pq     [--tokens 256]
  python benchmarks/microbench.py kvw    [--batch 256]
  python benchmarks/microbench.py step   [--batch 256] [--pool-blocks N]
  python benchmarks/microbench.py all
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# TinyLlama-1.1B shapes (BASELINE.md staged config #2)
LAYERS = 22
HIDDEN = 2048
INTER = 5632
HQ, KVH, D = 32, 4, 64
VOCAB = 32000
PAGE = 16
HBM_BW = 819e9  # v5e


_SYNC_LAT = None


def _sync(out):
    """Force completion of everything enqueued before ``out``.

    Under the axon tunnel ``block_until_ready`` returns at enqueue time;
    only a device->host transfer actually waits for execution (TPU
    executes one stream in order, so fetching ``out`` fences the queue).
    """
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def _sync_latency() -> float:
    """One-time measurement of the d2h round-trip latency to subtract."""
    global _SYNC_LAT
    if _SYNC_LAT is None:
        x = jnp.zeros((8,), jnp.float32) + 1
        _sync(x)
        t0 = time.perf_counter()
        for _ in range(10):
            _sync(x)
        _SYNC_LAT = (time.perf_counter() - t0) / 10
    return _SYNC_LAT


def _timeit(fn, *args, iters=30, warmup=3):
    lat = _sync_latency()
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return max((time.perf_counter() - t0 - lat) / iters, 0.0)


def bench_attn(batch: int, ctx: int, pool_pages: int = 0):
    """Decode attention, 22-layer chain: pallas kernel vs XLA gather."""
    from vllm_pq_tpu.ops.attention import xla_decode_attention
    from vllm_pq_tpu.ops import rpa_kernel

    rng = np.random.default_rng(0)
    pages_per_seq = max(8, -(-ctx // PAGE))
    pages_per_seq = 1 << (pages_per_seq - 1).bit_length()
    n_pages = pool_pages or (batch * pages_per_seq + 64)
    kv = jnp.asarray(rng.standard_normal(
        (n_pages, PAGE, 2 * KVH, D)).astype(np.float32),
        dtype=jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal(
        (batch, HQ, D)).astype(np.float32), dtype=jnp.bfloat16)
    kv_lens = jnp.full((batch,), ctx, jnp.int32)
    pi = rng.permutation(n_pages - 1)[:batch * pages_per_seq] + 1
    page_indices = jnp.asarray(pi.reshape(batch, pages_per_seq)
                               .astype(np.int32))
    # null-pad pages beyond ctx
    used = -(-ctx // PAGE)
    page_indices = page_indices.at[:, used:].set(0)
    cu = jnp.arange(batch + 1, dtype=jnp.int32)
    ns = jnp.asarray([batch], jnp.int32)
    sm = 1.0 / np.sqrt(D)

    @jax.jit
    def chain_pallas(q, kv):
        o = q
        for _ in range(LAYERS):
            o = rpa_kernel.ragged_paged_attention_pallas(
                o, kv, kv_lens, page_indices, cu, ns, sm_scale=sm,
                decode_mode=True)
        return o

    @functools.partial(jax.jit, static_argnames=("np_",))
    def chain_xla(q, kv, np_):
        o = q
        for _ in range(LAYERS):
            o = xla_decode_attention(o, kv, kv_lens, page_indices,
                                     n_pages=np_, sm_scale=sm)
        return o

    # bytes the chain must read: live KV
    kv_bytes = LAYERS * batch * ctx * 2 * KVH * D * 2
    roof = kv_bytes / HBM_BW
    res = {}
    try:
        t = _timeit(chain_pallas, q, kv)
        res["pallas_ms"] = round(t * 1e3, 3)
    except Exception as e:  # noqa
        res["pallas_ms"] = f"ERR {type(e).__name__}"
    t = _timeit(functools.partial(chain_xla, np_=used), q, kv)
    res["xla_gather_ms"] = round(t * 1e3, 3)
    res.update(batch=batch, ctx=ctx, kv_mb=round(kv_bytes / 2**20, 1),
               roofline_ms=round(roof * 1e3, 3))
    print("attn", json.dumps(res))
    return res


def bench_pq(tokens: int, nbits: int = 8, m: int = 2):
    """PQ dequant-matmul across one full TinyLlama layer stack of
    linears (qkv+o+gate+up+down per layer x 22)."""
    from vllm_pq_tpu.ops.pq_matmul import (pq_dequant_matmul_pallas,
                                           pq_matmul_xla)
    g = 8
    c = 2 ** nbits
    shapes = [(HIDDEN, HQ * D + 2 * KVH * D),   # fused qkv
              (HQ * D, HIDDEN),                 # o
              (HIDDEN, 2 * INTER),              # gate|up
              (INTER, HIDDEN)]                  # down
    rng = np.random.default_rng(0)
    # distinct weights per layer (shared arrays would be CSE'd by XLA)
    stack = []
    codes_bytes = 0
    code_dt = np.uint8 if nbits == 8 else np.int16  # stored codes
    for _ in range(LAYERS):
        layers = []
        for (i, o) in shapes:
            codes = rng.integers(0, c, (m, i // g, o)).astype(code_dt)
            cb = rng.standard_normal((m, c, g)).astype(np.float32)
            sc = rng.standard_normal((o,)).astype(np.float32) * 0.01
            layers.append((jnp.asarray(codes), jnp.asarray(cb),
                           jnp.asarray(sc)))
            codes_bytes += codes.size * codes.itemsize
        stack.append(layers)

    xs = [jnp.asarray(rng.standard_normal((tokens, i)).astype(np.float32),
                      dtype=jnp.bfloat16) for (i, _) in shapes]

    def chain(fn):
        @jax.jit
        def run(xs, stack):
            acc = jnp.zeros((), jnp.float32)
            for layers in stack:
                for x, (codes, cb, sc) in zip(xs, layers):
                    # full-output reduction so nothing is DCE'd
                    acc = acc + fn(x, codes, cb, sc).astype(
                        jnp.float32).sum()
            return acc
        return run

    roof = codes_bytes / HBM_BW
    res = {"tokens": tokens, "nbits": nbits, "m": m,
           "codes_mb": round(codes_bytes / 2**20, 1),
           "roofline_ms": round(roof * 1e3, 3)}
    if nbits == 8:
        for variant in ("packed", "split"):
            try:
                t = _timeit(chain(functools.partial(
                    pq_dequant_matmul_pallas, variant=variant)), xs, stack)
                res[f"pallas_{variant}_ms"] = round(t * 1e3, 3)
            except Exception as e:  # noqa
                res[f"pallas_{variant}_ms"] = f"ERR {type(e).__name__}: {e}"
        # dequant-only chains (window/resident dequant cost)
        from vllm_pq_tpu.ops.pq_matmul import pq_dequant_full_pallas

        def dq_chain(variant):
            @jax.jit
            def run(stack):
                acc = jnp.zeros((), jnp.float32)
                for layers in stack:
                    for (codes, cb, sc) in layers:
                        w = pq_dequant_full_pallas(codes, cb, sc,
                                                   variant=variant)
                        acc = acc + w.astype(jnp.float32)[::64, ::64].sum()
                return acc
            return run
        for variant in ("packed", "split"):
            try:
                t = _timeit(dq_chain(variant), stack)
                res[f"dequant_{variant}_ms"] = round(t * 1e3, 3)
            except Exception as e:  # noqa
                res[f"dequant_{variant}_ms"] = f"ERR {type(e).__name__}: {e}"
    else:
        # 16-bit codebooks: no per-step Pallas path exists — Mosaic's
        # gather is lane-local (128-entry tables; 256 fit via the
        # packed-pair trick, 65536 cannot). Measure the ONE-TIME XLA
        # dequant (the resident/window transcode this format uses).
        from vllm_pq_tpu.quantization.pq import pq_dequantize_ref

        @jax.jit
        def dq16(stack):
            acc = jnp.zeros((), jnp.float32)
            for layers in stack:
                for (codes, cb, sc) in layers:
                    w = pq_dequantize_ref(codes, cb, sc,
                                          out_dtype=jnp.bfloat16)
                    acc = acc + w.astype(jnp.float32)[::64, ::64].sum()
            return acc
        try:
            t = _timeit(dq16, stack, iters=3, warmup=1)
            res["dequant_xla_ms"] = round(t * 1e3, 3)
        except Exception as e:  # noqa
            res["dequant_xla_ms"] = f"ERR {type(e).__name__}: {e}"
    try:
        from vllm_pq_tpu.ops.pq_matmul import pq_matmul
        t = _timeit(chain(pq_matmul), xs, stack)
        res["dispatch_ms"] = round(t * 1e3, 3)
    except Exception as e:  # noqa
        res["dispatch_ms"] = f"ERR {type(e).__name__}: {e}"
    try:
        t = _timeit(chain(pq_matmul_xla), xs, stack)
        res["xla_ms"] = round(t * 1e3, 3)
    except Exception as e:  # noqa
        res["xla_ms"] = f"ERR {type(e).__name__}: {e}"
    print("pq", json.dumps(res))
    return res


def bench_arena(batch: int, ctx: int, int8: bool = False,
                ring_n: int = 32):
    """Decode-window arena attention, 22-layer chain: Pallas flash
    kernel (ops/arena_kernel.py) vs the XLA segmented-softmax path."""
    from vllm_pq_tpu.ops.window_attention import (WindowCache,
                                                  window_attention)
    rng = np.random.default_rng(0)
    s = batch
    kdt = jnp.int8 if int8 else jnp.bfloat16
    if int8:
        aK = jnp.asarray(rng.integers(-127, 128, (s, KVH, ctx, D)),
                         jnp.int8)
        aV = jnp.asarray(rng.integers(-127, 128, (s, KVH, ctx, D)),
                         jnp.int8)
        aKs = jnp.asarray(rng.uniform(0.01, 0.03, (s, KVH, ctx)),
                          jnp.float32)
        aVs = jnp.asarray(rng.uniform(0.01, 0.03, (s, KVH, ctx)),
                          jnp.float32)
    else:
        aK = jnp.asarray(rng.standard_normal((s, KVH, ctx, D)),
                         jnp.bfloat16)
        aV = jnp.asarray(rng.standard_normal((s, KVH, ctx, D)),
                         jnp.bfloat16)
        aKs = jnp.zeros((s, KVH, 0), jnp.float32)
        aVs = jnp.zeros((s, KVH, 0), jnp.float32)
    zero3 = jnp.zeros((0, KVH, D), kdt)
    zscl = jnp.zeros((0, KVH), jnp.float32)
    wc = WindowCache(
        aK=aK, aV=aV, aKs=aKs, aVs=aVs, sK=zero3, sV=zero3, sKs=zscl,
        sVs=zscl,
        ringK=jnp.asarray(rng.standard_normal((ring_n, s, KVH, D)),
                          jnp.bfloat16),
        ringV=jnp.asarray(rng.standard_normal((ring_n, s, KVH, D)),
                          jnp.bfloat16),
        step=jnp.int32(ring_n - 1))
    q = jnp.asarray(rng.standard_normal((s, HQ, D)), jnp.bfloat16)
    base = jnp.full((s,), ctx, jnp.int32)
    sm = 1.0 / np.sqrt(D)

    def mk_chain():
        @jax.jit
        def chain(q, wc, base):
            o = q
            for _ in range(LAYERS):
                o = window_attention(o, wc, base, sm_scale=sm)
            return o
        return chain

    res = {"batch": batch, "ctx": ctx,
           "dtype": "int8" if int8 else "bf16"}
    kv_bytes = LAYERS * s * ctx * 2 * KVH * D * (1 if int8 else 2)
    if int8:
        kv_bytes += LAYERS * s * ctx * 2 * KVH * 4  # scale planes
    res["kv_mb"] = round(kv_bytes / 2**20, 1)
    res["roofline_ms"] = round(kv_bytes / HBM_BW * 1e3, 3)
    os.environ["VPQ_ARENA_KERNEL"] = "0"
    res["xla_ms"] = round(_timeit(mk_chain(), q, wc, base) * 1e3, 3)
    os.environ["VPQ_ARENA_KERNEL"] = "1"
    try:
        res["pallas_ms"] = round(_timeit(mk_chain(), q, wc, base) * 1e3,
                                 3)
    except Exception as e:  # noqa
        res["pallas_ms"] = f"ERR {type(e).__name__}: {e}"
    # lane-packed arena ([S, KVH, CTX, 2D], K|V in one 128-lane group)
    aKV = jnp.concatenate([aK[..., None, :], aV[..., None, :]],
                          axis=3).reshape(s, KVH, ctx, 2 * D)
    import dataclasses
    try:
        wc2 = dataclasses.replace(
            wc, aK=aKV, aV=jnp.zeros((s, KVH, 0, 2 * D), kdt))
    except TypeError:
        wc2 = wc._replace(aK=aKV,
                          aV=jnp.zeros((s, KVH, 0, 2 * D), kdt))
    os.environ["VPQ_ARENA_KERNEL"] = "2"
    try:
        res["packed_ms"] = round(
            _timeit(mk_chain(), q, wc2, base) * 1e3, 3)
    except Exception as e:  # noqa
        res["packed_ms"] = f"ERR {type(e).__name__}: {e}"
    print("arena", json.dumps(res))
    return res


def bench_w8(tokens: int):
    """TinyLlama linear stack (qkv+o+gate_up+down x 22): Pallas w8a16
    (ops/int8_matmul.py) vs XLA astype+dot vs dense bf16."""
    from vllm_pq_tpu.ops.int8_matmul import int8_matmul
    rng = np.random.default_rng(0)
    shapes = [(HIDDEN, HQ * D + 2 * KVH * D), (HQ * D, HIDDEN),
              (HIDDEN, 2 * INTER), (INTER, HIDDEN)]
    ws, scs, wd = [], [], []
    for (i, o) in shapes:
        ws.append(jnp.asarray(rng.integers(-127, 128, (i, o)), jnp.int8))
        scs.append(jnp.asarray(rng.uniform(1e-3, 2e-3, (o,)),
                               jnp.float32))
        wd.append((ws[-1].astype(jnp.float32)
                   * scs[-1][None, :]).astype(jnp.bfloat16))
    x = jnp.asarray(rng.standard_normal((tokens, HIDDEN)), jnp.bfloat16)
    params = sum(i * o for i, o in shapes) * LAYERS

    def layer(x, mm):
        qkv = mm(x, 0)
        o = mm(qkv[:, :HQ * D], 1)
        gu = mm(o, 2)
        return mm(gu[:, :INTER], 3)

    @jax.jit
    def chain_pallas(x):
        for _ in range(LAYERS):
            x = layer(x, lambda h, i: int8_matmul(h, ws[i], scs[i]))
        return x

    @jax.jit
    def chain_xla_int8(x):
        def mm(h, i):
            y = jnp.dot(h, ws[i].astype(h.dtype),
                        preferred_element_type=jnp.float32)
            return (y * scs[i][None, :]).astype(h.dtype)
        for _ in range(LAYERS):
            x = layer(x, mm)
        return x

    @jax.jit
    def chain_dense(x):
        def mm(h, i):
            return jnp.dot(h, wd[i], preferred_element_type=jnp.float32
                           ).astype(h.dtype)
        for _ in range(LAYERS):
            x = layer(x, mm)
        return x

    @jax.jit
    def chain_w8a8(x):
        def mm(h, i):
            absmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
            sx = (absmax / 127.0 + 1e-8).astype(jnp.float32)
            xq = jnp.clip(jnp.round(h.astype(jnp.float32) / sx),
                          -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, ws[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * sx
                    * scs[i][None, :]).astype(h.dtype)
        for _ in range(LAYERS):
            x = layer(x, mm)
        return x

    res = {"tokens": tokens, "params_g": round(params / 1e9, 3),
           "int8_roofline_ms": round(params / HBM_BW * 1e3, 3),
           "bf16_roofline_ms": round(2 * params / HBM_BW * 1e3, 3)}
    try:
        res["pallas_w8a16_ms"] = round(_timeit(chain_pallas, x) * 1e3, 3)
    except Exception as e:  # noqa
        res["pallas_w8a16_ms"] = f"ERR {type(e).__name__}: {e}"
    res["xla_int8_ms"] = round(_timeit(chain_xla_int8, x) * 1e3, 3)
    res["dense_bf16_ms"] = round(_timeit(chain_dense, x) * 1e3, 3)
    res["xla_w8a8_ms"] = round(_timeit(chain_w8a8, x) * 1e3, 3)
    print("w8", json.dumps(res))
    return res


def bench_onehot():
    """MXU one-hot dequant for 2x8 codes (VERDICT r3 #2): build a
    [codes, 256] one-hot on the VPU, contract against the codebook on
    the MXU. Measured per-linear on the TinyLlama qkv shape; reported
    as G weights/s next to the packed-gather Pallas dequant."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from vllm_pq_tpu.ops.pq_matmul import pq_dequant_full_pallas

    rng = np.random.default_rng(0)
    J, O, G = HIDDEN // 8, 2048, 8          # qkv-ish linear, 2x8 PQ
    REPS = 16                               # amortize dispatch overhead
    codes_list = [jnp.asarray(rng.integers(0, 256, (2, J, O)),
                              jnp.uint8) for _ in range(REPS)]
    codes = codes_list[0]
    cbs = jnp.asarray(rng.standard_normal((2, 256, G)), jnp.bfloat16)
    scales = jnp.ones((O,), jnp.float32)

    TJ = 32

    def kernel(codes_ref, cb_ref, o_ref):
        acc = None
        for k in range(2):
            c = codes_ref[k].astype(jnp.int32)          # [TJ, 128]
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (TJ, 128, 256), 2)
            oh = (c[:, :, None] == iota).astype(jnp.bfloat16)
            wk = jax.lax.dot_general(
                oh.reshape(TJ * 128, 256), cb_ref[k],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = wk if acc is None else acc + wk
        o_ref[...] = acc.reshape(TJ, 128, G).astype(jnp.bfloat16)

    def onehot_one(codes, cbs):
        return pl.pallas_call(
            kernel,
            grid=(J // TJ, O // 128),
            in_specs=[
                pl.BlockSpec((2, TJ, 128), lambda j, o: (0, j, o)),
                pl.BlockSpec((2, 256, G), lambda j, o: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((TJ, 128, G),
                                   lambda j, o: (j, o, 0)),
            out_shape=jax.ShapeDtypeStruct((J, O, G), jnp.bfloat16),
        )(codes, cbs)

    @jax.jit
    def onehot_chain(codes_list, cbs):
        return [onehot_one(c, cbs) for c in codes_list]

    weights = J * O * G * REPS
    res = {"weights_m": round(weights / 1e6, 2)}
    try:
        t = _timeit(onehot_chain, codes_list, cbs)
        res["onehot_pallas_ms"] = round(t * 1e3, 3)
        res["onehot_gw_s"] = round(weights / t / 1e9, 1)
    except Exception as e:  # noqa
        res["onehot_pallas_ms"] = f"ERR {type(e).__name__}: {e}"

    @jax.jit
    def gather_chain(codes_list, cbs, scales):
        return [pq_dequant_full_pallas(c, cbs, scales)
                for c in codes_list]

    try:
        t = _timeit(gather_chain, codes_list, cbs, scales)
        res["gather_pallas_ms"] = round(t * 1e3, 3)
        res["gather_gw_s"] = round(weights / t / 1e9, 1)
    except Exception as e:  # noqa
        res["gather_pallas_ms"] = f"ERR {type(e).__name__}: {e}"
    print("onehot", json.dumps(res))
    return res


def bench_tstep(batch: int, ctx: int = 256, iters_in_graph: int = 4):
    """Row-major vs batch-minor (transposed) decode-iteration body.

    The optimized multistep HLO carries ~6.8k layout copies per window
    (5.8 GiB): the w8a8 dots produce hidden [s,h]{1,0} while XLA lays
    rope/attention out batch-minor {0,1}, paying [256,2048] transposes
    around every layer's attention (BENCHMARKS.md r4 §5, VERDICT r4
    weak #4). The transposed body computes y^T = W^T @ x^T end-to-end:
    every tensor is s-minor, so the dots' natural row-major outputs ARE
    the layout attention wants and the copies vanish by construction.
    Full per-iteration body: rms -> w8a8 qkv -> rope -> ring append ->
    int8-arena attention (segmented softmax) -> o -> w8a8 swiglu mlp ->
    residuals -> lm_head -> argmax -> next-token embedding feedback."""
    rng = np.random.default_rng(0)
    s, g, r, d, h, inter = batch, KVH, HQ // KVH, D, HIDDEN, INTER
    n_ring = iters_in_graph
    sm = 1.0 / np.sqrt(d)

    def w8(i, o):
        return (jnp.asarray(rng.integers(-127, 128, (i, o)), jnp.int8),
                jnp.asarray(np.abs(rng.standard_normal(o)) * 0.02 + 1e-3,
                            jnp.float32))

    layers = []
    for _ in range(LAYERS):
        layers.append({
            "ln1": jnp.ones((h,), jnp.float32),
            "ln2": jnp.ones((h,), jnp.float32),
            "q": w8(h, HQ * d), "k": w8(h, g * d), "v": w8(h, g * d),
            "o": w8(HQ * d, h),
            "gate": w8(h, inter), "up": w8(h, inter), "down": w8(inter, h),
        })
    embed = jnp.asarray(rng.standard_normal((VOCAB, h)) * 0.02,
                        jnp.bfloat16)
    lm = jnp.asarray(rng.standard_normal((h, VOCAB)) * 0.02, jnp.bfloat16)
    fnorm = jnp.ones((h,), jnp.float32)
    # int8 arena (static in this chain, as within a real window) + ring
    aK = jnp.asarray(rng.integers(-127, 128, (s, g, ctx, d)), jnp.int8)
    aV = jnp.asarray(rng.integers(-127, 128, (s, g, ctx, d)), jnp.int8)
    aKs = jnp.asarray(np.abs(rng.standard_normal((s, g, ctx))) * 0.02,
                      jnp.float32)
    aVs = jnp.asarray(np.abs(rng.standard_normal((s, g, ctx))) * 0.02,
                      jnp.float32)
    base_lens = jnp.full((s,), ctx - n_ring - 1, jnp.int32)
    rope_t = np.concatenate([
        np.cos(np.arange(4096)[:, None]
               / 10000.0 ** (np.arange(d // 2) * 2 / d)[None, :]),
        np.sin(np.arange(4096)[:, None]
               / 10000.0 ** (np.arange(d // 2) * 2 / d)[None, :])], 1)
    rope = jnp.asarray(rope_t, jnp.float32)          # [pos, d] cos|sin
    tok0 = jnp.asarray(rng.integers(0, VOCAB, s), jnp.int32)
    pos0 = base_lens

    def quant_rows(x, axis):
        ax = jnp.max(jnp.abs(x), axis=axis, keepdims=True) / 127.0 + 1e-8
        return (jnp.round(x / ax).astype(jnp.int8),
                ax.astype(jnp.float32))

    def rot_half(u, axis):
        half = u.shape[axis] // 2
        lo = jax.lax.slice_in_dim(u, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(u, half, 2 * half, axis=axis)
        return jnp.concatenate([-hi, lo], axis=axis)

    # ---------------- row-major body (the current model's shape) -----
    def step_row(e, tok, pos, ringK, ringV, j):
        x = e["embed"][tok]                               # [s, h]
        cs = e["rope"][pos]                               # [s, d]
        cos = jnp.concatenate([cs[:, :d // 2], cs[:, :d // 2]], 1)
        sin = jnp.concatenate([cs[:, d // 2:], cs[:, d // 2:]], 1)

        def lin(L, wname, xin):
            w, sc = L[wname]
            xq, sx = quant_rows(xin, 1)
            acc = jax.lax.dot_general(
                xq, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * sx
                    * sc[None, :]).astype(jnp.bfloat16)

        def rms(xin, wn):
            x32 = xin.astype(jnp.float32)
            nx = x32 * jax.lax.rsqrt(
                jnp.mean(x32 * x32, -1, keepdims=True) + 1e-5)
            return (nx * wn).astype(jnp.bfloat16)

        for li, L in enumerate(e["layers"]):
            hn = rms(x, L["ln1"])
            q = lin(L, "q", hn).reshape(s, HQ, d)
            k = lin(L, "k", hn).reshape(s, g, d)
            v = lin(L, "v", hn).reshape(s, g, d)
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            q = (qf * cos[:, None, :] + rot_half(qf, 2) * sin[:, None, :])
            k = (kf * cos[:, None, :] + rot_half(kf, 2)
                 * sin[:, None, :]).astype(jnp.bfloat16)
            rK = jax.lax.dynamic_update_slice(
                ringK[li], k[None], (j, 0, 0, 0))
            rV = jax.lax.dynamic_update_slice(
                ringV[li], v[None], (j, 0, 0, 0))
            qh = (q * sm).astype(jnp.bfloat16).reshape(s, g, r, d)
            sc_a = jnp.einsum("sgrd,sgld->sgrl", qh.astype(jnp.float32),
                              e["aK"].astype(jnp.float32),
                              preferred_element_type=jnp.float32)
            sc_a = sc_a * e["aKs"][:, :, None, :]
            sc_r = jnp.einsum("sgrd,nsgd->sgrn", qh, rK,
                              preferred_element_type=jnp.float32)
            apos = jnp.arange(ctx, dtype=jnp.int32)[None, :]
            valid_a = apos < e["base_lens"][:, None]
            valid_r = (jnp.arange(n_ring, dtype=jnp.int32)[None, :]
                       <= j)
            sc_a = jnp.where(valid_a[:, None, None, :], sc_a, -1e30)
            sc_r = jnp.where(valid_r[:, None, None, :], sc_r, -1e30)
            gmax = jnp.maximum(sc_a.max(-1), sc_r.max(-1))[..., None]
            ea = jnp.exp(sc_a - gmax)
            er = jnp.exp(sc_r - gmax)
            den = (ea.sum(-1) + er.sum(-1))[..., None]
            pa = (ea / den) * e["aVs"][:, :, None, :]
            pr = er / den
            out = jnp.einsum("sgrl,sgld->sgrd", pa.astype(jnp.bfloat16),
                             e["aV"].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            out = out + jnp.einsum("sgrn,nsgd->sgrd",
                                   pr.astype(jnp.bfloat16), rV,
                                   preferred_element_type=jnp.float32)
            o = lin(L, "o", out.astype(jnp.bfloat16).reshape(s, HQ * d))
            x = x + o
            hn = rms(x, L["ln2"])
            act = (jax.nn.silu(lin(L, "gate", hn).astype(jnp.float32))
                   * lin(L, "up", hn).astype(jnp.float32)).astype(
                       jnp.bfloat16)
            x = x + lin(L, "down", act)
            ringK = [rK if i == li else ringK[i] for i in range(LAYERS)]
            ringV = [rV if i == li else ringV[i] for i in range(LAYERS)]
        xn = rms(x, e["fnorm"])
        logits = jnp.dot(xn, e["lm"], preferred_element_type=jnp.float32)
        tok = jnp.argmax(logits, axis=1).astype(jnp.int32)
        return tok, pos + 1, ringK, ringV

    # ------- row-major, layout-island-free body (nc = no-concat rope,
    # 3D qkv dots, direct 4D o-proj contraction). Hypothesis: the 6.8k
    # copies come from (a) the rope concat (XLA avoids minor-dim concats
    # by laying the fusion out batch-minor, then pays transposes in and
    # out) and (b) the [s,g,r,64]<->[s,2048] reshapes (retiling: a 64-
    # lane minor dim pads to 128). Fixes: rotate_half as a constant
    # [d,d] signed-permutation MATMUL (no concat; MXU is idle during
    # bandwidth-bound decode so the extra 67 MFLOP rides free), qkv dots
    # emitting [s, H, d] DIRECTLY (the dot writes the padded tile
    # natively instead of a copy retiling it), and the o projection
    # contracting (g, r, d) in one dot_general (no 2D reshape).
    h2 = d // 2
    P_rot = np.zeros((d, d), np.float32)
    for j in range(h2):
        P_rot[h2 + j, j] = -1.0
        P_rot[j, h2 + j] = 1.0
    P_rot_bf = jnp.asarray(P_rot, jnp.bfloat16)
    layers_nc = []
    for L in layers:
        Lq = dict(L)
        # 3D weight views: [h, Hq, d] / [Hq, d] scales; o as [g, r, d, h]
        Lq["q3"] = (L["q"][0].reshape(h, HQ, d), L["q"][1].reshape(HQ, d))
        Lq["k3"] = (L["k"][0].reshape(h, g, d), L["k"][1].reshape(g, d))
        Lq["v3"] = (L["v"][0].reshape(h, g, d), L["v"][1].reshape(g, d))
        Lq["o4"] = (L["o"][0].reshape(g, r, d, h), L["o"][1])
        layers_nc.append(Lq)

    def step_nc(e, tok, pos, ringK, ringV, j):
        x = e["embed"][tok]                               # [s, h]
        cs = e["rope"][pos]                               # [s, d]
        cos = jnp.concatenate([cs[:, :d // 2], cs[:, :d // 2]], 1)
        sin = jnp.concatenate([cs[:, d // 2:], cs[:, d // 2:]], 1)

        def lin3(L, wname, xin):
            w, sc = L[wname]                              # [h, H, d]
            xq, sx = quant_rows(xin, 1)
            acc = jax.lax.dot_general(
                xq, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)         # [s, H, d]
            return (acc.astype(jnp.float32) * sx[..., None]
                    * sc[None]).astype(jnp.bfloat16)

        def lin(L, wname, xin):
            w, sc = L[wname]
            xq, sx = quant_rows(xin, 1)
            acc = jax.lax.dot_general(
                xq, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * sx
                    * sc[None, :]).astype(jnp.bfloat16)

        def rms(xin, wn):
            x32 = xin.astype(jnp.float32)
            nx = x32 * jax.lax.rsqrt(
                jnp.mean(x32 * x32, -1, keepdims=True) + 1e-5)
            return (nx * wn).astype(jnp.bfloat16)

        def rope_nc(u):                                   # [s, H, d] bf16
            rot = jnp.einsum("shd,de->she", u, P_rot_bf,
                             preferred_element_type=jnp.float32)
            return (u.astype(jnp.float32) * cos[:, None, :]
                    + rot * sin[:, None, :])

        for li, L in enumerate(e["layers_nc"]):
            hn = rms(x, L["ln1"])
            q = lin3(L, "q3", hn)                         # [s, HQ, d]
            k = lin3(L, "k3", hn)                         # [s, g, d]
            v = lin3(L, "v3", hn)
            q = rope_nc(q)
            k = rope_nc(k).astype(jnp.bfloat16)
            rK = jax.lax.dynamic_update_slice(
                ringK[li], k[None], (j, 0, 0, 0))
            rV = jax.lax.dynamic_update_slice(
                ringV[li], v[None], (j, 0, 0, 0))
            qh = (q * sm).astype(jnp.bfloat16).reshape(s, g, r, d)
            sc_a = jnp.einsum("sgrd,sgld->sgrl", qh.astype(jnp.float32),
                              e["aK"].astype(jnp.float32),
                              preferred_element_type=jnp.float32)
            sc_a = sc_a * e["aKs"][:, :, None, :]
            sc_r = jnp.einsum("sgrd,nsgd->sgrn", qh, rK,
                              preferred_element_type=jnp.float32)
            apos = jnp.arange(ctx, dtype=jnp.int32)[None, :]
            valid_a = apos < e["base_lens"][:, None]
            valid_r = (jnp.arange(n_ring, dtype=jnp.int32)[None, :]
                       <= j)
            sc_a = jnp.where(valid_a[:, None, None, :], sc_a, -1e30)
            sc_r = jnp.where(valid_r[:, None, None, :], sc_r, -1e30)
            gmax = jnp.maximum(sc_a.max(-1), sc_r.max(-1))[..., None]
            ea = jnp.exp(sc_a - gmax)
            er = jnp.exp(sc_r - gmax)
            den = (ea.sum(-1) + er.sum(-1))[..., None]
            pa = (ea / den) * e["aVs"][:, :, None, :]
            pr = er / den
            out = jnp.einsum("sgrl,sgld->sgrd", pa.astype(jnp.bfloat16),
                             e["aV"].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            out = out + jnp.einsum("sgrn,nsgd->sgrd",
                                   pr.astype(jnp.bfloat16), rV,
                                   preferred_element_type=jnp.float32)
            # o projection straight off [s, g, r, d]: quantize over the
            # flattened contraction dims without materializing 2D
            ob = out.astype(jnp.bfloat16)
            w4, sc4 = L["o4"]
            ax = jnp.max(jnp.abs(ob), axis=(1, 2, 3),
                         keepdims=True) / 127.0 + 1e-8
            oq = jnp.round(ob / ax).astype(jnp.int8)
            acc = jax.lax.dot_general(
                oq, w4, (((1, 2, 3), (0, 1, 2)), ((), ())),
                preferred_element_type=jnp.int32)          # [s, h]
            o = (acc.astype(jnp.float32) * ax[:, :, 0, 0]
                 * sc4[None, :]).astype(jnp.bfloat16)
            x = x + o
            hn = rms(x, L["ln2"])
            act = (jax.nn.silu(lin(L, "gate", hn).astype(jnp.float32))
                   * lin(L, "up", hn).astype(jnp.float32)).astype(
                       jnp.bfloat16)
            x = x + lin(L, "down", act)
            ringK = [rK if i == li else ringK[i] for i in range(LAYERS)]
            ringV = [rV if i == li else ringV[i] for i in range(LAYERS)]
        xn = rms(x, e["fnorm"])
        logits = jnp.dot(xn, e["lm"], preferred_element_type=jnp.float32)
        tok = jnp.argmax(logits, axis=1).astype(jnp.int32)
        return tok, pos + 1, ringK, ringV

    # ---------------- transposed body (batch-minor end-to-end) -------
    embedT = embed.T                                      # [h, vocab]
    ropeT = rope.T                                        # [d, pos]
    aKT = jnp.transpose(aK, (1, 2, 3, 0))                 # [g, l, d, s]
    aVT = jnp.transpose(aV, (1, 2, 3, 0))
    aKsT = jnp.transpose(aKs, (1, 2, 0))                  # [g, l, s]
    aVsT = jnp.transpose(aVs, (1, 2, 0))

    def step_t(e, tok, pos, ringK, ringV, j):
        x = jnp.take(e["embedT"], tok, axis=1)            # [h, s]
        cs = jnp.take(e["ropeT"], pos, axis=1)            # [d, s]
        cos = jnp.concatenate([cs[:d // 2], cs[:d // 2]], 0)
        sin = jnp.concatenate([cs[d // 2:], cs[d // 2:]], 0)

        def lin(L, wname, xin):
            w, sc = L[wname]                              # [i, o]
            xq, sx = quant_rows(xin, 0)                   # [i, s], [1, s]
            acc = jax.lax.dot_general(
                w, xq, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)         # [o, s]
            return (acc.astype(jnp.float32) * sx
                    * sc[:, None]).astype(jnp.bfloat16)

        def rms(xin, wn):
            x32 = xin.astype(jnp.float32)
            nx = x32 * jax.lax.rsqrt(
                jnp.mean(x32 * x32, 0, keepdims=True) + 1e-5)
            return (nx * wn[:, None]).astype(jnp.bfloat16)

        for li, L in enumerate(e["layers"]):
            hn = rms(x, L["ln1"])
            q = lin(L, "q", hn).reshape(g, r, d, s)
            k = lin(L, "k", hn).reshape(g, d, s)
            v = lin(L, "v", hn).reshape(g, d, s)
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            q = qf * cos[None, None] + rot_half(qf, 2) * sin[None, None]
            k = (kf * cos[None] + rot_half(kf, 1)
                 * sin[None]).astype(jnp.bfloat16)
            rK = jax.lax.dynamic_update_slice(
                ringK[li], k[None], (j, 0, 0, 0))
            rV = jax.lax.dynamic_update_slice(
                ringV[li], v[None], (j, 0, 0, 0))
            qh = (q * sm).astype(jnp.bfloat16)            # [g, r, d, s]
            sc_a = jnp.einsum("grds,glds->grls",
                              qh.astype(jnp.float32),
                              e["aKT"].astype(jnp.float32),
                              preferred_element_type=jnp.float32)
            sc_a = sc_a * e["aKsT"][:, None]
            sc_r = jnp.einsum("grds,ngds->grns", qh, rK,
                              preferred_element_type=jnp.float32)
            apos = jnp.arange(ctx, dtype=jnp.int32)[:, None]
            valid_a = apos < e["base_lens"][None, :]      # [l, s]
            valid_r = (jnp.arange(n_ring, dtype=jnp.int32)[:, None]
                       <= j)
            sc_a = jnp.where(valid_a[None, None], sc_a, -1e30)
            sc_r = jnp.where(jnp.broadcast_to(
                valid_r[None, None], sc_r.shape), sc_r, -1e30)
            gmax = jnp.maximum(sc_a.max(2), sc_r.max(2))[:, :, None]
            ea = jnp.exp(sc_a - gmax)
            er = jnp.exp(sc_r - gmax)
            den = (ea.sum(2) + er.sum(2))[:, :, None]
            pa = (ea / den) * e["aVsT"][:, None]
            pr = er / den
            out = jnp.einsum("grls,glds->grds", pa.astype(jnp.bfloat16),
                             e["aVT"].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            out = out + jnp.einsum("grns,ngds->grds",
                                   pr.astype(jnp.bfloat16), rV,
                                   preferred_element_type=jnp.float32)
            o = lin(L, "o", out.astype(jnp.bfloat16).reshape(HQ * d, s))
            x = x + o
            hn = rms(x, L["ln2"])
            act = (jax.nn.silu(lin(L, "gate", hn).astype(jnp.float32))
                   * lin(L, "up", hn).astype(jnp.float32)).astype(
                       jnp.bfloat16)
            x = x + lin(L, "down", act)
            ringK = [rK if i == li else ringK[i] for i in range(LAYERS)]
            ringV = [rV if i == li else ringV[i] for i in range(LAYERS)]
        xn = rms(x, e["fnorm"])
        logits = jax.lax.dot_general(
            e["lm"], xn, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [v, s]
        tok = jnp.argmax(logits, axis=0).astype(jnp.int32)
        return tok, pos + 1, ringK, ringV

    # Weights/arenas must be jit ARGUMENTS: as closure constants they
    # serialize into the HLO shipped to the remote compile service
    # (hundreds of MB -> broken pipe on the tunnel).
    env = {"layers": layers, "layers_nc": layers_nc, "embed": embed,
           "lm": lm, "fnorm": fnorm,
           "aK": aK, "aV": aV, "aKs": aKs, "aVs": aVs,
           "aKT": aKT, "aVT": aVT, "aKsT": aKsT, "aVsT": aVsT,
           "rope": rope, "ropeT": ropeT, "embedT": embedT,
           "base_lens": base_lens}

    def mk_chain(step, ring_shape):
        @jax.jit
        def run(e, tok, pos):
            ringK = [jnp.zeros(ring_shape, jnp.bfloat16)
                     for _ in range(LAYERS)]
            ringV = [jnp.zeros(ring_shape, jnp.bfloat16)
                     for _ in range(LAYERS)]
            for j in range(iters_in_graph):
                tok, pos, ringK, ringV = step(e, tok, pos, ringK,
                                              ringV, j)
            return tok
        return run

    run_row = mk_chain(step_row, (n_ring, s, g, d))
    run_t = mk_chain(step_t, (n_ring, g, d, s))
    run_nc = mk_chain(step_nc, (n_ring, s, g, d))

    # equivalence check (same math transposed): tiny tolerance on token
    # ids after a couple iterations would need exact argmax ties; check
    # throughput only, correctness is covered by the integration tests.
    res = {}
    t_row = _timeit(run_row, env, tok0, pos0, iters=8)
    res["row_ms_per_iter"] = round(t_row * 1e3 / iters_in_graph, 3)
    t_nc = _timeit(run_nc, env, tok0, pos0, iters=8)
    res["nc_ms_per_iter"] = round(t_nc * 1e3 / iters_in_graph, 3)
    t_t = _timeit(run_t, env, tok0, pos0, iters=8)
    res["transposed_ms_per_iter"] = round(t_t * 1e3 / iters_in_graph, 3)
    res.update(batch=batch, ctx=ctx, n=iters_in_graph)
    print("tstep", json.dumps(res))
    return res


def bench_kvw(batch: int, pool_pages: int = 4160):
    from vllm_pq_tpu.ops.attention import write_kv_cache
    rng = np.random.default_rng(0)
    kv = jnp.zeros((pool_pages, PAGE, 2 * KVH, D), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, KVH, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((batch, KVH, D)), jnp.bfloat16)
    slots = jnp.asarray(
        rng.choice(pool_pages * PAGE, batch, replace=False).astype(np.int32))

    @jax.jit
    def chain(kv, k, v, slots):
        for _ in range(LAYERS):
            kv = write_kv_cache(kv, k, v, slots)
        return kv

    t = _timeit(chain, kv, k, v, slots)
    print("kvw", json.dumps({
        "batch": batch, "pool_pages": pool_pages,
        "chain_ms": round(t * 1e3, 3)}))


def bench_step(batch: int, pool_blocks: int = 0, backend: str = ""):
    """Full fused decode step through the real engine (one chip)."""
    if backend:
        os.environ["VPQ_ATTENTION_BACKEND"] = backend
    import tempfile

    from vllm_pq_tpu import LLM, SamplingParams
    on_tpu = jax.devices()[0].platform == "tpu"
    model_cfg = {
        "architectures": ["LlamaForCausalLM"],
        "vocab_size": VOCAB, "hidden_size": HIDDEN,
        "intermediate_size": INTER, "num_hidden_layers": LAYERS,
        "num_attention_heads": HQ, "num_key_value_heads": KVH,
        "rms_norm_eps": 1e-5, "max_position_embeddings": 2048,
    }
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(model_cfg, f)
    pool = pool_blocks or batch * (256 // PAGE) + 64
    llm = LLM(model=d, load_format="dummy", dtype="bfloat16",
              quantization="pq", max_model_len=256, max_num_seqs=batch,
              max_num_batched_tokens=2048, block_size=PAGE,
              num_kv_blocks=pool, enable_prefix_caching=True)
    rng = np.random.default_rng(0)
    prompts = [{"prompt_token_ids":
                rng.integers(10, VOCAB - 10, 32).tolist()}
               for _ in range(batch)]
    sp = SamplingParams(temperature=0.0, max_tokens=128, ignore_eos=True)
    eng = llm.llm_engine
    for i, p in enumerate(prompts):
        eng.add_request(f"b{i}", p, sp)
    while True:
        sched = eng.engine_core.scheduler
        if (len(sched.waiting) == 0 and sched.running and
                all(r.num_computed_tokens >= r.num_prompt_tokens
                    for r in sched.running)):
            break
        eng.step()
    for _ in range(4):
        eng.step()
    n_steps = 40
    t0 = time.perf_counter()
    for _ in range(n_steps):
        eng.step()
    dt = (time.perf_counter() - t0) / n_steps
    print("step", json.dumps({
        "batch": batch, "pool_blocks": pool, "backend": backend or "default",
        "step_ms": round(dt * 1e3, 2),
        "tok_s": round(batch / dt, 1)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["attn", "arena", "pq", "w8",
                                      "onehot", "kvw", "step", "tstep",
                                      "all"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--ctx", type=int, default=128)
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--nbits", type=int, default=8)
    ap.add_argument("--m", type=int, default=2)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--pool-blocks", type=int, default=0)
    ap.add_argument("--backend", default="")
    args = ap.parse_args()
    if args.which in ("attn", "all"):
        bench_attn(args.batch, args.ctx)
    if args.which == "arena":
        bench_arena(args.batch, args.ctx, int8=args.int8)
    if args.which == "all":
        bench_arena(args.batch, args.ctx, int8=False)
        bench_arena(args.batch, args.ctx, int8=True)
    if args.which in ("pq", "all"):
        bench_pq(args.tokens, args.nbits, args.m)
    if args.which in ("w8", "all"):
        bench_w8(args.tokens)
    if args.which in ("onehot", "all"):
        bench_onehot()
    if args.which in ("kvw", "all"):
        bench_kvw(args.batch)
    if args.which == "step":
        bench_step(args.batch, args.pool_blocks, args.backend)
    if args.which == "tstep":
        bench_tstep(args.batch, args.ctx)


if __name__ == "__main__":
    main()
