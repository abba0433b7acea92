"""Pipeline parallelism: GPipe wavefront over the "pipe" mesh axis must
reproduce the dense forward exactly — hidden states, logits, and KV
cache contents (role of reference PP tests, distributed/parallel_state
PP groups + send/recv)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
from vllm_pq_tpu.model_loader.loader import load_dummy
from vllm_pq_tpu.parallel.pipeline import (build_pipeline_forward,
                                           shard_stacked,
                                           stack_layer_params)
from vllm_pq_tpu.quantization import get_linear_method

BS = 16          # kv block size
NUM_PAGES = 32   # incl. reserved null page 0


def _setup(cpu_devices, pp, tp):
    cfg = LlamaConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=4,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=128)
    cfg.dtype = jnp.float32
    model = LlamaModel(cfg, get_linear_method(None, {}))
    mesh1 = Mesh(np.array(cpu_devices[:1]).reshape(1, 1),
                 ("data", "model"))
    params = load_dummy(model, mesh1, seed=0)
    return cfg, model, params


def _mb_inputs(M, tm, seqs_per_mb, q_len, bs=BS):
    """M microbatches, each with seqs_per_mb sequences of q_len prompt
    tokens; pages allocated disjointly (page 0 reserved null)."""
    n_pages_seq = -(-q_len // bs)
    max_pages = 8
    tok = np.zeros((M, tm), np.int32)
    pos = np.zeros((M, tm), np.int32)
    slots = np.zeros((M, tm), np.int32)
    kv_lens = np.zeros((M, seqs_per_mb), np.int32)
    cu = np.zeros((M, seqs_per_mb + 1), np.int32)
    pages = np.zeros((M, seqs_per_mb, max_pages), np.int32)
    nseq = np.full((M, 1), seqs_per_mb, np.int32)
    page_ctr = 1
    for m in range(M):
        for s in range(seqs_per_mb):
            lo = s * q_len
            tok[m, lo:lo + q_len] = (7 * m + s + np.arange(q_len)) % 250
            pos[m, lo:lo + q_len] = np.arange(q_len)
            pg = page_ctr + np.arange(n_pages_seq)
            page_ctr += n_pages_seq
            pages[m, s, :n_pages_seq] = pg
            slots[m, lo:lo + q_len] = (pg[np.arange(q_len) // bs] * bs
                                       + np.arange(q_len) % bs)
            kv_lens[m, s] = q_len
            cu[m, s + 1] = (s + 1) * q_len
    assert page_ctr <= NUM_PAGES
    return {k: jnp.asarray(v) for k, v in {
        "token_ids": tok, "positions": pos, "slot_mapping": slots,
        "kv_lens": kv_lens, "cu_q_lens": cu, "page_indices": pages,
        "num_seqs": nseq}.items()}


@pytest.mark.parametrize("pp,tp,M", [(4, 1, 4), (2, 2, 3), (4, 2, 6)])
def test_pipeline_matches_dense(cpu_devices, pp, tp, M):
    cfg, model, params = _setup(cpu_devices, pp, tp)
    kvh, d = cfg.num_key_value_heads, cfg.head_dim
    L = cfg.num_hidden_layers
    tm, seqs_per_mb, q_len = 16, 2, 8
    mb = _mb_inputs(M, tm, seqs_per_mb, q_len)
    rope = model.rope_cache()

    # dense reference: run microbatches sequentially on one device
    kv_dense = [jnp.zeros((NUM_PAGES, BS, 2 * kvh, d), jnp.float32)
                for _ in range(L)]
    ref_hidden = []
    for m in range(M):
        md = {k: mb[k][m] for k in ("slot_mapping", "kv_lens",
                                    "page_indices", "cu_q_lens",
                                    "num_seqs")}
        h, kv_dense = model(params, mb["token_ids"][m],
                            mb["positions"][m], kv_dense, md, rope,
                            tp_axis=None)
        ref_hidden.append(np.asarray(h, np.float32))
    ref_hidden = np.stack(ref_hidden)

    # pipelined over (pipe, model) mesh
    mesh = Mesh(np.array(cpu_devices[:pp * tp]).reshape(pp, tp),
                ("pipe", "model"))
    stacked = stack_layer_params(params)
    kv0 = jnp.zeros((L, NUM_PAGES, BS, 2 * kvh, d), jnp.float32)
    fn, p_specs, kv_spec = build_pipeline_forward(model, mesh,
                                                  block_size=BS)
    stacked, kv0 = shard_stacked(mesh, stacked, p_specs, kv0, kv_spec)
    hidden, kv_new = fn(stacked, kv0, rope, mb)
    got = np.asarray(hidden, np.float32)

    np.testing.assert_allclose(got, ref_hidden, rtol=2e-4, atol=2e-4)

    # KV caches must match layer-for-layer outside the null page
    kv_new = np.asarray(jax.device_get(kv_new))
    for li in range(L):
        np.testing.assert_allclose(kv_new[li][1:],
                                   np.asarray(kv_dense[li])[1:],
                                   rtol=2e-4, atol=2e-4)


def test_pipeline_logits_equality(cpu_devices):
    """End-to-end: pipelined hidden -> logits == dense logits."""
    cfg, model, params = _setup(cpu_devices, 4, 1)
    L, kvh, d = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    mb = _mb_inputs(2, 16, 2, 8)
    rope = model.rope_cache()
    mesh = Mesh(np.array(cpu_devices[:4]).reshape(4, 1),
                ("pipe", "model"))
    stacked = stack_layer_params(params)
    kv0 = jnp.zeros((L, NUM_PAGES, BS, 2 * kvh, d), jnp.float32)
    fn, p_specs, kv_spec = build_pipeline_forward(model, mesh,
                                                  block_size=BS)
    stacked_s, kv0 = shard_stacked(mesh, stacked, p_specs, kv0, kv_spec)
    hidden, _ = fn(stacked_s, kv0, rope, mb)
    h_pp = jnp.asarray(np.asarray(jax.device_get(hidden))
                       .reshape(-1, cfg.hidden_size)[:8], jnp.float32)
    logits_pp = model.compute_logits(params, h_pp, tp_axis=None)

    kv_dense = [jnp.zeros((NUM_PAGES, BS, 2 * kvh, d), jnp.float32)
                for _ in range(L)]
    md = {k: mb[k][0] for k in ("slot_mapping", "kv_lens",
                                "page_indices", "cu_q_lens", "num_seqs")}
    h, _ = model(params, mb["token_ids"][0], mb["positions"][0],
                 kv_dense, md, rope, tp_axis=None)
    logits_ref = model.compute_logits(params, h[:8], tp_axis=None)
    np.testing.assert_allclose(np.asarray(logits_pp),
                               np.asarray(logits_ref),
                               rtol=2e-3, atol=2e-3)
