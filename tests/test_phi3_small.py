"""Phi-3-Small: head-major fused qkv, gegelu MLP, mup scaling, and
blocksparse attention (local + per-head vertical-strided block mask,
reference models/phi3_small.py + attention/ops/blocksparse_attention/
utils.py). Goldened token-exact against a composed torch replica of
the reference math — including the sparse mask on non-dense layers."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

V, H, LAYERS, HEADS, KVH = 256, 32, 2, 4, 2
D = H // HEADS
FFN = 48
BS, LOCAL, VS = 4, 1, 2          # blocksparse block/local/vert_stride
DENSE_N = 2                      # layer 1 (index 1) is dense
MUP_ATTN, MUP_EMB, MUP_W = 1.0, 10.0, 8.0
GLIMIT = 20.0


def _build(tmp_path):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(61)

    def r(*shape, s=0.08):
        return (rng.standard_normal(shape) * s).astype(np.float32)
    out = {"model.embed_tokens.weight": r(V, H),
           "model.final_layernorm.weight": np.ones(H, np.float32),
           "model.final_layernorm.bias": np.zeros(H, np.float32)}
    for li in range(LAYERS):
        o = f"model.layers.{li}."
        out[o + "self_attn.query_key_value.weight"] = \
            r(KVH * (HEADS // KVH + 2) * D, H)
        out[o + "self_attn.query_key_value.bias"] = \
            r(KVH * (HEADS // KVH + 2) * D)
        out[o + "self_attn.dense.weight"] = r(H, H)
        out[o + "self_attn.dense.bias"] = r(H)
        out[o + "mlp.up_proj.weight"] = r(2 * FFN, H)
        out[o + "mlp.up_proj.bias"] = r(2 * FFN)
        out[o + "mlp.down_proj.weight"] = r(H, FFN)
        out[o + "mlp.down_proj.bias"] = r(H)
        out[o + "input_layernorm.weight"] = np.ones(H, np.float32)
        out[o + "input_layernorm.bias"] = np.zeros(H, np.float32)
        out[o + "post_attention_layernorm.weight"] = \
            np.ones(H, np.float32)
        out[o + "post_attention_layernorm.bias"] = \
            np.zeros(H, np.float32)
    dd = tmp_path / "phi3s"
    dd.mkdir()
    save_file(out, str(dd / "model.safetensors"))
    json.dump({"architectures": ["Phi3SmallForCausalLM"],
               "model_type": "phi3small",
               "vocab_size": V, "hidden_size": H,
               "intermediate_size": FFN, "num_hidden_layers": LAYERS,
               "num_attention_heads": HEADS,
               "num_key_value_heads": KVH,
               "layer_norm_epsilon": 1e-5,
               "max_position_embeddings": 64,
               "rope_embedding_base": 10000.0,
               "rope_position_scale": 1.0,
               "hidden_act": "gegelu", "gegelu_limit": GLIMIT,
               "mup_use_scaling": True,
               "mup_attn_multiplier": MUP_ATTN,
               "mup_embedding_multiplier": MUP_EMB,
               "mup_width_multiplier": MUP_W,
               "blocksparse_block_size": BS,
               "blocksparse_num_local_blocks": LOCAL,
               "blocksparse_vert_stride": VS,
               "blocksparse_homo_head_pattern": False,
               "blocksparse_triton_kernel_block_size": BS,
               "dense_attention_every_n_layers": DENSE_N,
               "tie_word_embeddings": True},
              open(dd / "config.json", "w"))
    return dd, out


def _bs_mask(n, head, sparse):
    """reference get_sparse_attn_mask (non-homo) dense mask [n, n]."""
    q = np.arange(n)[:, None]
    k = np.arange(n)[None]
    causal = q >= k
    if not sparse:
        return causal
    qb, kb = q // BS, k // BS
    step = max(1, VS // HEADS)
    vert = (kb + head * step + 1) % VS == 0
    return causal & ((qb - kb < LOCAL) | vert)


def _torch_forward(out, ids):
    """full greedy forward over `ids`, returns last-position logits."""
    ln = torch.nn.functional.layer_norm
    x = torch.tensor(out["model.embed_tokens.weight"])[
        torch.tensor(ids)] * MUP_EMB
    n = len(ids)
    # neox rope
    pos = torch.arange(n, dtype=torch.float32)
    inv = 1.0 / 10000.0 ** (torch.arange(0, D, 2).float() / D)
    ang = pos[:, None] * inv[None]
    cos = torch.cat([ang.cos(), ang.cos()], -1)
    sin = torch.cat([ang.sin(), ang.sin()], -1)

    def rope(u):  # [n, heads, D]
        u1, u2 = u[..., :D // 2], u[..., D // 2:]
        rot = torch.cat([-u2, u1], -1)
        return u * cos[:, None] + rot * sin[:, None]

    rep = HEADS // KVH
    scale = MUP_ATTN / D
    for li in range(LAYERS):
        o = f"model.layers.{li}."
        t = lambda k: torch.tensor(out[o + k])  # noqa: E731
        h = ln(x, (H,), t("input_layernorm.weight"),
               t("input_layernorm.bias"))
        qkv = h @ t("self_attn.query_key_value.weight").T \
            + t("self_attn.query_key_value.bias")
        qkv = qkv.view(n, KVH, rep + 2, D)
        q = qkv[:, :, :rep].reshape(n, HEADS, D)
        k = qkv[:, :, rep]
        v = qkv[:, :, rep + 1]
        q, k = rope(q), rope(k)
        kx = k.repeat_interleave(rep, dim=1)
        vx = v.repeat_interleave(rep, dim=1)
        sparse = (li + 1) % DENSE_N != 0
        outs = []
        for hh in range(HEADS):
            sc = (q[:, hh] @ kx[:, hh].T) * scale
            mask = torch.tensor(_bs_mask(n, hh, sparse))
            sc = sc.masked_fill(~mask, float("-inf"))
            p = torch.softmax(sc, dim=-1)
            outs.append(p @ vx[:, hh])
        att = torch.stack(outs, 1).reshape(n, H)
        x = x + att @ t("self_attn.dense.weight").T \
            + t("self_attn.dense.bias")
        h = ln(x, (H,), t("post_attention_layernorm.weight"),
               t("post_attention_layernorm.bias"))
        gu = h @ t("mlp.up_proj.weight").T + t("mlp.up_proj.bias")
        a, b = gu[..., 0::2], gu[..., 1::2]
        a = a.clamp(max=GLIMIT)
        b = b.clamp(-GLIMIT, GLIMIT)
        act = (a * torch.sigmoid(1.702 * a)) * (b + 1)
        x = x + act @ t("mlp.down_proj.weight").T \
            + t("mlp.down_proj.bias")
    x = ln(x, (H,), torch.tensor(out["model.final_layernorm.weight"]),
           torch.tensor(out["model.final_layernorm.bias"]))
    logits = x @ torch.tensor(out["model.embed_tokens.weight"]).T
    return logits / MUP_W


def test_phi3_small_token_exact_vs_torch(tmp_path):
    from vllm_pq_tpu import LLM, SamplingParams
    d, out = _build(tmp_path)
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    prompt = [7, 19, 3, 101, 55, 40, 2]
    n_gen = 12   # decode crosses several sparse blocks
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(n_gen):
            lg = _torch_forward(out, ids)
            ids.append(int(lg[-1].argmax()))
    exp = ids[len(prompt):]
    got = llm.generate(
        [{"prompt_token_ids": prompt}],
        SamplingParams(temperature=0.0, max_tokens=n_gen,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (got, exp)
