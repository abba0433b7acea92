"""GGUF converter (model_loader/gguf_convert.py): block-dequant known
vectors, and an end-to-end F32 GGUF -> convert -> generate == HF
golden round trip (reference gguf ingestion role)."""

import json
import struct

import numpy as np
import pytest

from vllm_pq_tpu.model_loader.gguf_convert import (GGML_F32, GGML_Q4_0,
                                                   GGML_Q8_0, convert,
                                                   dequantize, read_gguf)

torch = pytest.importorskip("torch")


# -- minimal GGUF v3 writer (spec: ggml.h / gguf.md) ---------------------

def _w_str(s):
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _w_kv_u32(k, v):
    return _w_str(k) + struct.pack("<I", 4) + struct.pack("<I", v)


def _w_kv_f32(k, v):
    return _w_str(k) + struct.pack("<I", 6) + struct.pack("<f", v)


def _w_kv_str(k, v):
    return _w_str(k) + struct.pack("<I", 8) + _w_str(v)


def write_gguf(path, meta_u32, meta_f32, meta_str, tensors):
    """tensors: list of (name, np f32 array, ggml_type). Only F32/Q8_0
    payloads are encodable here."""
    align = 32
    header = b"GGUF" + struct.pack("<IQQ", 3, len(tensors),
                                   len(meta_u32) + len(meta_f32)
                                   + len(meta_str))
    kv = b"".join(_w_kv_str(k, v) for k, v in meta_str.items())
    kv += b"".join(_w_kv_u32(k, v) for k, v in meta_u32.items())
    kv += b"".join(_w_kv_f32(k, v) for k, v in meta_f32.items())
    infos = b""
    payloads = []
    off = 0
    for name, arr, tt in tensors:
        if tt == GGML_F32:
            data = arr.astype(np.float32).tobytes()
        elif tt == GGML_Q8_0:
            flat = arr.astype(np.float32).reshape(-1, 32)
            d = (np.abs(flat).max(axis=1) / 127.0).astype(np.float16)
            df = d.astype(np.float32)
            df[df == 0] = 1.0
            q = np.round(flat / df[:, None]).clip(-127, 127) \
                .astype(np.int8)
            data = b"".join(d[i].tobytes() + q[i].tobytes()
                            for i in range(flat.shape[0]))
        else:
            raise NotImplementedError
        dims = tuple(reversed(arr.shape))  # GGUF dims fastest-first
        infos += (_w_str(name) + struct.pack("<I", len(dims))
                  + struct.pack(f"<{len(dims)}Q", *dims)
                  + struct.pack("<IQ", tt, off))
        off += (len(data) + align - 1) // align * align
        payloads.append(data)
    head = header + kv + infos
    pad0 = (align - len(head) % align) % align
    with open(path, "wb") as f:
        f.write(head + b"\x00" * pad0)
        for data in payloads:
            f.write(data)
            f.write(b"\x00" * ((align - len(data) % align) % align))


# -- known-vector dequant tests ------------------------------------------

def test_q8_0_known_vector():
    d = np.float16(0.5)
    q = np.arange(-16, 16, dtype=np.int8)
    raw = np.frombuffer(d.tobytes() + q.tobytes(), np.uint8)
    out = dequantize(raw, GGML_Q8_0, (32,))
    np.testing.assert_allclose(out, q.astype(np.float32) * 0.5)


def test_q4_0_known_vector():
    # nibble j -> element j (low) and j+16 (high); value d*(q-8)
    d = np.float16(2.0)
    qs = np.array([(h << 4) | lo for lo, h in
                   zip(range(16), range(15, -1, -1))], np.uint8)
    raw = np.frombuffer(d.tobytes() + qs.tobytes(), np.uint8)
    out = dequantize(raw, GGML_Q4_0, (32,))
    exp_lo = (np.arange(16) - 8.0) * 2.0
    exp_hi = (np.arange(15, -1, -1) - 8.0) * 2.0
    np.testing.assert_allclose(out[:16], exp_lo)
    np.testing.assert_allclose(out[16:], exp_hi)


def test_q8_0_roundtrip_via_writer(tmp_path):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 64)).astype(np.float32)
    p = tmp_path / "t.gguf"
    write_gguf(str(p), {"llama.block_count": 0}, {},
               {"general.architecture": "llama"},
               [("w", w, GGML_Q8_0)])
    _, tensors = read_gguf(str(p))
    got = tensors["w"]
    assert got.shape == w.shape
    # Q8_0 error bound: d/2 per element
    d = np.abs(w.reshape(-1, 32)).max(axis=1) / 127.0
    err = np.abs(got.reshape(-1, 32) - w.reshape(-1, 32))
    assert np.all(err <= d[:, None] * 0.51 + 1e-7)


# -- end-to-end: F32 GGUF -> convert -> generate == HF -------------------

def _permute(w, n_head):
    # convert_hf_to_gguf.py's rotary permute of wq/wk
    out = w.shape[0]
    return (w.reshape(n_head, 2, out // n_head // 2, *w.shape[1:])
            .swapaxes(1, 2).reshape(w.shape))


def test_gguf_f32_end_to_end(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    from vllm_pq_tpu import LLM, SamplingParams
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=96, num_hidden_layers=2,
                      num_attention_heads=2, num_key_value_heads=1,
                      max_position_embeddings=128,
                      tie_word_embeddings=False, rms_norm_eps=1e-5)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(cfg).eval().float()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    tensors = [
        ("token_embd.weight", sd["model.embed_tokens.weight"], GGML_F32),
        ("output_norm.weight", sd["model.norm.weight"], GGML_F32),
        ("output.weight", sd["lm_head.weight"], GGML_F32),
    ]
    for li in range(2):
        pre = f"model.layers.{li}."
        tensors += [
            (f"blk.{li}.attn_q.weight",
             _permute(sd[pre + "self_attn.q_proj.weight"], 2), GGML_F32),
            (f"blk.{li}.attn_k.weight",
             _permute(sd[pre + "self_attn.k_proj.weight"], 1), GGML_F32),
            (f"blk.{li}.attn_v.weight",
             sd[pre + "self_attn.v_proj.weight"], GGML_F32),
            (f"blk.{li}.attn_output.weight",
             sd[pre + "self_attn.o_proj.weight"], GGML_F32),
            (f"blk.{li}.ffn_gate.weight",
             sd[pre + "mlp.gate_proj.weight"], GGML_F32),
            (f"blk.{li}.ffn_up.weight",
             sd[pre + "mlp.up_proj.weight"], GGML_F32),
            (f"blk.{li}.ffn_down.weight",
             sd[pre + "mlp.down_proj.weight"], GGML_F32),
            (f"blk.{li}.attn_norm.weight",
             sd[pre + "input_layernorm.weight"], GGML_F32),
            (f"blk.{li}.ffn_norm.weight",
             sd[pre + "post_attention_layernorm.weight"], GGML_F32),
        ]
    g = tmp_path / "m.gguf"
    write_gguf(
        str(g),
        {"llama.embedding_length": 64, "llama.block_count": 2,
         "llama.attention.head_count": 2,
         "llama.attention.head_count_kv": 1,
         "llama.feed_forward_length": 96,
         "llama.context_length": 128},
        {"llama.attention.layer_norm_rms_epsilon": 1e-5,
         "llama.rope.freq_base": 10000.0},
        {"general.architecture": "llama"},
        tensors)
    out_dir = tmp_path / "converted"
    convert(str(g), str(out_dir), quiet=True)
    raw = json.load(open(out_dir / "config.json"))
    assert raw["num_key_value_heads"] == 1

    llm = LLM(model=str(out_dir), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, block_size=16,
              num_kv_blocks=32, enable_prefix_caching=False)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 126, 7).tolist()
    with torch.no_grad():
        exp = hf.generate(torch.tensor([ids]), max_new_tokens=8,
                          do_sample=False, num_beams=1,
                          pad_token_id=0)[0, len(ids):].tolist()
    got = llm.generate(
        [{"prompt_token_ids": ids}],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert got == exp, (got, exp)
