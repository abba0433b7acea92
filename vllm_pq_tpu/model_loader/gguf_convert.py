"""Offline GGUF -> serveable-checkpoint converter.

Role of the reference's GGUF ingestion (``model_loader/loader.py:1233``
+ ``csrc/quantization/gguf/``), redesigned for TPU as an OFFLINE
transcode: ggml block-quant formats have no MXU-friendly layout, so
the converter dequantizes once to dense (f32/bf16) safetensors in the
HF llama layout — after which every serve-time path (PQ resident,
tpu_int8 w8a8, int4) applies exactly as for an HF checkpoint.

Pure numpy: no gguf / llama.cpp dependency. Supports GGUF v2/v3,
little-endian, tensor types F32/F16/BF16/Q4_0/Q4_1/Q5_0/Q5_1/Q8_0 and
the k-quants Q4_K/Q6_K (the formats the reference's gguf kernels
cover for llama-family checkpoints).

CLI:
    python -m vllm_pq_tpu.model_loader.gguf_convert model.gguf out_dir \
        [--dtype float32|bfloat16]
"""

import argparse
import json
import os
import struct
from typing import Any, BinaryIO, Dict, List, Tuple

import numpy as np

GGUF_MAGIC = b"GGUF"

# metadata value types
_T_U8, _T_I8, _T_U16, _T_I16, _T_U32, _T_I32 = 0, 1, 2, 3, 4, 5
_T_F32, _T_BOOL, _T_STR, _T_ARR, _T_U64, _T_I64, _T_F64 = \
    6, 7, 8, 9, 10, 11, 12

# ggml tensor types (type id -> (block_elems, block_bytes))
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q5_0, GGML_Q5_1 = 6, 7
GGML_Q8_0 = 8
GGML_Q4_K, GGML_Q6_K = 12, 14
GGML_BF16 = 30

_BLOCK = {
    GGML_F32: (1, 4), GGML_F16: (1, 2), GGML_BF16: (1, 2),
    GGML_Q4_0: (32, 18), GGML_Q4_1: (32, 20),
    GGML_Q5_0: (32, 22), GGML_Q5_1: (32, 24),
    GGML_Q8_0: (32, 34),
    GGML_Q4_K: (256, 144), GGML_Q6_K: (256, 210),
}


def _read_str(f: BinaryIO) -> str:
    n = struct.unpack("<Q", f.read(8))[0]
    return f.read(n).decode("utf-8")


def _read_value(f: BinaryIO, vt: int) -> Any:
    if vt == _T_U8:
        return struct.unpack("<B", f.read(1))[0]
    if vt == _T_I8:
        return struct.unpack("<b", f.read(1))[0]
    if vt == _T_U16:
        return struct.unpack("<H", f.read(2))[0]
    if vt == _T_I16:
        return struct.unpack("<h", f.read(2))[0]
    if vt == _T_U32:
        return struct.unpack("<I", f.read(4))[0]
    if vt == _T_I32:
        return struct.unpack("<i", f.read(4))[0]
    if vt == _T_F32:
        return struct.unpack("<f", f.read(4))[0]
    if vt == _T_BOOL:
        return bool(f.read(1)[0])
    if vt == _T_STR:
        return _read_str(f)
    if vt == _T_U64:
        return struct.unpack("<Q", f.read(8))[0]
    if vt == _T_I64:
        return struct.unpack("<q", f.read(8))[0]
    if vt == _T_F64:
        return struct.unpack("<d", f.read(8))[0]
    if vt == _T_ARR:
        et = struct.unpack("<I", f.read(4))[0]
        n = struct.unpack("<Q", f.read(8))[0]
        return [_read_value(f, et) for _ in range(n)]
    raise ValueError(f"unknown GGUF metadata type {vt}")


# -- block dequantizers (formulas: ggml-quants.c of llama.cpp) ----------

def _f16(b: np.ndarray) -> np.ndarray:
    return b.view(np.float16).astype(np.float32)


def _dq_q4_0(raw: np.ndarray, n_blocks: int) -> np.ndarray:
    b = raw.reshape(n_blocks, 18)
    d = _f16(b[:, :2].copy())            # [N,1]
    qs = b[:, 2:]
    lo = (qs & 0x0F).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    q = np.concatenate([lo, hi], axis=1).astype(np.float32)
    return q * d


def _dq_q4_1(raw: np.ndarray, n_blocks: int) -> np.ndarray:
    b = raw.reshape(n_blocks, 20)
    d = _f16(b[:, :2].copy())
    m = _f16(b[:, 2:4].copy())
    qs = b[:, 4:]
    lo = (qs & 0x0F).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    q = np.concatenate([lo, hi], axis=1)
    return q * d + m


def _qh_bits(qh_bytes: np.ndarray) -> np.ndarray:
    """[N,4] bytes -> [N,32] bits of the u32 (little-endian)."""
    qh = qh_bytes.copy().view(np.uint32)          # [N,1]
    shifts = np.arange(32, dtype=np.uint32)
    return ((qh >> shifts[None, :]) & 1).astype(np.uint8)


def _dq_q5_0(raw: np.ndarray, n_blocks: int) -> np.ndarray:
    b = raw.reshape(n_blocks, 22)
    d = _f16(b[:, :2].copy())
    bits = _qh_bits(b[:, 2:6])
    qs = b[:, 6:]
    lo = (qs & 0x0F).astype(np.uint8)
    hi = (qs >> 4).astype(np.uint8)
    q = np.concatenate([lo | (bits[:, :16] << 4),
                        hi | (bits[:, 16:] << 4)],
                       axis=1).astype(np.float32) - 16.0
    return q * d


def _dq_q5_1(raw: np.ndarray, n_blocks: int) -> np.ndarray:
    b = raw.reshape(n_blocks, 24)
    d = _f16(b[:, :2].copy())
    m = _f16(b[:, 2:4].copy())
    bits = _qh_bits(b[:, 4:8])
    qs = b[:, 8:]
    lo = (qs & 0x0F).astype(np.uint8)
    hi = (qs >> 4).astype(np.uint8)
    q = np.concatenate([lo | (bits[:, :16] << 4),
                        hi | (bits[:, 16:] << 4)],
                       axis=1).astype(np.float32)
    return q * d + m


def _dq_q8_0(raw: np.ndarray, n_blocks: int) -> np.ndarray:
    b = raw.reshape(n_blocks, 34)
    d = _f16(b[:, :2].copy())
    q = b[:, 2:].copy().view(np.int8).astype(np.float32)
    return q * d


def _dq_q4_k(raw: np.ndarray, n_blocks: int) -> np.ndarray:
    """Q4_K: super-block of 256 = 8 sub-blocks of 32; 6-bit packed
    sub-scales/mins against f16 d/dmin (ggml-quants.c
    dequantize_row_q4_K)."""
    b = raw.reshape(n_blocks, 144)
    d = _f16(b[:, 0:2].copy())                    # [N,1]
    dmin = _f16(b[:, 2:4].copy())
    sc = b[:, 4:16]                               # [N,12] packed 6-bit
    qs = b[:, 16:]                                # [N,128]
    # unpack 8 (scale, min) 6-bit pairs
    scales = np.zeros((n_blocks, 8), np.float32)
    mins = np.zeros((n_blocks, 8), np.float32)
    for j in range(8):
        if j < 4:
            s = sc[:, j] & 63
            m = sc[:, j + 4] & 63
        else:
            s = (sc[:, j + 4] & 0x0F) | ((sc[:, j - 4] >> 6) << 4)
            m = (sc[:, j + 4] >> 4) | ((sc[:, j] >> 6) << 4)
        scales[:, j] = s
        mins[:, j] = m
    out = np.zeros((n_blocks, 256), np.float32)
    # qs: 4 chunks of 32 bytes; chunk c holds sub-blocks 2c (lo) and
    # 2c+1 (hi)
    for c in range(4):
        chunk = qs[:, c * 32:(c + 1) * 32]
        lo = (chunk & 0x0F).astype(np.float32)
        hi = (chunk >> 4).astype(np.float32)
        j0, j1 = 2 * c, 2 * c + 1
        out[:, j0 * 32:(j0 + 1) * 32] = \
            d * scales[:, j0:j0 + 1] * lo - dmin * mins[:, j0:j0 + 1]
        out[:, j1 * 32:(j1 + 1) * 32] = \
            d * scales[:, j1:j1 + 1] * hi - dmin * mins[:, j1:j1 + 1]
    return out


def _dq_q6_k(raw: np.ndarray, n_blocks: int) -> np.ndarray:
    """Q6_K: 256 elems; ql 128B (low 4 bits), qh 64B (high 2 bits),
    16 int8 sub-scales, f16 d (ggml-quants.c dequantize_row_q6_K)."""
    b = raw.reshape(n_blocks, 210)
    ql = b[:, :128]
    qh = b[:, 128:192]
    sc = b[:, 192:208].copy().view(np.int8).astype(np.float32)
    d = _f16(b[:, 208:210].copy())
    out = np.zeros((n_blocks, 256), np.float32)
    for half in range(2):                 # two 128-elem halves
        ql_h = ql[:, half * 64:(half + 1) * 64]
        qh_h = qh[:, half * 32:(half + 1) * 32]
        base = half * 128
        for g in range(4):                # 4 groups of 32 in the half
            if g < 2:
                lo = (ql_h[:, g * 32:(g + 1) * 32] & 0x0F)
            else:
                lo = (ql_h[:, (g - 2) * 32:(g - 1) * 32] >> 4)
            hi = ((qh_h >> (2 * g)) & 3)
            q = (lo | (hi << 4)).astype(np.float32) - 32.0
            sub = base // 16 + g * 2      # 16-elem sub-scale index
            s = np.concatenate(
                [np.repeat(sc[:, sub:sub + 1], 16, axis=1),
                 np.repeat(sc[:, sub + 1:sub + 2], 16, axis=1)], axis=1)
            out[:, base + g * 32: base + (g + 1) * 32] = d * s * q
    return out


_DEQUANT = {
    GGML_Q4_0: _dq_q4_0, GGML_Q4_1: _dq_q4_1,
    GGML_Q5_0: _dq_q5_0, GGML_Q5_1: _dq_q5_1,
    GGML_Q8_0: _dq_q8_0, GGML_Q4_K: _dq_q4_k, GGML_Q6_K: _dq_q6_k,
}


def dequantize(raw: np.ndarray, ggml_type: int,
               shape: Tuple[int, ...]) -> np.ndarray:
    n = int(np.prod(shape))
    if ggml_type == GGML_F32:
        return raw.copy().view(np.float32).reshape(shape)
    if ggml_type == GGML_F16:
        return raw.copy().view(np.float16).astype(np.float32) \
            .reshape(shape)
    if ggml_type == GGML_BF16:
        u = raw.copy().view(np.uint16).astype(np.uint32) << 16
        return u.view(np.float32).reshape(shape)
    be, _ = _BLOCK[ggml_type]
    return _DEQUANT[ggml_type](raw, n // be).reshape(shape)


def read_gguf(path: str):
    """-> (metadata dict, {tensor name: np.float32 array})."""
    with open(path, "rb") as f:
        if f.read(4) != GGUF_MAGIC:
            raise ValueError("not a GGUF file")
        version = struct.unpack("<I", f.read(4))[0]
        if version not in (2, 3):
            raise ValueError(f"unsupported GGUF version {version}")
        n_tensors = struct.unpack("<Q", f.read(8))[0]
        n_kv = struct.unpack("<Q", f.read(8))[0]
        meta: Dict[str, Any] = {}
        for _ in range(n_kv):
            key = _read_str(f)
            vt = struct.unpack("<I", f.read(4))[0]
            meta[key] = _read_value(f, vt)
        infos: List[Tuple[str, Tuple[int, ...], int, int]] = []
        for _ in range(n_tensors):
            name = _read_str(f)
            nd = struct.unpack("<I", f.read(4))[0]
            dims = struct.unpack(f"<{nd}Q", f.read(8 * nd))
            ttype = struct.unpack("<I", f.read(4))[0]
            off = struct.unpack("<Q", f.read(8))[0]
            # GGUF dims are fastest-first; numpy wants slowest-first
            infos.append((name, tuple(reversed(dims)), ttype, off))
        align = int(meta.get("general.alignment", 32))
        pos = f.tell()
        data_start = (pos + align - 1) // align * align
        tensors: Dict[str, np.ndarray] = {}
        for name, shape, ttype, off in infos:
            be, bb = _BLOCK[ttype]
            n = int(np.prod(shape))
            nbytes = n // be * bb
            f.seek(data_start + off)
            raw = np.frombuffer(f.read(nbytes), np.uint8)
            tensors[name] = dequantize(raw, ttype, shape)
    return meta, tensors


# -- llama-family name/config mapping -----------------------------------

def _unpermute(w: np.ndarray, n_head: int) -> np.ndarray:
    """Invert convert_hf_to_gguf.py's rotary permute of wq/wk."""
    out, rest = w.shape[0], w.shape[1:]
    return (w.reshape(n_head, out // n_head // 2, 2, *rest)
            .swapaxes(1, 2).reshape(w.shape))


def convert_llama(meta: Dict[str, Any],
                  tensors: Dict[str, np.ndarray]):
    """-> (hf_config dict, {hf name: array}) for
    general.architecture == llama (mistral rides the same keys)."""
    arch = meta.get("general.architecture", "llama")
    p = f"{arch}."
    heads = int(meta[p + "attention.head_count"])
    kv = int(meta.get(p + "attention.head_count_kv", heads))
    hidden = int(meta[p + "embedding_length"])
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "hidden_size": hidden,
        "intermediate_size": int(meta[p + "feed_forward_length"]),
        "num_hidden_layers": int(meta[p + "block_count"]),
        "num_attention_heads": heads,
        "num_key_value_heads": kv,
        "max_position_embeddings": int(meta.get(p + "context_length",
                                                2048)),
        "rms_norm_eps": float(meta.get(
            p + "attention.layer_norm_rms_epsilon", 1e-5)),
        "rope_theta": float(meta.get(p + "rope.freq_base", 10000.0)),
        "vocab_size": int(tensors["token_embd.weight"].shape[0]),
        "torch_dtype": "float32",
        "tie_word_embeddings": "output.weight" not in tensors,
    }
    out: Dict[str, np.ndarray] = {}
    out["model.embed_tokens.weight"] = tensors["token_embd.weight"]
    out["model.norm.weight"] = tensors["output_norm.weight"]
    if "output.weight" in tensors:
        out["lm_head.weight"] = tensors["output.weight"]
    mapping = {
        "attn_q": ("self_attn.q_proj", heads),
        "attn_k": ("self_attn.k_proj", kv),
        "attn_v": ("self_attn.v_proj", None),
        "attn_output": ("self_attn.o_proj", None),
        "ffn_gate": ("mlp.gate_proj", None),
        "ffn_up": ("mlp.up_proj", None),
        "ffn_down": ("mlp.down_proj", None),
        "attn_norm": ("input_layernorm", None),
        "ffn_norm": ("post_attention_layernorm", None),
    }
    for li in range(cfg["num_hidden_layers"]):
        for gk, (hk, permute_heads) in mapping.items():
            t = tensors.get(f"blk.{li}.{gk}.weight")
            if t is None:
                continue
            if permute_heads is not None:
                t = _unpermute(t, permute_heads)
            out[f"model.layers.{li}.{hk}.weight"] = t
    return cfg, out


def convert(gguf_path: str, out_dir: str, dtype: str = "float32",
            quiet: bool = False) -> None:
    from safetensors.numpy import save_file
    meta, tensors = read_gguf(gguf_path)
    arch = meta.get("general.architecture", "llama")
    if arch not in ("llama", "mistral", "qwen2"):
        raise ValueError(
            f"unsupported GGUF architecture {arch!r} (llama-family "
            "only); extend convert_llama's mapping")
    cfg, weights = convert_llama(meta, tensors)
    if dtype == "bfloat16":
        import jax.numpy as jnp
        weights = {k: np.asarray(jnp.asarray(v, jnp.bfloat16))
                   for k, v in weights.items()}
        cfg["torch_dtype"] = "bfloat16"
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    save_file(weights, os.path.join(out_dir, "model.safetensors"))
    if not quiet:
        total = sum(v.size for v in weights.values())
        print(f"converted {len(weights)} tensors ({total / 1e6:.1f} M "
              f"params) -> {out_dir}; serve with --quantization "
              f"pq/tpu_int8/int4 as usual")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("gguf")
    ap.add_argument("out_dir")
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"))
    args = ap.parse_args()
    convert(args.gguf, args.out_dir, args.dtype)


if __name__ == "__main__":
    main()
