"""Weight loading: dummy init, HF safetensors, and AQLM->PQ conversion.

Roles of the reference's ``model_loader/loader.py`` (DefaultModelLoader
:198, DummyModelLoader :440) and the AQLM weight mapping
(``quantization/aqlm.py:253-316``):

- ``load_dummy``: random params matching the model's templates (PQ
  artifacts included) — the ``--load-format dummy`` path used by
  benchmarks and CI (reference ``benchmarks`` + weight-loading tests);
- ``load_hf``: streams safetensors shards, maps HF names to our tree;
  dense weights are transposed to [in, out] and (optionally) quantized
  online with the method's ``quantize`` (role of tpu_int8's post-load
  quantization, ``tpu_int8.py:78-101``);
- AQLM checkpoints (codes/codebooks/scales tensors) are converted
  losslessly: codes [out, in/g, m] -> [m, in/g, out] (+unsigned shift),
  codebooks [m, 2^b, 1, g] -> [m, 2^b, g], scales [out,1,1,1] -> [out].
"""

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.logger import init_logger
from vllm_pq_tpu.quantization.methods import (LinearMethod, PQLinearMethod,
                                              UnquantizedLinearMethod)

logger = init_logger(__name__)

_HF_LAYER_MAP = {
    "self_attn.q_proj": "q_proj",
    "self_attn.k_proj": "k_proj",
    "self_attn.v_proj": "v_proj",
    "self_attn.o_proj": "o_proj",
    "self_attn.dense": "o_proj",        # Phi
    "mlp.gate_proj": "gate_proj",
    "mlp.up_proj": "up_proj",
    "mlp.down_proj": "down_proj",
    "mlp.fc1": "up_proj",               # Phi two-linear MLP
    "mlp.fc2": "down_proj",
    "mlp.c_fc": "up_proj",              # Starcoder2
    "mlp.c_proj": "down_proj",
    "input_layernorm": "input_layernorm",
    "post_attention_layernorm": "post_attention_layernorm",
    "pre_feedforward_layernorm": "pre_feedforward_layernorm",
    "post_feedforward_layernorm": "post_feedforward_layernorm",
    "self_attn.q_norm": "q_norm",       # Qwen3 / OLMo2 / Cohere
    "self_attn.k_norm": "k_norm",
}


def _tree_device_put(tree: Any, specs: Any, mesh: Mesh,
                     path: str = "") -> Any:
    """device_put a (nested) numpy tree with matching PartitionSpecs."""
    if isinstance(tree, dict):
        out = {}
        for k in tree:
            if isinstance(specs, dict) and k not in specs:
                raise KeyError(
                    f"loaded param {path + k!r} has no sharding spec in "
                    f"model.param_specs() — the checkpoint carries a "
                    f"tensor the built model does not declare (wrong "
                    f"architecture resolved, or a missing bias/norm "
                    f"template). Spec keys here: {sorted(specs)}")
            out[k] = _tree_device_put(
                tree[k], specs[k] if isinstance(specs, dict) else specs,
                mesh, f"{path}{k}.")
        return out
    if isinstance(tree, list):
        return [_tree_device_put(t, s, mesh, f"{path}{i}.")
                for i, (t, s) in enumerate(zip(tree, specs))]
    spec = specs if isinstance(specs, P) else P()
    return jax.device_put(tree, NamedSharding(mesh, spec))


def load_dummy(model, mesh: Mesh, seed: int = 0) -> Any:
    """Random weights with the right shapes (quantized artifacts are
    sampled directly, not derived from a dense sample — fast)."""
    rng = np.random.default_rng(seed)

    def init(shapes):
        out = {}
        for k, v in shapes.items():
            if isinstance(v, dict):
                out[k] = init(v)
            elif isinstance(v, list):
                out[k] = [init(x) for x in v]
            else:
                shape, dtype = v
                jdt = jnp.dtype(dtype)
                if jdt == jnp.dtype(jnp.uint8):
                    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
                elif jdt == jnp.dtype(jnp.uint16):
                    arr = rng.integers(0, 65536, size=shape,
                                       dtype=np.uint16)
                elif jdt == jnp.dtype(jnp.int8):
                    arr = rng.integers(-127, 128, size=shape, dtype=np.int8)
                else:
                    fan_in = shape[0] if len(shape) > 1 else 1
                    arr = (rng.standard_normal(shape) /
                           max(np.sqrt(fan_in), 1)).astype(np.float32)
                    if k == "scales":
                        arr = np.abs(arr) + 0.5
                    arr = arr.astype(jnp.dtype(dtype).name
                                     if jdt != jnp.dtype(jnp.bfloat16)
                                     else np.float32)
                    if jdt == jnp.dtype(jnp.bfloat16):
                        arr = jnp.asarray(arr, jnp.bfloat16)
                out[k] = np.asarray(arr) if not isinstance(
                    arr, jax.Array) else arr
        return out

    tree = init(model.param_shapes())
    return _tree_device_put(tree, model.param_specs(), mesh)


def _iter_safetensors(model_dir: str):
    from safetensors import safe_open
    files = sorted(f for f in os.listdir(model_dir)
                   if f.endswith(".safetensors"))
    if not files:
        yield from _iter_torch_checkpoint(model_dir)
        return
    for f in files:
        with safe_open(os.path.join(model_dir, f), framework="np") as sf:
            for name in sf.keys():
                yield name, sf.get_tensor(name)


def _iter_torch_checkpoint(model_dir: str):
    """Legacy torch-pickle checkpoints (pytorch_model*.bin / *.pt, and
    fairseq2's wrapped model.pt — reference fairseq2_llama.py:52
    unwraps {model_key: name, name: state_dict})."""
    files = sorted(f for f in os.listdir(model_dir)
                   if f.endswith((".bin", ".pt"))
                   and not f.endswith("training_args.bin"))
    if not files:
        raise FileNotFoundError(
            f"no .safetensors/.bin/.pt files under {model_dir}")
    import torch
    for f in files:
        sd = torch.load(os.path.join(model_dir, f), map_location="cpu",
                        weights_only=True)
        if "model_key" in sd:  # fairseq2 wrapper
            sd = sd[sd["model_key"]]
        for name, t in sd.items():
            if not hasattr(t, "numpy"):
                continue
            yield name, t.float().numpy() if t.dtype.is_floating_point \
                else t.numpy()


def _load_llava_vision(tower: dict, model, rest: str,
                       tensor: np.ndarray) -> None:
    """Map HF CLIP vision-model names into the tower subtree
    (multimodal/clip.py layout); conv patch kernel becomes a matmul."""
    if rest == "embeddings.class_embedding":
        tower["class_embedding"] = {"weight": tensor}
    elif rest == "embeddings.patch_embedding.weight":
        h = tensor.shape[0]
        tower["patch_embedding"] = {
            # [h, 3, ps, ps] -> [ps, ps, 3, h] -> [ps*ps*3, h] matching
            # the (ps_row, ps_col, channel) patch flattening
            "weight": tensor.transpose(2, 3, 1, 0).reshape(-1, h)}
    elif rest == "embeddings.position_embedding.weight":
        tower["position_embedding"] = {"weight": tensor}
    elif rest.startswith("pre_layrnorm."):
        tower.setdefault("pre_layrnorm", {})[rest.split(".")[-1]] = tensor
    elif rest.startswith("encoder.layers."):
        parts = rest.split(".")
        li = int(parts[2])
        if li >= len(tower["layers"]):
            return  # beyond the feature layer: unused
        sub = parts[3] if parts[3] != "self_attn" and parts[3] != "mlp" \
            else parts[4]
        leaf = parts[-1]
        d = tower["layers"][li].setdefault(sub, {})
        d[leaf] = tensor.T if (leaf == "weight"
                               and "norm" not in sub) else tensor
    elif rest.startswith("post_layernorm."):
        pass  # unused at vision_feature_layer=-2
    else:
        logger.warning("unmapped LLaVA vision weight %s", rest)


def _load_blip2_weight(tree, name: str, w: np.ndarray) -> None:
    """BLIP-2 checkpoint mapping (models/blip2.py layout)."""
    V = tree["vision"]
    if name == "query_tokens":
        V["qformer"]["query_tokens"] = {"weight": w[0]}
        return
    if name.startswith("language_projection."):
        leaf = name.split(".")[-1]
        d = V["projector"].setdefault("linear", {})
        d[leaf] = w.T if leaf == "weight" else w
        return
    if name.startswith("vision_model."):
        rest = name[len("vision_model."):]
        T = V["tower"]
        if rest == "embeddings.class_embedding":
            T["class_embedding"] = {"weight": w.reshape(-1)}
        elif rest == "embeddings.patch_embedding.weight":
            h = w.shape[0]
            T.setdefault("patch_embedding", {})["weight"] = \
                w.transpose(2, 3, 1, 0).reshape(-1, h)
        elif rest == "embeddings.patch_embedding.bias":
            T.setdefault("patch_embedding", {})["bias"] = w
        elif rest == "embeddings.position_embedding":
            T["position_embedding"] = {"weight": w[0]}
        elif rest.startswith("post_layernorm."):
            T.setdefault("post_layernorm", {})[rest.split(".")[-1]] = w
        elif rest.startswith("encoder.layers."):
            parts = rest.split(".")
            li = int(parts[2])
            sub = parts[4] if parts[3] in ("self_attn", "mlp") \
                else parts[3]
            leaf = parts[-1]
            d = T["layers"][li].setdefault(sub, {})
            d[leaf] = w.T if (leaf == "weight"
                              and "norm" not in sub) else w
        else:
            logger.warning("unmapped BLIP-2 vision weight %s", name)
        return
    if name.startswith("qformer."):
        rest = name[len("qformer."):]
        Q = V["qformer"]
        if rest.startswith("layernorm."):
            Q.setdefault("layernorm", {})[rest.split(".")[-1]] = w
            return
        if rest.startswith("encoder.layer."):
            parts = rest.split(".")
            li = int(parts[2])
            L = Q["layers"][li]
            kind = parts[3]
            if kind in ("attention", "crossattention"):
                d = L.setdefault(kind if kind == "crossattention"
                                 else "attention", {})
                if parts[4] == "attention":      # q/k/v linears
                    sub, leaf = parts[5], parts[6]
                    dd = d.setdefault(sub, {})
                    dd[leaf] = w.T if leaf == "weight" else w
                else:                             # output.dense / LN
                    if parts[5] == "dense":
                        dd = d.setdefault("out", {})
                        dd[parts[6]] = w.T if parts[6] == "weight" \
                            else w
                    else:
                        dd = d.setdefault("out_ln", {})
                        dd[parts[6]] = w
                return
            if kind == "intermediate_query":
                d = L.setdefault("intermediate_query", {})
                d[parts[-1]] = w.T if parts[-1] == "weight" else w
                return
            if kind == "output_query":
                if parts[4] == "dense":
                    d = L.setdefault("output_query", {})
                    d[parts[-1]] = w.T if parts[-1] == "weight" else w
                else:
                    d = L.setdefault("output_query_ln", {})
                    d[parts[-1]] = w
                return
        logger.warning("unmapped BLIP-2 qformer weight %s", name)
        return
    logger.warning("unmapped BLIP-2 weight %s", name)


def _load_qwen2audio_tower(tower: dict, rest: str,
                           w: np.ndarray) -> None:
    """Map HF Qwen2AudioEncoder names into the tower subtree
    (models/qwen2_audio.py layout); conv kernels become IHO."""
    if rest.startswith(("conv1.", "conv2.")):
        sub, leaf = rest.split(".")
        d = tower.setdefault(sub, {})
        d[leaf] = w.transpose(1, 2, 0) if leaf == "weight" else w
    elif rest == "embed_positions.weight":
        tower["embed_positions"] = {"weight": w}
    elif rest.startswith("layer_norm."):
        tower.setdefault("layer_norm", {})[rest.split(".")[-1]] = w
    elif rest.startswith("layers."):
        parts = rest.split(".")
        li = int(parts[1])
        L = tower["layers"][li]
        if parts[2] == "self_attn":
            d = L.setdefault("self_attn", {}).setdefault(parts[3], {})
            d[parts[4]] = w.T if parts[4] == "weight" else w
        else:
            d = L.setdefault(parts[2], {})
            d[parts[-1]] = w.T if (parts[-1] == "weight"
                                   and "norm" not in parts[2]) else w
    else:
        logger.warning("unmapped Qwen2Audio tower weight %s", rest)


def _load_bart_weight(tree, cfg, name: str, w: np.ndarray) -> None:
    """BART checkpoint mapping (models/bart.py layout; reference
    models/bart.py weight names). shared/encoder/decoder embed_tokens
    are the same tied tensor; lm_head is tied too."""
    if name.startswith("model."):
        name = name[len("model."):]
    if name in ("shared.weight", "encoder.embed_tokens.weight",
                "decoder.embed_tokens.weight"):
        tree["embed_tokens"]["weight"] = w
        return
    if name == "final_logits_bias":
        tree["final_logits_bias"]["weight"] = w.reshape(-1)
        return
    if name == "lm_head.weight":
        return  # tied to shared
    for side, sub in (("encoder.", tree["encoder"]), ("decoder.", tree)):
        if not name.startswith(side):
            continue
        rest = name[len(side):]
        if rest.startswith("embed_positions."):
            sub["embed_positions"]["weight"] = w
            return
        if rest.startswith("layernorm_embedding."):
            sub["layernorm_embedding"][rest.split(".")[-1]] = w
            return
        if rest.startswith("layers."):
            parts = rest.split(".")
            li = int(parts[1])
            lsub = parts[2] if parts[2] not in ("self_attn",
                                                "encoder_attn") \
                else f"{parts[2]}.{parts[3]}"
            leaf = parts[-1]
            d = sub["layers"][li]
            if "." in lsub:
                outer, inner = lsub.split(".")
                d = d.setdefault(outer, {}).setdefault(inner, {})
            else:
                d = d.setdefault(lsub, {})
            d[leaf] = w.T if (leaf == "weight" and "norm" not in lsub) \
                else w
            return
    logger.warning("unmapped BART weight %s", name)


def _load_siglip_vision(tower: dict, rest: str,
                        tensor: np.ndarray) -> None:
    """Map HF SigLIP vision-model names into the tower subtree
    (multimodal/siglip.py layout); conv patch kernel becomes a matmul.
    The multihead pooling head is unused (consumers read the post-LN
    last hidden state) and skipped."""
    if rest == "embeddings.patch_embedding.weight":
        h = tensor.shape[0]
        tower["patch_embedding"] = dict(
            tower.get("patch_embedding", {}),
            weight=tensor.transpose(2, 3, 1, 0).reshape(-1, h))
    elif rest == "embeddings.patch_embedding.bias":
        tower.setdefault("patch_embedding", {})["bias"] = tensor
    elif rest == "embeddings.position_embedding.weight":
        tower["position_embedding"] = {"weight": tensor}
    elif rest.startswith("encoder.layers."):
        parts = rest.split(".")
        li = int(parts[2])
        sub = parts[3] if parts[3] not in ("self_attn", "mlp") \
            else parts[4]
        leaf = parts[-1]
        d = tower["layers"][li].setdefault(sub, {})
        d[leaf] = tensor.T if (leaf == "weight"
                               and "norm" not in sub) else tensor
    elif rest.startswith("post_layernorm."):
        tower.setdefault("post_layernorm", {})[rest.split(".")[-1]] = \
            tensor
    elif rest.startswith("head."):
        pass  # attention-pooling head: unused
    else:
        logger.warning("unmapped SigLIP vision weight %s", rest)


def _load_internvit_vision(tower: dict, rest: str,
                           tensor: np.ndarray) -> None:
    """Map HF InternVLVisionModel names into the tower subtree
    (multimodal/internvit.py layout)."""
    if rest == "embeddings.cls_token":
        tower["cls_token"] = {"weight": tensor.reshape(-1)}
    elif rest == "embeddings.position_embeddings":
        tower["position_embeddings"] = {"weight": tensor[0]}
    elif rest == "embeddings.patch_embeddings.projection.weight":
        h = tensor.shape[0]
        tower["patch_embedding"] = dict(
            tower.get("patch_embedding", {}),
            weight=tensor.transpose(2, 3, 1, 0).reshape(-1, h))
    elif rest == "embeddings.patch_embeddings.projection.bias":
        tower.setdefault("patch_embedding", {})["bias"] = tensor
    elif rest.startswith("encoder.layer."):
        parts = rest.split(".")
        li = int(parts[2])
        d = tower["layers"][li]
        if parts[3] in ("lambda_1", "lambda_2"):
            d[parts[3]] = {"weight": tensor}
            return
        sub = parts[4] if parts[3] in ("attention", "mlp") else parts[3]
        leaf = parts[-1]
        dd = d.setdefault(sub, {})
        dd[leaf] = tensor.T if (leaf == "weight" and "norm" not in sub
                                and "lambda" not in sub) else tensor
    elif rest.startswith("layernorm."):
        tower.setdefault("layernorm", {})[rest.split(".")[-1]] = tensor
    else:
        logger.warning("unmapped InternViT vision weight %s", rest)


def _load_internvit_legacy(tower: dict, rest: str,
                           tensor: np.ndarray) -> None:
    """Legacy OpenGVLab InternViT names (reference intern_vit.py, the
    ``vision_model.*`` tree real InternVL2/2.5 checkpoints carry):
    fused attn.qkv, ls1/ls2 bare layer scales, norm1/norm2."""
    if rest == "embeddings.class_embedding":
        tower["cls_token"] = {"weight": tensor.reshape(-1)}
    elif rest == "embeddings.position_embedding":
        tower["position_embeddings"] = {"weight": tensor[0]}
    elif rest == "embeddings.patch_embedding.weight":
        h = tensor.shape[0]
        tower["patch_embedding"] = dict(
            tower.get("patch_embedding", {}),
            weight=tensor.transpose(2, 3, 1, 0).reshape(-1, h))
    elif rest == "embeddings.patch_embedding.bias":
        tower.setdefault("patch_embedding", {})["bias"] = tensor
    elif rest.startswith("encoder.layers."):
        parts = rest.split(".")
        li = int(parts[2])
        d = tower["layers"][li]
        sub = ".".join(parts[3:-1]) if len(parts) > 4 else parts[3]
        leaf = parts[-1]
        if parts[3] in ("ls1", "ls2"):
            # bare Parameter [h]: the per-channel layer scale
            d["lambda_1" if parts[3] == "ls1" else "lambda_2"] = \
                {"weight": tensor}
            return
        if sub == "attn.qkv":
            h = tensor.shape[0] // 3
            for i, n in enumerate(("q_proj", "k_proj", "v_proj")):
                w = tensor[i * h:(i + 1) * h]
                d.setdefault(n, {})[leaf] = (w.T if leaf == "weight"
                                             else w)
            return
        m = {"attn.proj": "projection_layer",
             "attn.q_norm": "q_norm", "attn.k_norm": "k_norm",
             "norm1": "layernorm_before", "norm2": "layernorm_after",
             "mlp.fc1": "fc1", "mlp.fc2": "fc2"}
        ours = m.get(sub)
        if ours is None:
            logger.warning("unmapped legacy InternViT weight %s", rest)
            return
        d.setdefault(ours, {})[leaf] = (
            tensor.T if (leaf == "weight" and "norm" not in ours)
            else tensor)
    else:
        logger.warning("unmapped legacy InternViT weight %s", rest)


def _load_telechat2_weight(tree, cfg, shapes, linear_method, name,
                           w) -> None:
    """TeleChat2 naming (reference models/telechat2.py): GPT-style
    transformer.h tree; ``key_value`` interleaves K|V per head
    (head_dim rows of K then head_dim of V, per q head)."""
    put = _mk_put_linear(tree, linear_method)
    if name == "transformer.word_embeddings.weight":
        tree["embed_tokens"]["weight"] = w
        return
    if name == "transformer.ln_f.weight":
        tree["norm"]["weight"] = w
        return
    if name == "lm_head.weight":
        if "lm_head" in shapes:
            tree["lm_head"] = {"weight": w.T}
        return
    if not name.startswith("transformer.h."):
        logger.warning("unmapped telechat2 weight %s", name)
        return
    parts = name.split(".")
    li = int(parts[2])
    L = tree["layers"][li]
    sub = ".".join(parts[3:-1])
    leaf = parts[-1]
    d = cfg.head_dim
    if sub == "self_attention.key_value":
        kv = w.reshape(cfg.num_attention_heads, 2, d, -1)
        k = kv[:, 0].reshape(-1, kv.shape[-1])
        v = kv[:, 1].reshape(-1, kv.shape[-1])
        put(L, "k_proj", k.T)
        put(L, "v_proj", v.T)
    elif sub == "self_attention.query":
        put(L, "q_proj", w.T)
    elif sub == "self_attention.dense":
        if leaf == "weight":
            put(L, "o_proj", w.T)
        else:
            L["o_proj_bias"] = {"bias": w}
    elif sub in ("mlp.gate_proj", "mlp.up_proj"):
        put(L, sub.split(".")[1], w.T)
    elif sub == "mlp.down_proj":
        if leaf == "weight":
            put(L, "down_proj", w.T)
        else:
            L["down_proj_bias"] = {"bias": w}
    elif sub in ("input_layernorm", "post_attention_layernorm"):
        L[sub] = {"weight": w}
    else:
        logger.warning("unmapped telechat2 weight %s", name)


def _load_fairseq2_weight(tree, cfg, shapes, linear_method, name,
                          w) -> None:
    """fairseq2-exported llama (reference models/fairseq2_llama.py):
    decoder_frontend/decoder tree; q/k projections stored in
    INTERLEAVED rotary order — de-interleave to the half-split
    convention (reshape_fairseq2_weights role)."""
    put = _mk_put_linear(tree, linear_method)
    d = cfg.head_dim

    def permute(wt, n_heads):
        # [n*d, in] interleaved (re, im, re, im...) -> half-split
        return wt.reshape(n_heads, d // 2, 2, -1).transpose(
            0, 2, 1, 3).reshape(n_heads * d, -1)

    if name == "decoder_frontend.embed.weight":
        tree["embed_tokens"]["weight"] = w
        return
    if name == "decoder.layer_norm.weight":
        tree["norm"]["weight"] = w
        return
    if name == "final_proj.weight":
        if "lm_head" in shapes:
            tree["lm_head"] = {"weight": w.T}
        return
    if not name.startswith("decoder.layers."):
        logger.warning("unmapped fairseq2 weight %s", name)
        return
    parts = name.split(".")
    li = int(parts[2])
    L = tree["layers"][li]
    sub = ".".join(parts[3:-1])
    m = {"self_attn.q_proj": "q_proj", "self_attn.k_proj": "k_proj",
         "self_attn.v_proj": "v_proj", "self_attn.output_proj": "o_proj",
         "ffn.gate_proj": "gate_proj", "ffn.inner_proj": "up_proj",
         "ffn.output_proj": "down_proj"}
    if sub == "self_attn.q_proj":
        put(L, "q_proj", permute(w, cfg.num_attention_heads).T)
    elif sub == "self_attn.k_proj":
        put(L, "k_proj", permute(w, cfg.num_key_value_heads).T)
    elif sub in m:
        put(L, m[sub], w.T)
    elif sub == "self_attn_layer_norm":
        L["input_layernorm"] = {"weight": w}
    elif sub == "ffn_layer_norm":
        L["post_attention_layernorm"] = {"weight": w}
    else:
        logger.warning("unmapped fairseq2 weight %s", name)


def _load_qwen_v1_weight(tree, cfg, shapes, linear_method, name,
                         w) -> None:
    """Qwen v1 naming (reference models/qwen.py): transformer.h tree,
    fused biased c_attn, SwiGLU as w2(gate)/w1(up)/c_proj."""
    put = _mk_put_linear(tree, linear_method)
    if name == "transformer.wte.weight":
        tree["embed_tokens"]["weight"] = w
        return
    if name == "transformer.ln_f.weight":
        tree["norm"]["weight"] = w
        return
    if name == "lm_head.weight":
        if "lm_head" in shapes:
            tree["lm_head"] = {"weight": w.T}
        return
    if not name.startswith("transformer.h."):
        logger.warning("unmapped qwen-v1 weight %s", name)
        return
    parts = name.split(".")
    li = int(parts[2])
    L = tree["layers"][li]
    sub = ".".join(parts[3:-1])
    leaf = parts[-1]
    e = cfg.hidden_size
    if sub == "attn.c_attn":
        if leaf == "weight":
            for i, n in enumerate(("q_proj", "k_proj", "v_proj")):
                put(L, n, w[i * e:(i + 1) * e].T)
        else:
            for i, n in enumerate(("q_proj", "k_proj", "v_proj")):
                L[n + "_bias"] = {"bias": w[i * e:(i + 1) * e]}
    elif sub == "attn.c_proj":
        put(L, "o_proj", w.T)
    elif sub == "mlp.w2":
        put(L, "gate_proj", w.T)
    elif sub == "mlp.w1":
        put(L, "up_proj", w.T)
    elif sub == "mlp.c_proj":
        put(L, "down_proj", w.T)
    elif sub == "ln_1":
        L["input_layernorm"] = {"weight": w}
    elif sub == "ln_2":
        L["post_attention_layernorm"] = {"weight": w}
    else:
        logger.warning("unmapped qwen-v1 weight %s", name)


def _load_phi3small_weight(tree, cfg, shapes, linear_method, name,
                           w) -> None:
    """Phi-3-Small naming (reference models/phi3_small.py): HEAD-MAJOR
    fused query_key_value ([(q_per_kv + 2) * head_dim] per kv group),
    biased dense, up_proj/down_proj gegelu MLP, LayerNorm leaves."""
    import numpy as np
    put = _mk_put_linear(tree, linear_method)
    if name == "model.embed_tokens.weight":
        tree["embed_tokens"]["weight"] = w
        return
    if name.startswith("model.final_layernorm."):
        tree["norm"][name.split(".")[-1]] = w
        return
    if name == "lm_head.weight":
        if "lm_head" in shapes:
            tree["lm_head"] = {"weight": w.T}
        return
    if not name.startswith("model.layers."):
        logger.warning("unmapped phi3small weight %s", name)
        return
    parts = name.split(".")
    li = int(parts[2])
    L = tree["layers"][li]
    sub = ".".join(parts[3:-1])
    leaf = parts[-1]
    d = cfg.head_dim
    kvh = cfg.num_key_value_heads
    rep = cfg.num_attention_heads // kvh
    if sub == "self_attn.query_key_value":
        wa = np.asarray(w)
        grp = wa.reshape(kvh, (rep + 2) * d, *wa.shape[1:])
        qs = grp[:, :rep * d].reshape(kvh * rep * d, *wa.shape[1:])
        ks = grp[:, rep * d:(rep + 1) * d].reshape(kvh * d,
                                                   *wa.shape[1:])
        vs = grp[:, (rep + 1) * d:].reshape(kvh * d, *wa.shape[1:])
        if leaf == "weight":
            put(L, "q_proj", qs.T)
            put(L, "k_proj", ks.T)
            put(L, "v_proj", vs.T)
        else:
            L["q_proj_bias"] = {"bias": qs}
            L["k_proj_bias"] = {"bias": ks}
            L["v_proj_bias"] = {"bias": vs}
    elif sub == "self_attn.dense":
        if leaf == "weight":
            put(L, "o_proj", w.T)
        else:
            L["o_proj_bias"] = {"bias": w}
    elif sub == "mlp.up_proj":
        if leaf == "weight":
            put(L, "up_proj", w.T)
        else:
            L["up_proj_bias"] = {"bias": w}
    elif sub == "mlp.down_proj":
        if leaf == "weight":
            put(L, "down_proj", w.T)
        else:
            L["down_proj_bias"] = {"bias": w}
    elif sub in ("input_layernorm", "post_attention_layernorm"):
        L.setdefault(sub, {})[leaf] = w
    else:
        logger.warning("unmapped phi3small weight %s", name)


def _load_phi4mm_audio_weight(A: dict, rest: str, w) -> None:
    """Phi-4-MM conformer names (reference phi4mm_audio.py module
    tree) -> models/phi4mm_audio.py template. Conv kernels transpose
    to HWIO; torch Sequential indices map positionally (activations
    hold no params, so conv.0/2/3/5/6... collapse to our dense list)."""
    import numpy as np
    parts = rest.split(".")
    leaf = parts[-1]
    if rest.startswith("encoder.encoder_embedding."):
        A["mean" if leaf == "global_mean" else "invstd"] = \
            {"weight": w}
        return
    if rest.startswith("encoder.embed.conv."):
        # Sequential: [conv2d, act] + (dw, pw, act)*: param-carrying
        # indices 0, 2, 3, 5, 6, ... -> dense list 0, 1, 2, 3, 4, ...
        idx = int(parts[3])
        if idx == 0:
            dense = 0
        else:
            grp, off = divmod(idx - 2, 3)   # off: 0=dw, 1=pw
            dense = 1 + 2 * grp + off
        d = A["nemo"]["layers"][dense]
        if leaf == "weight":
            d["weight"] = np.asarray(w).transpose(2, 3, 1, 0)
        else:
            d["bias"] = w
        return
    if rest.startswith("encoder.embed.out."):
        A["nemo"]["out"][leaf] = w.T if leaf == "weight" else w
        return
    if rest.startswith("encoder.relative_attention_bias_layer."):
        A["t5_bias"] = {"weight": w}
        return
    if rest.startswith("encoder.encoders."):
        B = A["blocks"][int(parts[2])]
        sub = parts[3]
        if sub in ("feed_forward_in", "feed_forward_out"):
            F = B["ff_in" if sub == "feed_forward_in" else "ff_out"]
            if parts[4] == "layer_norm":
                F.setdefault("ln", {})[leaf] = w
            elif parts[4] == "net" and parts[5] == "0":
                F.setdefault("glu", {})[leaf] = (
                    w.T if leaf == "weight" else w)
            elif parts[4] == "net" and parts[5] == "2":
                F.setdefault("out", {})[leaf] = (
                    w.T if leaf == "weight" else w)
            return
        if sub == "self_attn":
            m = {"linear_q": "q", "linear_k": "k", "linear_v": "v",
                 "linear_out": "out"}
            ours = m.get(parts[4])
            if ours:
                B["attn"].setdefault(ours, {})[leaf] = (
                    w.T if leaf == "weight" else w)
            return
        if sub == "conv":
            C = B["conv"]
            if parts[4] == "layer_norm":
                C.setdefault("ln", {})[leaf] = w
            elif parts[4] == "glu":
                if parts[5] == "ext_pw_conv_1d":
                    C.setdefault("glu_w", {})[leaf] = (
                        np.asarray(w).transpose(2, 1, 0)
                        if leaf == "weight" else w)
                elif parts[5] in ("b1", "b2"):
                    C["glu_" + parts[5]] = {
                        "weight": np.asarray(w).reshape(-1)}
            elif parts[4] == "dw_sep_conv_1d":
                which = "dw" if parts[5] == "dw_conv" else "pw"
                C.setdefault(which, {})[leaf] = (
                    np.asarray(w).transpose(2, 1, 0)
                    if leaf == "weight" else w)
            elif parts[4] == "ext_pw_conv_1d":
                C.setdefault("ext_pw", {})[leaf] = (
                    np.asarray(w).transpose(2, 1, 0)
                    if leaf == "weight" else w)
            return
        if sub == "layer_norm_att":
            B.setdefault("ln_att", {})[leaf] = w
            return
        if sub == "layer_norm":
            B.setdefault("ln", {})[leaf] = w
            return
        return
    if rest.startswith("audio_projection.speech."):
        idx = parts[2]
        sub = {"0": "linear_1", "2": "linear_2"}.get(idx)
        if sub:
            A["proj"].setdefault(sub, {})[leaf] = (
                w.T if leaf == "weight" else w)
        return
    if rest.startswith("audio_projection.vision."):
        return  # vision-speech projection: speech mode served
    logger.warning("unmapped phi4mm audio weight %s", rest)


def _load_prithvi_weight(tree, cfg, name: str, w) -> None:
    """Prithvi MAE encoder naming (timm-style ViT blocks; terratorch
    checkpoints may prefix ``encoder.`` and nest a ``state_dict``).
    Decoder/mask tensors and the recomputed sincos pos_embed are
    skipped."""
    import numpy as np
    for pre in ("encoder.", "model.", "backbone."):
        if name.startswith(pre):
            name = name[len(pre):]
    if (name.startswith(("decoder", "mask_token", "pos_embed"))
            or name.endswith("pos_embed")):
        return
    if name.startswith("patch_embed.proj."):
        leaf = name.split(".")[-1]
        if leaf == "weight":
            # Conv3d [E, C, t, ph, pw] -> [(t, ph, pw... C-major), E]:
            # our patchify orders (C, tp, ph, pw)
            w = np.asarray(w).transpose(1, 2, 3, 4, 0).reshape(
                -1, w.shape[0])
        tree["patch_embed"][leaf] = w
        return
    if name == "cls_token":
        tree["cls_token"] = {"weight": np.asarray(w).reshape(-1)}
        return
    if name.startswith("norm."):
        tree["norm"][name.split(".")[-1]] = w
        return
    if name.startswith("blocks."):
        parts = name.split(".")
        L = tree["blocks"][int(parts[1])]
        sub = ".".join(parts[2:-1])
        leaf = parts[-1]
        m = {"attn.qkv": "qkv", "attn.proj": "proj",
             "mlp.fc1": "fc1", "mlp.fc2": "fc2",
             "norm1": "norm1", "norm2": "norm2"}
        ours = m.get(sub)
        if ours is None:
            logger.warning("unmapped prithvi weight %s", name)
            return
        L.setdefault(ours, {})[leaf] = (
            w.T if leaf == "weight" and "norm" not in ours else w)
        return
    logger.warning("unmapped prithvi weight %s", name)


def _load_florence2_weight(tree, cfg, name: str, w) -> None:
    """Florence-2 naming (reference models/florence2.py):
    ``language_model.model.*`` is plain BART; ``vision_tower.*`` is the
    DaViT; ``image_projection`` / ``image_proj_norm`` /
    ``image_pos_embed`` bridge into the encoder. The sinusoidal
    ``visual_temporal_embed`` buffer is recomputed, not loaded."""
    import numpy as np
    if name.startswith("language_model."):
        _load_bart_weight(tree, cfg, name[len("language_model."):], w)
        return
    V = tree["vision"]
    if name == "image_projection":
        V["image_projection"] = {"weight": w}
        return
    if name.startswith("image_proj_norm."):
        V.setdefault("image_proj_norm", {})[name.split(".")[-1]] = w
        return
    if name == "image_pos_embed.row_embeddings.weight":
        V["pos_row"] = {"weight": w}
        return
    if name == "image_pos_embed.column_embeddings.weight":
        V["pos_col"] = {"weight": w}
        return
    if name.startswith("visual_temporal_embed."):
        return  # fixed sinusoid, recomputed at trace time
    if not name.startswith("vision_tower."):
        logger.warning("unmapped florence2 weight %s", name)
        return
    rest = name[len("vision_tower."):]
    parts = rest.split(".")
    leaf = parts[-1]
    if rest.startswith("convs."):
        st = V["stages"][int(parts[1])]
        if parts[2] == "proj":
            # torch conv [out, in, kh, kw] -> HWIO
            st.setdefault("conv", {})[leaf] = (
                np.asarray(w).transpose(2, 3, 1, 0)
                if leaf == "weight" else w)
        elif parts[2] == "norm":
            st.setdefault("conv_norm", {})[leaf] = w
        else:
            logger.warning("unmapped florence2 weight %s", name)
        return
    if rest.startswith("blocks."):
        blk = V["stages"][int(parts[1])]["blocks"][int(parts[2])]
        which = parts[3]          # spatial_block / channel_block
        tgt = blk.setdefault(
            "spatial" if which == "spatial_block" else "channel", {})
        sub = parts[4]
        if sub in ("conv1", "conv2"):
            # PreNorm(None, DepthWiseConv2d): ...conv1.fn.dw.weight
            # torch depthwise [C, 1, kh, kw] -> HWIO [kh, kw, 1, C]
            tgt.setdefault(sub, {})[leaf] = (
                np.asarray(w).transpose(2, 3, 1, 0)
                if leaf == "weight" else w)
        elif sub in ("window_attn", "channel_attn"):
            inner = parts[5]
            if inner == "norm":
                tgt.setdefault("norm", {})[leaf] = w
            else:                 # fn.qkv / fn.proj
                key = parts[6]
                tgt.setdefault(key, {})[leaf] = (
                    w.T if leaf == "weight" else w)
        elif sub == "ffn":
            inner = parts[5]
            if inner == "norm":
                tgt.setdefault("ffn_norm", {})[leaf] = w
            else:                 # fn.net.fc1 / fc2
                key = parts[7]
                tgt.setdefault(key, {})[leaf] = (
                    w.T if leaf == "weight" else w)
        else:
            logger.warning("unmapped florence2 weight %s", name)
        return
    logger.warning("unmapped florence2 weight %s", name)


_MOLMO_WTE = {}


def _load_molmo_weight(tree, cfg, shapes, linear_method, name,
                       w) -> None:
    """Molmo naming (reference models/molmo.py hf_to_vllm_mapper):
    model.transformer.blocks tree with fused att_proj, ff_proj stored
    [multiplier || gate] (MulAndSilu), wte split into embedding +
    new_embedding (128 extra image-token rows), ff_out as the lm head;
    model.vision_backbone.* carries the ViT + pooling + projector."""
    import numpy as np
    put = _mk_put_linear(tree, linear_method)
    if name in ("model.transformer.wte.embedding",
                "model.transformer.wte.new_embedding"):
        st = _MOLMO_WTE.setdefault(id(tree), {})
        st["extra" if name.endswith("new_embedding") else "main"] = w
        if "main" in st:
            main = np.asarray(st["main"])
            extra = st.get("extra")
            rows = cfg.vocab_size + cfg.embed_extra_rows
            if extra is not None:
                full = np.concatenate([main, np.asarray(extra)], 0)
            elif main.shape[0] >= rows:
                full = main
            else:  # pad until/unless new_embedding arrives
                full = np.concatenate(
                    [main, np.zeros((rows - main.shape[0],
                                     main.shape[1]), main.dtype)], 0)
            tree["embed_tokens"] = {"weight": full}
            if extra is not None:
                _MOLMO_WTE.pop(id(tree), None)
        return
    if name == "model.transformer.ln_f.weight":
        tree["norm"]["weight"] = w
        return
    if name == "model.transformer.ff_out.weight":
        if "lm_head" in shapes:
            tree["lm_head"] = {"weight": w.T}
        return
    if name.startswith("model.vision_backbone."):
        rest = name[len("model.vision_backbone."):]
        V = tree["vision"]
        parts = rest.split(".")
        leaf = parts[-1]
        if rest.startswith("image_vit.transformer.resblocks."):
            L = V["tower"]["layers"][int(parts[3])]
            sub = parts[4]
            key = parts[5] if sub in ("attention", "feed_forward") \
                else sub
            L.setdefault(key, {})[leaf] = (
                w.T if leaf == "weight" and "norm" not in key else w)
        elif rest.startswith("image_vit."):
            key = parts[1]
            m = {"patch_embedding": "patch_embedding",
                 "class_embedding": "class_embedding",
                 "positional_embedding": "positional_embedding",
                 "pre_ln": "pre_ln"}
            ours = m.get(key)
            if ours is None:
                logger.warning("unmapped molmo vision weight %s", name)
                return
            if key == "class_embedding":
                V["tower"][ours] = {"weight": np.asarray(w).reshape(-1)}
            elif key == "positional_embedding":
                V["tower"][ours] = {"weight": w}
            elif key == "patch_embedding":
                V["tower"].setdefault(ours, {})[leaf] = (
                    w.T if leaf == "weight" else w)
            else:
                V["tower"].setdefault(ours, {})[leaf] = w
        elif rest.startswith("image_pooling_2d."):
            V["pooling"].setdefault(parts[1], {})[leaf] = (
                w.T if leaf == "weight" else w)
        elif rest.startswith("image_projector."):
            V["projector"].setdefault(parts[1], {})[leaf] = (
                w.T if leaf == "weight" else w)
        elif rest == "pad_embed":
            V["pad_embed"] = {"weight": w}
        else:
            logger.warning("unmapped molmo vision weight %s", name)
        return
    if not name.startswith("model.transformer.blocks."):
        logger.warning("unmapped molmo weight %s", name)
        return
    parts = name.split(".")
    li = int(parts[3])
    L = tree["layers"][li]
    sub = parts[4]
    leaf = parts[-1]
    hq = cfg.num_attention_heads * cfg.head_dim
    kvw = cfg.num_key_value_heads * cfg.head_dim
    inter = cfg.intermediate_size
    norm_after = cfg.block_style == "olmo2"
    if sub == "att_proj":
        splits = ((0, hq, "q_proj"), (hq, hq + kvw, "k_proj"),
                  (hq + kvw, hq + 2 * kvw, "v_proj"))
        if leaf == "weight":
            for a, b2, n in splits:
                put(L, n, w[a:b2].T)
        else:
            for a, b2, n in splits:
                L[n + "_bias"] = {"bias": w[a:b2]}
    elif sub == "attn_out":
        put(L, "o_proj", w.T)
    elif sub == "ff_proj":
        # [multiplier || gate] halves (MulAndSilu): multiplier maps to
        # up_proj (our mlp computes act(gate) * up)
        put(L, "up_proj", w[:inter].T)
        put(L, "gate_proj", w[inter:].T)
    elif sub == "ff_out":
        put(L, "down_proj", w.T)
    elif sub == "attn_norm":
        L["post_attention_layernorm" if norm_after
          else "input_layernorm"] = {"weight": w}
    elif sub == "ff_norm":
        L["post_feedforward_layernorm" if norm_after
          else "post_attention_layernorm"] = {"weight": w}
    elif sub == "q_norm":
        L["q_norm"] = {"weight": w}
    elif sub == "k_norm":
        L["k_norm"] = {"weight": w}
    else:
        logger.warning("unmapped molmo weight %s", name)


def _load_jais_weight(tree, cfg, shapes, linear_method, name,
                      w) -> None:
    """JAIS naming (reference models/jais.py): GPT-2 Conv1D tree
    ([in, out] weights, no transpose), fused biased c_attn, SwiGLU as
    c_fc(gate)/c_fc2(up)/c_proj(down)."""
    put = _mk_put_linear(tree, linear_method)
    if name in ("transformer.wte.weight", "wte.weight"):
        tree["embed_tokens"]["weight"] = w
        return
    if name in ("transformer.ln_f.weight", "ln_f.weight"):
        tree["norm"]["weight"] = w
        return
    if name in ("transformer.ln_f.bias", "ln_f.bias"):
        tree["norm"]["bias"] = w
        return
    if name in ("lm_head.weight", "transformer.relative_pe.slopes"):
        return  # tied embeddings / recomputed alibi slopes
    rest = name.split("transformer.h.", 1)[-1] \
        if "transformer.h." in name else name.split("h.", 1)[-1]
    if rest == name:
        logger.warning("unmapped jais weight %s", name)
        return
    parts = rest.split(".")
    li = int(parts[0])
    L = tree["layers"][li]
    sub = ".".join(parts[1:-1])
    leaf = parts[-1]
    h = cfg.hidden_size
    if sub == "attn.c_attn":
        if leaf == "weight":  # Conv1D [in, 3h]: split columns
            for i, n in enumerate(("q_proj", "k_proj", "v_proj")):
                put(L, n, w[:, i * h:(i + 1) * h])
        else:
            for i, n in enumerate(("q_proj", "k_proj", "v_proj")):
                L[n + "_bias"] = {"bias": w[i * h:(i + 1) * h]}
    elif sub == "attn.c_proj":
        if leaf == "weight":
            put(L, "o_proj", w)
        else:
            L["o_proj_bias"] = {"bias": w}
    elif sub in ("mlp.c_fc", "mlp.c_fc2", "mlp.c_proj"):
        ours = {"mlp.c_fc": "gate_proj", "mlp.c_fc2": "up_proj",
                "mlp.c_proj": "down_proj"}[sub]
        if cfg.mlp_style == "mlp" and sub == "mlp.c_fc":
            ours = "up_proj"
        if leaf == "weight":
            put(L, ours, w)
        else:
            L[ours + "_bias"] = {"bias": w}
    elif sub == "ln_1":
        L.setdefault("input_layernorm", {})[leaf] = w
    elif sub == "ln_2":
        L.setdefault("post_attention_layernorm", {})[leaf] = w
    else:
        logger.warning("unmapped jais weight %s", name)


def _load_mistral_native_weight(tree, cfg, shapes, linear_method, name,
                                w) -> None:
    """Mistral consolidated-checkpoint naming (params.json format,
    reference models/pixtral.py load_weights + mistral WeightsMapper
    role): tok_embeddings/output, layers.N.attention.wq|wk|wv|wo,
    feed_forward.w1|w2|w3, attention_norm/ffn_norm."""
    put = _mk_put_linear(tree, linear_method)
    if name == "tok_embeddings.weight":
        tree["embed_tokens"]["weight"] = w
        return
    if name == "norm.weight":
        tree["norm"]["weight"] = w
        return
    if name == "output.weight":
        if "lm_head" in shapes:
            tree["lm_head"] = {"weight": w.T}
        return
    if not name.startswith("layers."):
        logger.warning("unmapped mistral-native weight %s", name)
        return
    parts = name.split(".")
    li = int(parts[1])
    L = tree["layers"][li]
    sub = ".".join(parts[2:-1])
    m = {"attention.wq": "q_proj", "attention.wk": "k_proj",
         "attention.wv": "v_proj", "attention.wo": "o_proj",
         "feed_forward.w1": "gate_proj", "feed_forward.w2": "down_proj",
         "feed_forward.w3": "up_proj"}
    if sub in m:
        put(L, m[sub], w.T)
    elif sub == "attention_norm":
        L["input_layernorm"] = {"weight": w}
    elif sub == "ffn_norm":
        L["post_attention_layernorm"] = {"weight": w}
    else:
        logger.warning("unmapped mistral-native weight %s", name)


def _load_pixtral_native_vision(vtree: dict, rest: str,
                                tensor: np.ndarray) -> None:
    """Mistral-native Pixtral ViT names (``vision_encoder.*``) onto the
    PixtralVisionTower layout (multimodal/pixtral.py)."""
    if rest == "patch_conv.weight":
        h = tensor.shape[0]
        vtree["tower"]["patch_embedding"] = {
            "weight": tensor.transpose(2, 3, 1, 0).reshape(-1, h)}
    elif rest == "ln_pre.weight":
        vtree["tower"]["ln_pre"] = {"weight": tensor}
    elif rest.startswith("transformer.layers."):
        parts = rest.split(".")
        li = int(parts[2])
        sub = ".".join(parts[3:-1])
        L = vtree["tower"]["layers"][li]
        m = {"attention.wq": "q_proj", "attention.wk": "k_proj",
             "attention.wv": "v_proj", "attention.wo": "o_proj",
             "feed_forward.w1": "gate_proj",
             "feed_forward.w2": "down_proj",
             "feed_forward.w3": "up_proj",
             # HF-spelling variants inside mistral-format repos
             "attention.q_proj": "q_proj", "attention.k_proj": "k_proj",
             "attention.v_proj": "v_proj", "attention.o_proj": "o_proj",
             "feed_forward.gate_proj": "gate_proj",
             "feed_forward.down_proj": "down_proj",
             "feed_forward.up_proj": "up_proj"}
        if sub in m:
            L[m[sub]] = {"weight": tensor.T}
        elif sub in ("attention_norm", "ffn_norm"):
            L[sub] = {"weight": tensor}
        else:
            logger.warning("unmapped pixtral vision weight %s", rest)
    else:
        logger.warning("unmapped pixtral vision weight %s", rest)


def _load_mllama_weight(tree, cfg, shapes, linear_method, name,
                        w) -> None:
    """Mllama (Llama-3.2-Vision) checkpoint mapping: llama text tree
    under language_model. (cross layers carry cross_attn.* projections,
    per-head q/k norms and bare gate Parameters), two-stage vision
    encoder under vision_model., and the multi_modal_projector
    (reference models/mllama.py weight names)."""
    put = _mk_put_linear(tree, linear_method)
    cross = set(cfg.cross_attention_layers)
    if name == "multi_modal_projector.weight":
        tree["vision"].setdefault("projector", {})["weight"] = w.T
        return
    if name == "multi_modal_projector.bias":
        tree["vision"].setdefault("projector", {})["bias"] = w
        return
    if name.startswith("language_model."):
        rest = name[len("language_model."):]
        if rest == "lm_head.weight":
            tree["lm_head"] = {"weight": w.T}
            return
        if rest == "model.embed_tokens.weight":
            tree["embed_tokens"]["weight"] = w
            return
        if rest == "model.norm.weight":
            tree["norm"]["weight"] = w
            return
        if not rest.startswith("model.layers."):
            logger.warning("unmapped Mllama text weight %s", name)
            return
        parts = rest.split(".")
        li = int(parts[2])
        L = tree["layers"][li]
        sub = ".".join(parts[3:-1])
        leaf = parts[-1]
        if li in cross:
            # bare gate Parameters have no leaf suffix
            if parts[-1] in ("cross_attn_attn_gate",
                             "cross_attn_mlp_gate"):
                key = ("attn_gate" if parts[-1].endswith("attn_gate")
                       else "mlp_gate")
                L[key] = {"weight": w.reshape(1)}
                return
            sub_map = {"cross_attn.q_proj": "q_proj",
                       "cross_attn.k_proj": "k_proj",
                       "cross_attn.v_proj": "v_proj",
                       "cross_attn.o_proj": "o_proj",
                       "mlp.gate_proj": "gate_proj",
                       "mlp.up_proj": "up_proj",
                       "mlp.down_proj": "down_proj"}
            if sub in sub_map:
                L[sub_map[sub]] = {"weight": w.T}
            elif sub in ("cross_attn.q_norm", "cross_attn.k_norm"):
                L[sub.split(".")[1]] = {"weight": w}
            elif sub in ("input_layernorm", "post_attention_layernorm"):
                L.setdefault(sub, {})[leaf] = w
            else:
                logger.warning("unmapped Mllama cross weight %s", name)
            return
        # standard llama self-attention layer (quantizable)
        sub_map = {"self_attn.q_proj": "q_proj",
                   "self_attn.k_proj": "k_proj",
                   "self_attn.v_proj": "v_proj",
                   "self_attn.o_proj": "o_proj",
                   "mlp.gate_proj": "gate_proj",
                   "mlp.up_proj": "up_proj",
                   "mlp.down_proj": "down_proj"}
        if sub in sub_map:
            put(L, sub_map[sub], w.T)
        elif sub in ("input_layernorm", "post_attention_layernorm"):
            L.setdefault(sub, {})[leaf] = w
        else:
            logger.warning("unmapped Mllama text weight %s", name)
        return
    if not name.startswith("vision_model."):
        logger.warning("unmapped Mllama weight %s", name)
        return
    V = tree["vision"]
    rest = name[len("vision_model."):]
    if rest == "patch_embedding.weight":
        h = w.shape[0]
        V["patch_embedding"] = {
            "weight": w.transpose(2, 3, 1, 0).reshape(-1, h)}
    elif rest == "class_embedding":
        V["class_embedding"] = {"weight": w}
    elif rest == "gated_positional_embedding.embedding":
        V.setdefault("gated_positional_embedding", {})["embedding"] = w
    elif rest == "gated_positional_embedding.gate":
        V.setdefault("gated_positional_embedding", {})["gate"] = \
            w.reshape(1)
    elif rest == "gated_positional_embedding.tile_embedding.weight":
        V.setdefault("gated_positional_embedding",
                     {})["tile_embedding"] = w
    elif rest.startswith(("pre_tile_positional_embedding",
                          "post_tile_positional_embedding")):
        key = rest.split(".")[0]
        if rest.endswith("embedding.weight"):
            V.setdefault(key, {})["embedding"] = w
        else:  # .gate
            V.setdefault(key, {})["gate"] = w.reshape(1)
    elif rest.startswith(("layernorm_pre.", "layernorm_post.")):
        key, leaf = rest.split(".")
        V.setdefault(key, {})[leaf] = w
    elif rest.startswith(("transformer.layers.",
                          "global_transformer.layers.")):
        parts = rest.split(".")
        lst = ("layers" if parts[0] == "transformer"
               else "global_layers")
        li = int(parts[2])
        L = V[lst][li]
        if parts[-1] in ("gate_attn", "gate_ffn"):
            L[parts[-1]] = {"weight": w.reshape(1)}
            return
        sub = parts[-2]
        leaf = parts[-1]
        sub_map = {"q_proj": "q_proj", "k_proj": "k_proj",
                   "v_proj": "v_proj", "o_proj": "o_proj",
                   "fc1": "fc1", "fc2": "fc2",
                   "input_layernorm": "input_layernorm",
                   "post_attention_layernorm":
                       "post_attention_layernorm"}
        ours = sub_map.get(sub)
        if ours is None:
            logger.warning("unmapped Mllama vision weight %s", name)
            return
        d = L.setdefault(ours, {})
        d[leaf] = (w.T if leaf == "weight" and "norm" not in ours
                   else w)
    else:
        logger.warning("unmapped Mllama vision weight %s", name)


def _load_pixtral_vision(tower: dict, model, rest: str,
                         tensor: np.ndarray) -> None:
    """Map HF Pixtral vision names into the tower subtree
    (multimodal/pixtral.py layout); bias-free conv becomes a matmul."""
    if rest == "patch_conv.weight":
        h = tensor.shape[0]
        tower["patch_embedding"] = {
            "weight": tensor.transpose(2, 3, 1, 0).reshape(-1, h)}
    elif rest == "ln_pre.weight":
        tower["ln_pre"] = {"weight": tensor}
    elif rest.startswith("transformer.layers."):
        parts = rest.split(".")
        li = int(parts[2])
        if li >= len(tower["layers"]):
            return
        sub = parts[-2]  # q_proj / attention_norm / gate_proj / ...
        leaf = parts[-1]
        d = tower["layers"][li].setdefault(sub, {})
        d[leaf] = tensor.T if (leaf == "weight"
                               and "norm" not in sub) else tensor
    else:
        logger.warning("unmapped Pixtral vision weight %s", rest)


def _load_falcon_weight(tree, cfg, shapes, linear_method, name,
                        tensor) -> None:
    from vllm_pq_tpu.quantization.methods import UnquantizedLinearMethod

    def put_linear(L, ours, w):
        L[ours] = (linear_method.quantize(w, np.float32)
                   if not isinstance(linear_method,
                                     UnquantizedLinearMethod)
                   else {"weight": w})

    rest = name.split("transformer.", 1)[1]
    if rest == "word_embeddings.weight":
        tree["embed_tokens"]["weight"] = tensor
        return
    if rest.startswith("ln_f."):
        tree["norm"][rest.split(".")[-1]] = tensor
        return
    parts = rest.split(".")
    li = int(parts[1])
    sub = ".".join(parts[2:-1])
    leaf = parts[-1]
    L = tree["layers"][li]
    heads, kvh = cfg.num_attention_heads, cfg.num_key_value_heads
    d = cfg.head_dim
    qpk = heads // kvh
    if sub == "self_attention.query_key_value":
        w = tensor.reshape(kvh, qpk + 2, d, *tensor.shape[1:])
        pieces = {"q_proj": w[:, :qpk].reshape(heads * d,
                                               *tensor.shape[1:]),
                  "k_proj": w[:, -2].reshape(kvh * d, *tensor.shape[1:]),
                  "v_proj": w[:, -1].reshape(kvh * d, *tensor.shape[1:])}
        for ours, piece in pieces.items():
            if leaf == "bias":
                L[ours + "_bias"] = {"bias": piece}
            else:
                put_linear(L, ours, piece.T)
        return
    fmap = {"self_attention.dense": "o_proj",
            "mlp.dense_h_to_4h": "up_proj",
            "mlp.dense_4h_to_h": "down_proj",
            "input_layernorm": "input_layernorm",
            "ln_attn": "input_layernorm",
            "ln_mlp": "post_attention_layernorm",
            "post_attention_layernorm": "post_attention_layernorm"}
    ours = fmap.get(sub)
    if ours is None:
        if "rotary" not in sub:
            logger.warning("unmapped Falcon weight %s", name)
        return
    if "layernorm" in ours:
        L.setdefault(ours, {})[leaf] = tensor
    elif leaf == "bias":
        L[ours + "_bias"] = {"bias": tensor}
    else:
        put_linear(L, ours, tensor.T)


def _mk_put_linear(tree, linear_method):
    """Closure placing a dense [in, out] weight into the tree, applying
    online quantization when a quantized method is configured."""
    def put(L, ours, w_in_out):
        L[ours] = (linear_method.quantize(w_in_out, np.float32)
                   if not isinstance(linear_method, UnquantizedLinearMethod)
                   else {"weight": w_in_out})
    return put


def _load_jamba_weight(tree, cfg, shapes, linear_method, name, w,
                       pending):
    """Jamba hybrid naming (reference models/jamba.py): per-layer
    self_attn OR mamba mixer, plus feed_forward as dense MLP or MoE."""
    if name == "model.embed_tokens.weight":
        tree["embed_tokens"]["weight"] = w
        return
    if name == "model.final_layernorm.weight":
        tree["final_layernorm"]["weight"] = w
        return
    if name == "lm_head.weight":
        if "lm_head" in shapes:
            tree["lm_head"] = {"weight": w.T}
        return
    if name == "score.weight":
        # JambaForSequenceClassification head [num_labels, h]
        if "score" in shapes:
            tree["score"] = {"weight": w.T}
        return
    if not name.startswith("model.layers."):
        return
    parts = name.split(".")
    li = int(parts[2])
    L = tree["layers"][li]
    put = _mk_put_linear(tree, linear_method)
    kind = parts[3]
    if kind in ("input_layernorm", "pre_ff_layernorm"):
        L.setdefault(kind, {})["weight"] = w
        return
    if kind == "self_attn":
        put(L.setdefault("self_attn", {}), parts[4], w.T)
        return
    if kind == "mamba":
        which = parts[4]
        leaf = parts[-1]
        node = L.setdefault("mamba", {})
        if which in ("A_log", "D"):
            node.setdefault(which, {})["weight"] = w
        elif which == "conv1d":
            if leaf == "weight":
                node.setdefault("conv1d", {})["weight"] = w[:, 0, :]
            else:
                node.setdefault("conv1d", {})["bias"] = w
        elif which in ("in_proj", "x_proj", "dt_proj", "out_proj"):
            node.setdefault(which, {})[leaf] = (w.T if leaf == "weight"
                                                else w)
        elif which in ("dt_layernorm", "b_layernorm", "c_layernorm"):
            node.setdefault(which, {})[leaf] = w
        elif which in ("dt_bias", "norm"):
            # Bamba mamba-2 mixer extras (bare dt_bias Parameter, gated
            # RMSNorm weight)
            node.setdefault(which, {})["weight"] = w
        else:
            logger.warning("unmapped Jamba mamba weight %s", name)
        return
    if kind == "feed_forward":
        sub = parts[4]
        if sub == "router":
            L.setdefault("moe", {}).setdefault(
                "router", {})["weight"] = w.T
            return
        if sub == "experts":
            pending.setdefault(li, {}).setdefault(
                parts[6], {})[int(parts[5])] = w.T
            return
        put(L.setdefault("mlp", {}), sub, w.T)
        return
    logger.warning("unmapped Jamba weight %s", name)


def _load_gptj_weight(tree, cfg, shapes, linear_method, name, w):
    """GPT-J naming (reference models/gpt_j.py): transformer.h.N.*."""
    put = _mk_put_linear(tree, linear_method)
    if name == "transformer.wte.weight":
        tree["embed_tokens"]["weight"] = w
        return
    if name.startswith("transformer.ln_f."):
        tree["norm"][name.split(".")[-1]] = w
        return
    if name == "lm_head.weight":
        if "lm_head" in shapes:
            tree["lm_head"] = {"weight": w.T}
        return
    if name == "lm_head.bias":
        tree["lm_head_bias"] = {"bias": w}
        return
    if not name.startswith("transformer.h."):
        return
    parts = name.split(".")
    li = int(parts[2])
    sub = ".".join(parts[3:-1])
    leaf = parts[-1]
    L = tree["layers"][li]
    m = {"attn.q_proj": "q_proj", "attn.k_proj": "k_proj",
         "attn.v_proj": "v_proj", "attn.out_proj": "o_proj",
         "mlp.fc_in": "up_proj", "mlp.fc_out": "down_proj"}
    if sub == "ln_1":
        L.setdefault("input_layernorm", {})[leaf] = w
    elif sub in m:
        if leaf == "bias":
            L[m[sub] + "_bias"] = {"bias": w}
        else:
            put(L, m[sub], w.T)
    elif "attn.masked_bias" in sub or "attn.bias" in name:
        pass  # causal-mask buffers
    else:
        logger.warning("unmapped GPT-J weight %s", name)


def _load_bloom_weight(tree, cfg, shapes, linear_method, name, w):
    """Bloom naming; fused query_key_value is HEAD-interleaved
    [heads, (q,k,v), d] (reference models/bloom.py weight loader)."""
    put = _mk_put_linear(tree, linear_method)
    rest = name.split("transformer.", 1)[-1]
    heads, d = cfg.num_attention_heads, cfg.head_dim
    if rest == "word_embeddings.weight":
        tree["embed_tokens"]["weight"] = w
        return
    if rest.startswith("word_embeddings_layernorm."):
        tree.setdefault("embed_norm", {})[rest.split(".")[-1]] = w
        return
    if rest.startswith("ln_f."):
        tree["norm"][rest.split(".")[-1]] = w
        return
    if not rest.startswith("h."):
        return
    parts = rest.split(".")
    li = int(parts[1])
    sub = ".".join(parts[2:-1])
    leaf = parts[-1]
    L = tree["layers"][li]
    if sub == "self_attention.query_key_value":
        g = w.reshape(heads, 3, d, *w.shape[1:])
        for idx, ours in enumerate(("q_proj", "k_proj", "v_proj")):
            piece = g[:, idx].reshape(heads * d, *w.shape[1:])
            if leaf == "bias":
                L[ours + "_bias"] = {"bias": piece}
            else:
                put(L, ours, piece.T)
    elif sub == "self_attention.dense":
        if leaf == "bias":
            L["o_proj_bias"] = {"bias": w}
        else:
            put(L, "o_proj", w.T)
    elif sub in ("input_layernorm", "post_attention_layernorm"):
        L.setdefault(sub, {})[leaf] = w
    elif sub == "mlp.dense_h_to_4h":
        if leaf == "bias":
            L["up_proj_bias"] = {"bias": w}
        else:
            put(L, "up_proj", w.T)
    elif sub == "mlp.dense_4h_to_h":
        if leaf == "bias":
            L["down_proj_bias"] = {"bias": w}
        else:
            put(L, "down_proj", w.T)
    else:
        logger.warning("unmapped Bloom weight %s", name)


def _load_mpt_weight(tree, cfg, shapes, linear_method, name, w):
    """MPT naming: transformer.blocks.N.*; Wqkv is [q|k|v] contiguous
    (reference models/mpt.py)."""
    put = _mk_put_linear(tree, linear_method)
    rest = name.split("transformer.", 1)[-1]
    if rest == "wte.weight":
        tree["embed_tokens"]["weight"] = w
        return
    if rest.startswith("norm_f."):
        tree["norm"][rest.split(".")[-1]] = w
        return
    if not rest.startswith("blocks."):
        return
    parts = rest.split(".")
    li = int(parts[1])
    sub = ".".join(parts[2:-1])
    leaf = parts[-1]
    L = tree["layers"][li]
    d = cfg.head_dim
    nq = cfg.num_attention_heads * d
    nkv = cfg.num_key_value_heads * d
    if sub == "attn.Wqkv":
        splits = {"q_proj": w[:nq], "k_proj": w[nq:nq + nkv],
                  "v_proj": w[nq + nkv:nq + 2 * nkv]}
        for ours, piece in splits.items():
            if leaf == "bias":
                L[ours + "_bias"] = {"bias": piece}
            else:
                put(L, ours, piece.T)
    elif sub == "attn.out_proj":
        if leaf == "bias":
            L["o_proj_bias"] = {"bias": w}
        else:
            put(L, "o_proj", w.T)
    elif sub == "norm_1":
        L.setdefault("input_layernorm", {})[leaf] = w
    elif sub == "norm_2":
        L.setdefault("post_attention_layernorm", {})[leaf] = w
    elif sub == "ffn.up_proj":
        put(L, "up_proj", w.T)
    elif sub == "ffn.down_proj":
        put(L, "down_proj", w.T)
    else:
        logger.warning("unmapped MPT weight %s", name)


def _load_exaone_weight(tree, cfg, shapes, linear_method, name, w):
    """EXAONE naming: llama math under a GPT-style tree —
    transformer.h.N.attn.attention.{q,k,v,out}_proj, ln_1/ln_2,
    mlp.c_fc_0 (gate) / c_fc_1 (up) / c_proj (down) (reference
    models/exaone.py:489 stacked-params mapping)."""
    put = _mk_put_linear(tree, linear_method)
    if name == "transformer.wte.weight":
        tree["embed_tokens"]["weight"] = w
        return
    if name == "transformer.ln_f.weight":
        tree["norm"]["weight"] = w
        return
    if name == "lm_head.weight":
        if "lm_head" in shapes:
            tree["lm_head"] = {"weight": w.T}
        return
    if not name.startswith("transformer.h."):
        return
    parts = name.split(".")
    li = int(parts[2])
    sub = ".".join(parts[3:-1])
    leaf = parts[-1]
    L = tree["layers"][li]
    sub_map = {"attn.attention.q_proj": "q_proj",
               "attn.attention.k_proj": "k_proj",
               "attn.attention.v_proj": "v_proj",
               "attn.attention.out_proj": "o_proj",
               "mlp.c_fc_0": "gate_proj", "mlp.c_fc_1": "up_proj",
               "mlp.c_proj": "down_proj"}
    if sub == "ln_1":
        L.setdefault("input_layernorm", {})[leaf] = w
    elif sub == "ln_2":
        L.setdefault("post_attention_layernorm", {})[leaf] = w
    elif sub in sub_map:
        if leaf == "bias":
            L[sub_map[sub] + "_bias"] = {"bias": w}
        else:
            put(L, sub_map[sub], w.T)
    else:
        logger.warning("unmapped EXAONE weight %s", name)


def _load_internlm2_weight(tree, cfg, shapes, linear_method, name, w):
    """InternLM2 naming: model.layers.N.attention.wqkv is grouped
    [kvh, rep+2, d, hidden] (reference models/internlm2.py)."""
    put = _mk_put_linear(tree, linear_method)
    if name == "model.tok_embeddings.weight":
        tree["embed_tokens"]["weight"] = w
        return
    if name == "model.norm.weight":
        tree["norm"]["weight"] = w
        return
    if name == "output.weight":
        if "lm_head" in shapes:
            tree["lm_head"] = {"weight": w.T}
        return
    if name == "v_head.weight" and "score" in shapes:
        # InternLM2ForRewardModel scalar head (reference
        # models/internlm2_reward.py); [1, hidden] -> score [hidden, 1]
        tree.setdefault("score", {})["weight"] = w.T
        return
    if not name.startswith("model.layers."):
        return
    parts = name.split(".")
    li = int(parts[2])
    sub = ".".join(parts[3:-1])
    leaf = parts[-1]
    L = tree["layers"][li]
    d = cfg.head_dim
    kvh = cfg.num_key_value_heads
    rep = cfg.num_attention_heads // kvh
    if sub == "attention.wqkv":
        g = w.reshape(kvh, rep + 2, d, *w.shape[1:])
        q = g[:, :rep].reshape(kvh * rep * d, *w.shape[1:])
        k = g[:, rep].reshape(kvh * d, *w.shape[1:])
        v = g[:, rep + 1].reshape(kvh * d, *w.shape[1:])
        for ours, piece in (("q_proj", q), ("k_proj", k), ("v_proj", v)):
            if leaf == "bias":
                L[ours + "_bias"] = {"bias": piece}
            else:
                put(L, ours, piece.T)
    elif sub == "attention.wo":
        put(L, "o_proj", w.T)
    elif sub == "attention_norm":
        L.setdefault("input_layernorm", {})[leaf] = w
    elif sub == "ffn_norm":
        L.setdefault("post_attention_layernorm", {})[leaf] = w
    elif sub == "feed_forward.w1":
        put(L, "gate_proj", w.T)
    elif sub == "feed_forward.w3":
        put(L, "up_proj", w.T)
    elif sub == "feed_forward.w2":
        put(L, "down_proj", w.T)
    else:
        logger.warning("unmapped InternLM2 weight %s", name)


def _load_chatglm_weight(tree, cfg, shapes, linear_method, name, w):
    """ChatGLM legacy naming (THUDM chatglm2/3 and pre-HF glm-4;
    reference models/chatglm.py): transformer.encoder.* tree, fused
    self_attention.query_key_value rows [q | k | v], fused
    mlp.dense_h_to_4h rows [gate | up] (the swiglu chunk order)."""
    put = _mk_put_linear(tree, linear_method)
    if name == "transformer.embedding.word_embeddings.weight":
        tree["embed_tokens"]["weight"] = w
        return
    if name == "transformer.output_layer.weight":
        if "lm_head" in shapes:
            tree["lm_head"] = {"weight": w.T}
        return
    if name == "transformer.encoder.final_layernorm.weight":
        tree["norm"]["weight"] = w
        return
    if "rotary_pos_emb" in name:
        return  # inv_freq buffer; rope is recomputed
    if not name.startswith("transformer.encoder.layers."):
        logger.warning("unmapped ChatGLM weight %s", name)
        return
    parts = name.split(".")
    li = int(parts[3])
    sub = ".".join(parts[4:-1])
    leaf = parts[-1]
    L = tree["layers"][li]
    if sub == "self_attention.query_key_value":
        q_rows = cfg.num_attention_heads * cfg.head_dim
        kv_rows = cfg.num_key_value_heads * cfg.head_dim
        pieces = (("q_proj", w[:q_rows]),
                  ("k_proj", w[q_rows:q_rows + kv_rows]),
                  ("v_proj", w[q_rows + kv_rows:]))
        for ours, piece in pieces:
            if leaf == "bias":
                L[ours + "_bias"] = {"bias": piece}
            else:
                put(L, ours, piece.T)
    elif sub == "self_attention.dense":
        if leaf == "bias":
            L["o_proj_bias"] = {"bias": w}
        else:
            put(L, "o_proj", w.T)
    elif sub == "mlp.dense_h_to_4h":
        half = w.shape[0] // 2
        for ours, piece in (("gate_proj", w[:half]),
                            ("up_proj", w[half:])):
            if leaf == "bias":
                L[ours + "_bias"] = {"bias": piece}
            else:
                put(L, ours, piece.T)
    elif sub == "mlp.dense_4h_to_h":
        if leaf == "bias":
            L["down_proj_bias"] = {"bias": w}
        else:
            put(L, "down_proj", w.T)
    elif sub in ("input_layernorm", "post_attention_layernorm"):
        L.setdefault(sub, {})[leaf] = w
    else:
        logger.warning("unmapped ChatGLM weight %s", name)


def _load_bert_weight(tree, cfg, shapes, name, w):
    """BERT naming (reference models/bert.py weight mapping); handles
    both bare BertModel and task-head (bert.*) checkpoints."""
    if name.startswith(("bert.", "roberta.")):
        name = name.split(".", 1)[1]
    if name.startswith("cls."):
        return  # MaskedLM head: not served
    if name.startswith("embeddings."):
        sub = name.split(".")
        if sub[1] in ("word_embeddings", "position_embeddings",
                      "token_type_embeddings"):
            tree[sub[1]]["weight"] = w
        elif sub[1] == "LayerNorm":
            tree["embed_norm"][sub[-1]] = w
        return
    if name.startswith("pooler.dense."):
        leaf = name.split(".")[-1]
        tree["pooler"][leaf] = w.T if leaf == "weight" else w
        return
    if name.startswith("classifier."):
        leaf = name.split(".")[-1]
        # Roberta head (classifier.dense -> tanh -> classifier.out_proj)
        # is exactly BERT's pooler -> classifier composition: map the
        # head-owned dense onto the pooler slot
        if name.startswith("classifier.dense."):
            tree["pooler"][leaf] = w.T if leaf == "weight" else w
            return
        if "classifier" in shapes:
            tree.setdefault("classifier", {})[leaf] = (
                w.T if leaf == "weight" else w)
        return
    if not name.startswith("encoder.layer."):
        return
    parts = name.split(".")
    li = int(parts[2])
    sub = ".".join(parts[3:-1])
    leaf = parts[-1]
    L = tree["layers"][li]
    m = {"attention.self.query": "query", "attention.self.key": "key",
         "attention.self.value": "value",
         "attention.output.dense": "attn_out",
         "attention.output.LayerNorm": "attn_norm",
         "intermediate.dense": "inter", "output.dense": "out",
         "output.LayerNorm": "out_norm"}
    ours = m.get(sub)
    if ours is None:
        logger.warning("unmapped BERT weight %s", name)
        return
    if ours.endswith("_norm"):
        L.setdefault(ours, {})[leaf] = w
    else:
        L.setdefault(ours, {})[leaf] = w.T if leaf == "weight" else w


def _load_dbrx_weight(tree, cfg, shapes, linear_method, name, w):
    """DBRX naming: transformer.blocks.N.{norm_attn_norm, ffn} with
    fused Wqkv and per-projection expert stacks [E*ffn, d] (reference
    models/dbrx.py weight mapping)."""
    put = _mk_put_linear(tree, linear_method)
    rest = name.split("transformer.", 1)[-1]
    if rest == "wte.weight":
        tree["embed_tokens"]["weight"] = w
        return
    if rest.startswith("norm_f."):
        tree["norm"][rest.split(".")[-1]] = w
        return
    if name == "lm_head.weight":
        if "lm_head" in shapes:
            tree["lm_head"] = {"weight": w.T}
        return
    if not rest.startswith("blocks."):
        return
    parts = rest.split(".")
    li = int(parts[1])
    sub = ".".join(parts[2:-1])
    leaf = parts[-1]
    L = tree["layers"][li]
    d = cfg.head_dim
    nq = cfg.num_attention_heads * d
    nkv = cfg.num_key_value_heads * d
    if sub == "norm_attn_norm.attn.Wqkv":
        for ours, piece in (("q_proj", w[:nq]),
                            ("k_proj", w[nq:nq + nkv]),
                            ("v_proj", w[nq + nkv:nq + 2 * nkv])):
            put(L, ours, piece.T)
    elif sub == "norm_attn_norm.attn.out_proj":
        put(L, "o_proj", w.T)
    elif sub == "norm_attn_norm.norm_1":
        L.setdefault("input_layernorm", {})[leaf] = w
    elif sub == "norm_attn_norm.norm_2":
        L.setdefault("post_attention_layernorm", {})[leaf] = w
    elif sub == "ffn.router.layer":
        L.setdefault("moe", {}).setdefault("router", {})["weight"] = w.T
    elif sub == "ffn.experts.mlp":
        # leaf in (w1, v1, w2): fused per-expert stacks
        e = cfg.num_local_experts
        inter = cfg.intermediate_size
        h = cfg.hidden_size
        g = w.reshape(e, inter, h)
        key = {"w1": "w1", "v1": "w3", "w2": "w2"}.get(leaf)
        if key is None:
            logger.warning("unmapped DBRX expert tensor %s", name)
            return
        # w1/v1 map hidden->inter ([E, h, inter]); w2 maps inter->hidden
        arr = g if key == "w2" else g.transpose(0, 2, 1)
        L.setdefault("moe", {}).setdefault("experts", {})[key] = arr
    else:
        logger.warning("unmapped DBRX weight %s", name)


def _load_qwen2vl_vision(vtree, vcfg, rest: str, w):
    """Qwen2-VL vision tower naming: model.visual.* (reference
    models/qwen2_vl.py vision weight mapping)."""
    if rest == "patch_embed.proj.weight":
        # Conv3d [embed, C, tps, ps, ps] with stride == kernel -> one
        # matmul [patch_dim, embed]
        vtree["patch_embed"]["weight"] = w.reshape(w.shape[0], -1).T
        return
    if rest.startswith("merger."):
        sub = rest.split(".")
        leaf = sub[-1]
        if sub[1] == "ln_q":
            vtree["merger"].setdefault("ln_q", {})[leaf] = w
        elif sub[1] == "mlp":
            key = {"0": "mlp0", "2": "mlp2"}[sub[2]]
            vtree["merger"].setdefault(key, {})[leaf] = (
                w.T if leaf == "weight" else w)
        return
    if rest.startswith("blocks."):
        parts = rest.split(".")
        li = int(parts[1])
        sub = ".".join(parts[2:-1])
        leaf = parts[-1]
        L = vtree["blocks"][li]
        m = {"norm1": "norm1", "norm2": "norm2", "attn.qkv": "qkv",
             "attn.proj": "proj", "mlp.fc1": "fc1", "mlp.fc2": "fc2",
             # Qwen2.5-VL biased-SwiGLU vision MLP
             # (reference models/qwen2_5_vl.py)
             "mlp.gate_proj": "gate_proj", "mlp.up_proj": "up_proj",
             "mlp.down_proj": "down_proj"}
        ours = m.get(sub)
        if ours is None:
            logger.warning("unmapped Qwen2-VL vision weight %s", rest)
            return
        if ours.startswith("norm"):
            L.setdefault(ours, {})[leaf] = w
        else:
            L.setdefault(ours, {})[leaf] = (
                w.T if leaf == "weight" else w)
        return
    logger.warning("unmapped Qwen2-VL vision weight %s", rest)


def _load_whisper_weight(tree, cfg, shapes, name, w):
    """Whisper naming: model.{encoder,decoder}.* (reference
    models/whisper.py weight mapping); proj_out is tied."""
    if name in ("proj_out.weight",):
        return
    if not name.startswith("model."):
        return
    rest = name[len("model."):]
    if rest.startswith("encoder."):
        sub = rest[len("encoder."):]
        enc = tree["encoder"]
        if sub.startswith("conv"):
            which, leaf = sub.split(".")
            if leaf == "weight":
                # HF conv1d [out, in, k] -> our "IHO" [in, k, out]
                enc[which]["weight"] = w.transpose(1, 2, 0)
            else:
                enc[which]["bias"] = w
            return
        if sub == "embed_positions.weight":
            enc["embed_positions"]["weight"] = w
            return
        if sub.startswith("layer_norm."):
            enc["layer_norm"][sub.split(".")[-1]] = w
            return
        if sub.startswith("layers."):
            parts = sub.split(".")
            li = int(parts[1])
            path = parts[2:-1]
            leaf = parts[-1]
            L = enc["layers"][li]
            node = L
            for p2 in path:
                node = node.setdefault(p2, {})
            node[leaf] = w.T if (leaf == "weight"
                                 and "norm" not in path[-1]) else w
            return
    if rest.startswith("decoder."):
        sub = rest[len("decoder."):]
        if sub == "embed_tokens.weight":
            tree["embed_tokens"]["weight"] = w
            return
        if sub == "embed_positions.weight":
            tree["embed_positions"]["weight"] = w
            return
        if sub.startswith("layer_norm."):
            tree["norm"][sub.split(".")[-1]] = w
            return
        if sub.startswith("layers."):
            parts = sub.split(".")
            li = int(parts[1])
            path = parts[2:-1]
            leaf = parts[-1]
            node = tree["layers"][li]
            for p2 in path:
                node = node.setdefault(p2, {})
            node[leaf] = w.T if (leaf == "weight"
                                 and "norm" not in path[-1]) else w
            return
    logger.warning("unmapped Whisper weight %s", name)


def _load_mamba_weight(tree, cfg, shapes, name, w):
    """Mamba naming: backbone.* (reference models/mamba.py mapping)."""
    if name == "backbone.embeddings.weight":
        tree["embed_tokens"]["weight"] = w
        return
    if name == "backbone.norm_f.weight":
        tree["norm"]["weight"] = w
        return
    if name == "lm_head.weight":
        if "lm_head" in shapes:
            tree["lm_head"] = {"weight": w.T}
        return
    if not name.startswith("backbone.layers."):
        return
    parts = name.split(".")
    li = int(parts[2])
    sub = ".".join(parts[3:-1])
    leaf = parts[-1]
    L = tree["layers"][li]
    if sub == "norm":
        L.setdefault("norm", {})[leaf] = w
        return
    node = L.setdefault("mixer", {})
    if sub == "mixer":  # A_log / D live directly on the mixer
        node.setdefault(leaf, {})["weight"] = w
        return
    if not sub.startswith("mixer."):
        logger.warning("unmapped Mamba weight %s", name)
        return
    which = sub[len("mixer."):]
    if which == "conv1d":
        if leaf == "weight":
            node.setdefault("conv1d", {})["weight"] = w[:, 0, :]
        else:
            node.setdefault("conv1d", {})["bias"] = w
    elif which in ("in_proj", "x_proj", "dt_proj", "out_proj"):
        node.setdefault(which, {})[leaf] = (w.T if leaf == "weight"
                                            else w)
    elif which == "norm":  # Mamba2 gated RMSNorm inside the mixer
        node.setdefault("norm", {})[leaf] = w
    else:
        logger.warning("unmapped Mamba weight %s", name)


def load_hf(model, mesh: Mesh, model_dir: str,
            linear_method: LinearMethod) -> Any:
    """Load a local HF checkpoint directory into the model's param tree."""
    cfg = model.cfg
    shapes = model.param_shapes()
    # skeleton mirrors the model's own param tree (llama vs opt etc.)
    tree: Dict[str, Any] = {
        k: ([dict() for _ in range(cfg.num_hidden_layers)]
            if k == "layers" else {})
        for k in shapes if k != "lm_head"
    }
    is_pq = isinstance(linear_method, PQLinearMethod)
    pending_aqlm: Dict[tuple, Dict[str, np.ndarray]] = {}
    is_deepseek = model.__class__.__name__ in ("DeepseekV2Model",
                                               "DeepseekVL2Model")
    is_moe = model.__class__.__name__ in ("MixtralModel", "Qwen2MoeModel",
                                          "DeepseekV2Model",
                                          "DeepseekVL2Model",
                                          "ArcticModel", "AriaModel")
    is_aria = model.__class__.__name__ == "AriaModel"
    if is_aria:
        tree["vision"] = {
            "tower": {"layers": [dict() for _ in range(
                model.vision_tower.n_blocks)]},
            "projector": {},
        }
    is_llava = model.__class__.__name__ in ("LlavaModel",
                                            "LlavaNextModel",
                                            "LlavaOnevisionModel",
                                            "LlavaNextVideoModel")
    is_paligemma = model.__class__.__name__ == "PaliGemmaModel"
    is_internvl = model.__class__.__name__ == "InternVLModel"
    is_idefics3 = model.__class__.__name__ == "Idefics3Model"
    is_fuyu = model.__class__.__name__ == "FuyuModel"
    is_blip2 = model.__class__.__name__ == "Blip2Model"
    if is_blip2:
        tree["vision"] = {
            "tower": {"layers": [dict() for _ in range(
                model.vision_cfg.num_hidden_layers)]},
            "qformer": {"layers": [dict() for _ in range(
                model.qformer_cfg.num_hidden_layers)]},
            "projector": {},
        }
    if model.__class__.__name__ == "MolmoModel":
        tree["vision"] = {
            "tower": {"layers": [dict() for _ in range(
                model.vis["layers"])]},
            "pooling": {}, "projector": {},
        }
    is_qwen_vl = model.__class__.__name__ == "QwenVLModel"
    if is_qwen_vl:
        tree["vision"] = {
            "tower": {"layers": [dict() for _ in range(
                model.visual["layers"])]},
            "attn_pool": {},
        }
    is_glm4v = model.__class__.__name__ == "GLM4VModel"
    if is_glm4v:
        tree["vision"] = {
            "tower": {"layers": [dict() for _ in range(
                model.vision_cfg["num_hidden_layers"])]},
            "projector": {},
        }
    is_dsvl2 = model.__class__.__name__ == "DeepseekVL2Model"
    if is_dsvl2:
        tree["vision"] = {
            "tower": {"layers": [dict() for _ in range(
                model.vision_tower.n_blocks)]},
            "projector": {"layers": [dict() for _ in range(
                model.projector_depth)]},
        }
    is_minicpmv = model.__class__.__name__ == "MiniCPMVModel"
    if is_minicpmv:
        tree["vision"] = {
            "tower": {"layers": [dict() for _ in range(
                model.vision_tower.n_blocks)]},
            "resampler": {},
        }
    is_phi3v = model.__class__.__name__ == "Phi3VModel"
    is_phi4mm = model.__class__.__name__ == "Phi4MMModel"
    if is_phi3v or is_phi4mm:
        tree["vision"] = {
            "tower": {"layers": [dict() for _ in range(
                model.vision_tower.n_blocks)]},
            "projector": {},
        }
    if is_phi4mm and getattr(model, "audio_encoder", None) is not None:
        enc = model.audio_encoder
        tree["vision"]["audio"] = {
            "nemo": {"layers": [dict() for _ in range(
                2 * enc.n_sub - 1)], "out": {}},
            "blocks": [
                {"ff_in": {}, "attn": {}, "conv": {}, "ff_out": {}}
                for _ in range(enc.cfg.num_blocks)],
            "proj": {},
        }
    is_ultravox = model.__class__.__name__ == "UltravoxModel"
    is_q2audio = model.__class__.__name__ == "Qwen2AudioModel" \
        or is_ultravox
    if is_q2audio:
        tree["vision"] = {
            "tower": {"layers": [dict() for _ in range(
                model.audio_cfg.encoder_layers)]},
            "projector": {},
        }
    if is_llava or is_paligemma or is_internvl or is_idefics3:
        tree["vision"] = {
            "tower": {"layers": [dict() for _ in
                                 range(model.vision_tower.n_blocks)]},
            "projector": {},
        }
    if is_fuyu:
        tree["vision"] = {"vision_embed_tokens": {}}
    # deepseek routed experts: layer -> proj -> expert idx -> [in, out]
    pending_experts: Dict[int, Dict[str, Dict[int, np.ndarray]]] = {}

    def to_np(x):
        if x.dtype == np.dtype("bfloat16") if hasattr(np, "bfloat16") \
                else False:
            return x
        return x

    _OPT_MAP = {
        "self_attn.q_proj": "q_proj", "self_attn.k_proj": "k_proj",
        "self_attn.v_proj": "v_proj", "self_attn.out_proj": "out_proj",
        "fc1": "fc1", "fc2": "fc2",
        "self_attn_layer_norm": "self_attn_layer_norm",
        "final_layer_norm": "final_layer_norm",
    }

    _GPT2_MAP = {"attn.c_proj": "c_proj", "mlp.c_fc": "c_fc",
                 "mlp.c_proj": "mlp_c_proj", "ln_1": "ln_1",
                 "ln_2": "ln_2"}

    is_gpt2 = model.__class__.__name__ == "GPT2Model"
    is_bert = model.__class__.__name__ == "BertModel"
    fam = getattr(cfg, "hf_family", "llama")
    fam_loaders = {"gptj": _load_gptj_weight, "bloom": _load_bloom_weight,
                   "mpt": _load_mpt_weight,
                   "internlm2": _load_internlm2_weight,
                   "chatglm": _load_chatglm_weight,
                   "dbrx": _load_dbrx_weight,
                   "exaone": _load_exaone_weight,
                   "telechat2": _load_telechat2_weight,
                   "fairseq2": _load_fairseq2_weight,
                   "qwen_v1": _load_qwen_v1_weight,
                   "molmo": _load_molmo_weight,
                   "phi3small": _load_phi3small_weight,
                   "jais": _load_jais_weight}
    if fam == "qwen2_vl":
        nv = model.cfg.vision.depth
        tree["vision"] = {"patch_embed": {},
                          "blocks": [dict() for _ in range(nv)],
                          "merger": {}}
    is_prithvi = model.__class__.__name__ == "PrithviModel"
    if is_prithvi:
        tree.update(patch_embed={}, cls_token={}, norm={},
                    blocks=[dict() for _ in range(model.depth)])
    is_florence2 = model.__class__.__name__ == "Florence2Model"
    is_bart = model.__class__.__name__ == "BartModel" or is_florence2
    if is_bart:
        tree["encoder"] = {
            "embed_positions": {}, "layernorm_embedding": {},
            "layers": [dict() for _ in range(cfg.encoder_layers)]}
        tree["embed_positions"] = {}
        tree["layernorm_embedding"] = {}
        tree["final_logits_bias"] = {
            "weight": np.zeros(cfg.vocab_size, np.float32)}
    if is_florence2:
        tree["vision"] = {"stages": [
            {"blocks": [dict() for _ in range(dp)]}
            for dp in model.depths]}
    is_whisper = model.__class__.__name__ == "WhisperModel"
    if is_whisper:
        tree["encoder"] = {
            "conv1": {}, "conv2": {}, "embed_positions": {},
            "layer_norm": {},
            "layers": [dict() for _ in range(cfg.encoder_layers)]}
        tree["embed_positions"] = {}
    is_mamba = model.__class__.__name__ in ("MambaModel", "Mamba2Model")
    is_jamba = model.__class__.__name__ in ("JambaModel", "BambaModel")
    is_mllama = model.__class__.__name__ == "MllamaModel"
    if is_mllama:
        v = model.cfg.vision
        tree["vision"] = {
            "layers": [dict() for _ in range(v.num_hidden_layers)],
            "global_layers": [dict()
                              for _ in range(v.num_global_layers)],
        }
    for name, tensor in _iter_safetensors(model_dir):
        tensor = np.asarray(tensor)
        if is_mllama:
            _load_mllama_weight(tree, cfg, shapes, linear_method, name,
                                tensor)
            continue
        if is_mamba:
            _load_mamba_weight(tree, cfg, shapes, name, tensor)
            continue
        if is_jamba:
            _load_jamba_weight(tree, cfg, shapes, linear_method, name,
                               tensor, pending_experts)
            continue
        if is_whisper:
            _load_whisper_weight(tree, cfg, shapes, name, tensor)
            continue
        if is_prithvi:
            _load_prithvi_weight(tree, cfg, name, tensor)
            continue
        if is_florence2:
            _load_florence2_weight(tree, cfg, name, tensor)
            continue
        if is_bart:
            _load_bart_weight(tree, cfg, name, tensor)
            continue
        if is_bert:
            _load_bert_weight(tree, cfg, shapes, name, tensor)
            continue
        if fam == "qwen2_vl":
            # both naming generations: "visual./model.layers." (legacy
            # save layout) and "model.visual./model.language_model."
            if name.startswith(("visual.", "model.visual.")):
                rest = name.split("visual.", 1)[1]
                _load_qwen2vl_vision(tree["vision"], model.cfg.vision,
                                     rest, tensor)
                continue
            if name.startswith("model.language_model."):
                name = "model." + name[len("model.language_model."):]
        if fam == "mistral_native" or name.startswith(
                ("tok_embeddings.", "vision_encoder.",
                 "vision_language_adapter.")) \
                or (name.startswith("layers.")
                    and (".attention." in name or ".feed_forward." in name
                         or name.endswith(("attention_norm.weight",
                                           "ffn_norm.weight")))):
            # Mistral consolidated format (params.json checkpoints):
            # bare top-level names, unique among supported layouts
            if name.startswith("vision_encoder."):
                _load_pixtral_native_vision(
                    tree["vision"], name[len("vision_encoder."):],
                    tensor)
                continue
            if name.startswith("vision_language_adapter."):
                parts = name.split(".")
                sub = {"w_in": "linear_1", "w_out": "linear_2"}[parts[1]]
                d = tree["vision"]["projector"].setdefault(sub, {})
                d[parts[2]] = (tensor.T if parts[2] == "weight"
                               else tensor)
                continue
            _load_mistral_native_weight(tree, cfg, shapes, linear_method,
                                        name, tensor)
            continue
        if is_qwen_vl and name.startswith("transformer.visual."):
            # Qwen-VL CLIP ViT + attn_pool resampler (models/qwen_vl.py)
            rest_q = name[len("transformer.visual."):]
            V = tree["vision"]
            T = V["tower"]
            if rest_q == "conv1.weight":
                ww = tensor.shape[0]
                T["conv1"] = {"weight": tensor.transpose(1, 2, 3, 0)
                              .reshape(-1, ww)}
            elif rest_q == "positional_embedding":
                T["positional_embedding"] = {"weight": tensor}
            elif rest_q.startswith("ln_pre."):
                T.setdefault("ln_pre", {})[
                    rest_q.split(".")[-1]] = tensor
            elif rest_q.startswith("transformer.resblocks."):
                parts_q = rest_q.split(".")
                L = T["layers"][int(parts_q[2])]
                sub = ".".join(parts_q[3:-1])
                leaf = parts_q[-1]
                m = {"attn.in_proj": "in_proj",
                     "attn.out_proj": "out_proj",
                     "mlp.c_fc": "c_fc", "mlp.c_proj": "c_proj",
                     "ln_1": "ln_1", "ln_2": "ln_2"}
                ours = m.get(sub)
                if ours is None:
                    logger.warning("unmapped qwen-vl vision weight %s",
                                   name)
                    continue
                L.setdefault(ours, {})[leaf] = (
                    tensor.T if leaf == "weight"
                    and not ours.startswith("ln_") else tensor)
            elif rest_q.startswith("attn_pool."):
                ap = V["attn_pool"]
                sub = rest_q[len("attn_pool."):]
                if sub == "query":
                    ap["query"] = {"weight": tensor}
                elif sub == "pos_embed":
                    ap["pos_embed"] = {"weight": tensor}
                elif sub == "attn.in_proj_weight":
                    ap.setdefault("in_proj", {})["weight"] = tensor.T
                elif sub == "attn.in_proj_bias":
                    ap.setdefault("in_proj", {})["bias"] = tensor
                elif sub.startswith("attn.out_proj."):
                    leaf = sub.split(".")[-1]
                    ap.setdefault("out_proj", {})[leaf] = (
                        tensor.T if leaf == "weight" else tensor)
                elif sub.startswith(("kv_proj.", "ln_q.", "ln_kv.")):
                    part, leaf = sub.split(".")
                    ap.setdefault(part, {})[leaf] = (
                        tensor.T if leaf == "weight"
                        and part == "kv_proj" else tensor)
                else:
                    logger.warning("unmapped qwen-vl attn_pool "
                                   "weight %s", name)
            elif rest_q.startswith("ln_post."):
                V.setdefault("ln_post", {})[
                    rest_q.split(".")[-1]] = tensor
            elif rest_q == "proj":
                V["proj"] = {"weight": tensor}
            else:
                logger.warning("unmapped qwen-vl vision weight %s",
                               name)
            continue
        if is_glm4v and name.startswith("transformer.vision."):
            # GLM-4V EVA2-CLIP tower + GLU projector (models/glm4v.py)
            rest_g = name[len("transformer.vision."):]
            V = tree["vision"]
            T = V["tower"]
            if rest_g == "patch_embedding.proj.weight":
                hh = tensor.shape[0]
                T["patch_embedding"] = dict(
                    T.get("patch_embedding", {}),
                    weight=tensor.transpose(2, 3, 1, 0).reshape(-1, hh))
            elif rest_g == "patch_embedding.proj.bias":
                T.setdefault("patch_embedding", {})["bias"] = tensor
            elif rest_g == "patch_embedding.cls_embedding":
                T["cls_embedding"] = {"weight": tensor.reshape(-1)}
            elif rest_g == "patch_embedding.position_embedding.weight":
                T["position_embedding"] = {"weight": tensor}
            elif rest_g in ("boi", "eoi"):
                V[rest_g] = {"weight": tensor.reshape(-1)}
            elif rest_g == "conv.weight":
                # conv2d [out, in, 2, 2] -> matmul over (C, kh, kw)
                o2 = tensor.shape[0]
                V["conv"] = dict(V.get("conv", {}),
                                 weight=tensor.transpose(1, 2, 3, 0)
                                 .reshape(-1, o2))
            elif rest_g == "conv.bias":
                V.setdefault("conv", {})["bias"] = tensor
            elif rest_g.startswith("linear_proj."):
                parts_g = rest_g.split(".")
                sub, leaf = parts_g[1], parts_g[-1]
                d2 = V["projector"].setdefault(sub, {})
                d2[leaf] = (tensor.T if leaf == "weight"
                            and "norm" not in sub else tensor)
            elif rest_g.startswith("transformer.layers."):
                parts_g = rest_g.split(".")
                L = T["layers"][int(parts_g[2])]
                sub = ".".join(parts_g[3:-1])
                leaf = parts_g[-1]
                m = {"attention.query_key_value": "query_key_value",
                     "attention.dense": "dense",
                     "mlp.fc1": "fc1", "mlp.fc2": "fc2",
                     "input_layernorm": "input_layernorm",
                     "post_attention_layernorm":
                         "post_attention_layernorm"}
                ours = m.get(sub)
                if ours is None:
                    logger.warning("unmapped glm4v vision weight %s",
                                   name)
                    continue
                L.setdefault(ours, {})[leaf] = (
                    tensor.T if leaf == "weight"
                    and "norm" not in ours else tensor)
            else:
                logger.warning("unmapped glm4v vision weight %s", name)
            continue
        if fam in fam_loaders and not is_internvl:
            # (internvl routes only its language_model.* names through
            # the family loader — the tower/projector names must reach
            # the is_internvl branch below)
            fam_loaders[fam](tree, cfg, shapes, linear_method, name,
                             tensor)
            continue
        if fam == "baichuan" and name.endswith("self_attn.W_pack.weight"):
            # fused qkv [q|k|v] contiguous rows (reference
            # models/baichuan.py W_pack weight loader)
            li = int(name.split(".")[2])
            d = cfg.head_dim
            nq = cfg.num_attention_heads * d
            nkv = cfg.num_key_value_heads * d
            put = _mk_put_linear(tree, linear_method)
            for ours, piece in (("q_proj", tensor[:nq]),
                                ("k_proj", tensor[nq:nq + nkv]),
                                ("v_proj", tensor[nq + nkv:nq + 2 * nkv])):
                put(tree["layers"][li], ours, piece.T)
            continue
        if not is_gpt2 and (name.startswith("transformer.word_embeddings")
                            or name.startswith("transformer.h.")
                            or name.startswith("transformer.ln_f.")):
            # Falcon family (generalized llama decoder, registry
            # _build_falcon). Fused query_key_value is grouped per kv
            # head: [kvh, q_per_kv + 2, d, hidden] — covering 7B MQA
            # (kvh=1), 40B GQA and RW-1B per-head interleaved (kvh=H).
            _load_falcon_weight(tree, cfg, shapes, linear_method,
                                name, tensor)
            continue
        if is_blip2:
            # BLIP-2 composition (models/blip2.py): ViT + Q-Former +
            # language_projection + OPT LM under language_model.
            if name.startswith("model."):
                name = name[len("model."):]
            if name.startswith(("vision_model.", "qformer.",
                                "language_projection.")) \
                    or name == "query_tokens":
                _load_blip2_weight(tree, name, tensor)
                continue
            if name.startswith("language_model."):
                name = name[len("language_model."):]
        if is_q2audio:
            # Qwen2-Audio composition (models/qwen2_audio.py):
            # audio_tower + one-linear projector + Qwen2 LM under
            # language_model. ([model.]-prefixed in newer layouts)
            if name.startswith("model."):
                name = name[len("model."):]
            if name.startswith("audio_tower."):
                _load_qwen2audio_tower(tree["vision"]["tower"],
                                       name[len("audio_tower."):],
                                       tensor)
                continue
            if is_ultravox and name.startswith("multi_modal_projector."):
                # Ultravox projector: ln_pre/linear_1/ln_mid|ln_post/
                # linear_2 (reference models/ultravox.py:248)
                parts = name.split(".")
                sub, leaf = parts[1], parts[-1]
                d = tree["vision"]["projector"].setdefault(sub, {})
                d[leaf] = (tensor.T if leaf == "weight"
                           and sub.startswith("linear") else tensor)
                continue
            if name.startswith("multi_modal_projector.linear."):
                leaf = name.split(".")[-1]
                d = tree["vision"]["projector"].setdefault("linear", {})
                d[leaf] = tensor.T if leaf == "weight" else tensor
                continue
            if name.startswith("language_model."):
                name = name[len("language_model."):]
                if not name.startswith(("model.", "lm_head.")):
                    name = "model." + name
        if is_fuyu:
            # Fuyu composition (models/fuyu.py): Persimmon decoder
            # under [model.]language_model.[model.], one
            # vision_embed_tokens linear (both HF checkpoint layouts)
            if name.startswith("model."):
                name = name[len("model."):]
            if name.startswith("vision_embed_tokens."):
                leaf = name.split(".")[-1]
                d = tree["vision"]["vision_embed_tokens"]
                d[leaf] = tensor.T if leaf == "weight" else tensor
                continue
            if name.startswith("language_model."):
                name = name[len("language_model."):]
                if not name.startswith(("model.", "lm_head.")):
                    name = "model." + name
        if is_idefics3:
            # Idefics3 composition (models/idefics3.py): "model."
            # prefix; SigLIP tower under vision_model., pixel-shuffle
            # connector, Llama LM under text_model.
            if name.startswith("model."):
                name = name[len("model."):]
            if name.startswith("vision_model."):
                _load_siglip_vision(
                    tree["vision"]["tower"],
                    name[len("vision_model."):], tensor)
                continue
            if name == "connector.modality_projection.proj.weight":
                tree["vision"]["projector"].setdefault("proj", {})[
                    "weight"] = tensor.T
                continue
            if name.startswith("text_model."):
                # the llama tree sits directly under text_model. (no
                # nested model.); re-prefix for the generic branch
                name = "model." + name[len("text_model."):]
        if is_aria:
            # Aria composition (models/aria.py): idefics3 tower under
            # [model.]vision_tower., learned-query cross-attn projector
            # under multi_modal_projector., Aria MoE text under
            # language_model. (fused grouped-expert stacks handled in
            # the MoE branch below)
            if name.startswith("model."):
                name = name[len("model."):]
            if name.startswith("vision_tower."):
                _load_siglip_vision(tree["vision"]["tower"],
                                    name[len("vision_tower."):], tensor)
                continue
            if name.startswith("multi_modal_projector."):
                rest_p = name[len("multi_modal_projector."):]
                Pj = tree["vision"]["projector"]
                if rest_p == "query":
                    Pj["query"] = {"weight": tensor}
                elif rest_p.startswith("cross_attn.multihead_attn."
                                       "in_proj_"):
                    leaf = rest_p.rsplit("_", 1)[-1]
                    Pj.setdefault("in_proj", {})[leaf] = tensor
                elif rest_p.startswith(
                        "cross_attn.multihead_attn.out_proj."):
                    leaf = rest_p.split(".")[-1]
                    Pj.setdefault("out_proj", {})[leaf] = (
                        tensor.T if leaf == "weight" else tensor)
                elif rest_p.startswith("cross_attn."):
                    parts_p = rest_p.split(".")
                    sub, leaf = parts_p[1], parts_p[-1]
                    ours = {"q_proj": "q_proj", "k_proj": "k_proj",
                            "v_proj": "v_proj", "linear": "linear",
                            "layer_norm": "layer_norm_q",
                            "layer_norm_kv": "layer_norm_kv"}[sub]
                    Pj.setdefault(ours, {})[leaf] = (
                        tensor.T if leaf == "weight"
                        and "norm" not in ours else tensor)
                elif rest_p.startswith("layer_norm."):
                    Pj.setdefault("layer_norm", {})[
                        rest_p.split(".")[-1]] = tensor
                elif rest_p.startswith("feed_forward."):
                    parts_p = rest_p.split(".")
                    ours = {"linear_in": "ffn_in",
                            "linear_out": "ffn_out"}[parts_p[1]]
                    Pj.setdefault(ours, {})[parts_p[-1]] = (
                        tensor.T if parts_p[-1] == "weight" else tensor)
                else:
                    logger.warning("unmapped aria projector weight %s",
                                   name)
                continue
            if name.startswith("language_model."):
                name = name[len("language_model."):]
                if not name.startswith(("model.", "lm_head.")):
                    name = "model." + name
        if is_dsvl2:
            # DeepSeek-VL2 (models/deepseek_vl2.py): timm-SigLIP names
            # under vision., MlpProjector under projector., newline/
            # separator tokens, DeepSeek-V2 text under language.
            T = tree["vision"]["tower"]
            if name == "image_newline":
                tree["vision"]["image_newline"] = {"weight": tensor}
                continue
            if name == "view_seperator":
                tree["vision"]["view_seperator"] = {"weight": tensor}
                continue
            if name.startswith("projector.layers."):
                parts_d = name.split(".")
                li_p = int(parts_d[2]) // 2  # Sequential indices 0,2,4
                tree["vision"]["projector"]["layers"][li_p][
                    parts_d[-1]] = (tensor.T if parts_d[-1] == "weight"
                                    else tensor)
                continue
            if name.startswith("vision."):
                rest_v = name[len("vision."):]
                if rest_v == "patch_embed.proj.weight":
                    hh = tensor.shape[0]
                    T["patch_embedding"] = dict(
                        T.get("patch_embedding", {}),
                        weight=tensor.transpose(2, 3, 1, 0)
                        .reshape(-1, hh))
                elif rest_v == "patch_embed.proj.bias":
                    T.setdefault("patch_embedding", {})["bias"] = tensor
                elif rest_v == "pos_embed":
                    T["position_embedding"] = {"weight": tensor[0]}
                elif rest_v.startswith("norm."):
                    T.setdefault("post_layernorm", {})[
                        rest_v.split(".")[-1]] = tensor
                elif rest_v.startswith("blocks."):
                    parts_v = rest_v.split(".")
                    L = T["layers"][int(parts_v[1])]
                    sub = ".".join(parts_v[2:-1])
                    leaf = parts_v[-1]
                    if sub == "attn.qkv":
                        dh = tensor.shape[0] // 3
                        for i, n2 in enumerate(("q_proj", "k_proj",
                                                "v_proj")):
                            piece = tensor[i * dh:(i + 1) * dh]
                            L.setdefault(n2, {})[leaf] = (
                                piece.T if leaf == "weight" else piece)
                    else:
                        m = {"attn.proj": "out_proj",
                             "norm1": "layer_norm1",
                             "norm2": "layer_norm2",
                             "mlp.fc1": "fc1", "mlp.fc2": "fc2"}
                        ours = m.get(sub)
                        if ours is None:
                            logger.warning("unmapped deepseek-vl2 "
                                           "vision weight %s", name)
                            continue
                        L.setdefault(ours, {})[leaf] = (
                            tensor.T if leaf == "weight"
                            and "norm" not in ours else tensor)
                elif rest_v.startswith("attn_pool."):
                    pass  # timm map-pool head: unused (features tap)
                else:
                    logger.warning("unmapped deepseek-vl2 vision "
                                   "weight %s", name)
                continue
            if name.startswith("language."):
                name = name[len("language."):]
                if not name.startswith(("model.", "lm_head.")):
                    name = "model." + name
        if is_minicpmv:
            # MiniCPM-V composition (models/minicpmv.py): SigLIP tower
            # under vpm., Resampler2_5 under resampler., LM under llm.
            if name.startswith("vpm."):
                _load_siglip_vision(tree["vision"]["tower"],
                                    name[len("vpm."):], tensor)
                continue
            if name.startswith("resampler."):
                rest_r = name[len("resampler."):]
                R = tree["vision"]["resampler"]
                if rest_r == "query":
                    R["query"] = {"weight": tensor}
                elif rest_r == "proj":
                    R["proj"] = {"weight": tensor}
                elif rest_r == "kv_proj.weight":
                    R["kv_proj"] = {"weight": tensor.T}
                elif rest_r.startswith("attn.in_proj_"):
                    R.setdefault("in_proj", {})[
                        rest_r.rsplit("_", 1)[-1]] = tensor
                elif rest_r.startswith("attn.out_proj."):
                    # stored torch-style [out, in] (model applies x@w.T)
                    R.setdefault("out_proj", {})[
                        rest_r.split(".")[-1]] = tensor
                elif rest_r.startswith(("ln_q.", "ln_kv.", "ln_post.")):
                    sub, leaf = rest_r.split(".")
                    R.setdefault(sub, {})[leaf] = tensor
                else:
                    logger.warning("unmapped minicpmv resampler "
                                   "weight %s", name)
                continue
            if name.startswith("llm."):
                name = name[len("llm."):]
                if not name.startswith(("model.", "lm_head.")):
                    name = "model." + name
            elif name.startswith(("apm.", "tts.", "audio_projection")):
                continue  # MiniCPM-O audio/TTS heads: unused at serving
        if is_phi4mm:
            # Phi-4-MM (reference models/phi4mm.py): vision under
            # model.embed_tokens_extend.image_embed.*; the audio_embed
            # conformer is not yet implemented (skipped); base decoder
            # is Phi-4-mini with fused qkv/gate_up (generic branch)
            if ".image_embed." in name:
                rest = name.split(".image_embed.", 1)[1]
                if rest.startswith("img_processor."):
                    sub = rest.split("img_processor.", 1)[1]
                    if sub.startswith("vision_model."):
                        sub = sub[len("vision_model."):]
                    _load_siglip_vision(tree["vision"]["tower"], sub,
                                        tensor)
                elif rest in ("glb_GN", "sub_GN"):
                    tree["vision"][rest] = {
                        "weight": tensor.reshape(-1)}
                elif rest.startswith("img_projection."):
                    parts = rest.split(".")
                    sub = {"0": "linear_1", "2": "linear_2"}[parts[1]]
                    d = tree["vision"]["projector"].setdefault(sub, {})
                    d[parts[2]] = (tensor.T if parts[2] == "weight"
                                   else tensor)
                else:
                    logger.warning("unmapped phi4mm vision weight %s",
                                   name)
                continue
            if ".audio_embed." in name:
                if "audio" not in tree.get("vision", {}):
                    continue  # no audio_processor config
                _load_phi4mm_audio_weight(
                    tree["vision"]["audio"],
                    name.split(".audio_embed.", 1)[1], tensor)
                continue
        if is_phi3v and ".vision_embed_tokens." in name:
            # Phi-3-Vision (reference models/phi3v.py weight names):
            # model.vision_embed_tokens.{img_processor.vision_model.*,
            # glb_GN, sub_GN, img_projection.{0,2}.*}
            rest = name.split(".vision_embed_tokens.", 1)[1]
            if rest.startswith("img_processor.vision_model."):
                _load_llava_vision(
                    tree["vision"]["tower"], model,
                    rest.split("vision_model.", 1)[1], tensor)
            elif rest in ("glb_GN", "sub_GN"):
                tree["vision"][rest] = {"weight": tensor.reshape(-1)}
            elif rest.startswith("img_projection."):
                parts = rest.split(".")
                sub = {"0": "linear_1", "2": "linear_2"}[parts[1]]
                d = tree["vision"]["projector"].setdefault(sub, {})
                d[parts[2]] = (tensor.T if parts[2] == "weight"
                               else tensor)
            else:
                logger.warning("unmapped phi3v vision weight %s", name)
            continue
        if is_internvl:
            # InternVL composition (models/internvl.py): "model."
            # prefix; InternViT tower directly under vision_tower.,
            # LN+MLP projector, Qwen2/Llama LM under language_model.
            # Legacy OpenGVLab layout (InternVLChatModel, reference
            # models/internvl.py): tower under vision_model., projector
            # as mlp1.{0,1,3}, InternLM2/Qwen2 LM under language_model.
            if name.startswith("model."):
                name = name[len("model."):]
            if name.startswith("vision_tower."):
                _load_internvit_vision(
                    tree["vision"]["tower"],
                    name[len("vision_tower."):], tensor)
                continue
            if name.startswith("vision_model."):
                _load_internvit_legacy(
                    tree["vision"]["tower"],
                    name[len("vision_model."):], tensor)
                continue
            if name.startswith("mlp1."):
                parts = name.split(".")
                sub = {"0": "layer_norm", "1": "linear_1",
                       "3": "linear_2"}[parts[1]]
                d = tree["vision"]["projector"].setdefault(sub, {})
                d[parts[2]] = tensor.T if (parts[2] == "weight"
                                           and sub != "layer_norm") \
                    else tensor
                continue
            if name.startswith("multi_modal_projector."):
                parts = name.split(".")
                sub, leaf = parts[1], parts[2]
                d = tree["vision"]["projector"].setdefault(sub, {})
                d[leaf] = tensor.T if (leaf == "weight"
                                       and sub != "layer_norm") \
                    else tensor
                continue
            if name.startswith("language_model."):
                name = name[len("language_model."):]
                if fam in fam_loaders:
                    # legacy text stack (InternLM2 wqkv naming)
                    fam_loaders[fam](tree, cfg, shapes, linear_method,
                                     name, tensor)
                    continue
        if is_paligemma:
            # PaliGemma composition (models/paligemma.py): HF nests
            # everything under a leading "model."; vision tower is
            # SigLIP, projector is one linear, LM is Gemma (generic
            # llama branch after stripping language_model.)
            if name.startswith("model."):
                name = name[len("model."):]
            if name.startswith("vision_tower.vision_model."):
                _load_siglip_vision(
                    tree["vision"]["tower"],
                    name.split("vision_model.", 1)[1], tensor)
                continue
            if name.startswith("multi_modal_projector.linear."):
                leaf = name.split(".")[-1]
                d = tree["vision"]["projector"].setdefault("linear", {})
                d[leaf] = tensor.T if leaf == "weight" else tensor
                continue
            if name.startswith("language_model."):
                name = name[len("language_model."):]
        if is_llava:
            # LLaVA composition (models/llava.py): LM weights carry a
            # language_model. prefix (strip and fall through to the
            # generic branches); vision tower + projector are collected
            # into tree["vision"]
            if name.startswith("language_model."):
                name = name[len("language_model."):]
            elif name.startswith("vision_tower.vision_model."):
                rest = name.split("vision_model.", 1)[1]
                if type(model.vision_tower).__name__ \
                        == "SiglipVisionTower":
                    # LLaVA-OneVision SigLIP tower (reference
                    # models/llava_onevision.py init_vision_tower)
                    _load_siglip_vision(tree["vision"]["tower"], rest,
                                        tensor)
                else:
                    _load_llava_vision(tree["vision"]["tower"], model,
                                       rest, tensor)
                continue
            elif name.startswith("vision_tower."):
                # pixtral tower: names sit directly under vision_tower.
                _load_pixtral_vision(tree["vision"]["tower"], model,
                                     name.split("vision_tower.", 1)[1],
                                     tensor)
                continue
            elif name.startswith("multi_modal_projector."):
                parts = name.split(".")
                lin, leaf = parts[1], parts[2]
                d = tree["vision"]["projector"].setdefault(lin, {})
                d[leaf] = tensor.T if leaf == "weight" else tensor
                continue
            elif name == "image_newline":
                # LLaVA-NeXT learned row terminator (reference
                # models/llava_next.py image_newline)
                tree["vision"]["image_newline"] = {"weight": tensor}
                continue
        if name.startswith("transformer.") or name.startswith("h."):
            # GPT-2 family (models/gpt2.py); Conv1D weights are already
            # [in, out], the fused c_attn splits into q/k/v thirds.
            # GPT-BigCode stores nn.Linear [out, in] (transpose) and its
            # fused c_attn is [q | kv_k | kv_v] (MQA; reference
            # models/gpt_bigcode.py)
            is_bigcode = getattr(cfg, "hf_family", "") == "gpt_bigcode"
            if is_bigcode and name == "lm_head.weight":
                continue  # tied to wte
            if is_bigcode and name.endswith(".weight") \
                    and ".ln_" not in name and "wte" not in name \
                    and "wpe" not in name and "ln_f" not in name:
                tensor = tensor.T
            rest = name.split("transformer.", 1)[-1]
            if rest.split(".")[0] in ("wte", "wpe"):
                tree.setdefault(rest.split(".")[0], {})["weight"] = tensor
            elif rest.startswith("ln_f."):
                tree.setdefault("ln_f", {})[rest.split(".")[-1]] = tensor
            elif rest.startswith("h."):
                parts = rest.split(".")
                li = int(parts[1])
                sub = ".".join(parts[2:-1])
                leaf = parts[-1]
                if sub == "attn.c_attn":
                    if is_bigcode:
                        nq = cfg.hidden_size
                        kvd = cfg.num_key_value_heads * cfg.head_dim
                        pieces = (tensor[..., :nq],
                                  tensor[..., nq:nq + kvd],
                                  tensor[..., nq + kvd:nq + 2 * kvd])
                    else:
                        h3 = tensor.shape[-1] // 3
                        pieces = (tensor[..., :h3], tensor[..., h3:2 * h3],
                                  tensor[..., 2 * h3:])
                    for ours, piece in zip(("q_proj", "k_proj", "v_proj"),
                                           pieces):
                        if leaf == "bias":
                            tree["layers"][li][ours + "_bias"] = {
                                "bias": piece}
                        else:
                            tree["layers"][li][ours] = (
                                linear_method.quantize(piece, np.float32)
                                if not isinstance(
                                    linear_method, UnquantizedLinearMethod)
                                else {"weight": piece})
                    continue
                ours = _GPT2_MAP.get(sub)
                if ours is None:
                    logger.warning("unmapped GPT-2 weight %s", name)
                elif "ln_" in ours:
                    tree["layers"][li].setdefault(ours, {})[leaf] = tensor
                elif leaf == "bias":
                    tree["layers"][li][ours + "_bias"] = {"bias": tensor}
                else:
                    tree["layers"][li][ours] = (
                        linear_method.quantize(tensor, np.float32)
                        if not isinstance(linear_method,
                                          UnquantizedLinearMethod)
                        else {"weight": tensor})
            continue
        if name.startswith("gpt_neox.") or name == "embed_out.weight":
            # GPT-NeoX family (generalized llama decoder, registry
            # _build_gpt_neox). The fused query_key_value is stored
            # HEAD-INTERLEAVED: rows grouped as [heads, (q,k,v), d]
            # (reference models/gpt_neox.py weight_loader).
            if name == "embed_out.weight":
                if "lm_head" in shapes:
                    tree["lm_head"] = {"weight": tensor.T}
                continue
            rest = name.split("gpt_neox.", 1)[1]
            if rest == "embed_in.weight":
                tree["embed_tokens"]["weight"] = tensor
            elif rest.startswith("final_layer_norm."):
                tree["norm"][rest.split(".")[-1]] = tensor
            elif rest.startswith("layers."):
                parts = rest.split(".")
                li = int(parts[1])
                sub = ".".join(parts[2:-1])
                leaf = parts[-1]
                L = tree["layers"][li]
                heads = cfg.num_attention_heads
                d = cfg.head_dim
                if sub == "attention.query_key_value":
                    w = tensor.reshape(heads, 3, d, *tensor.shape[1:])
                    for idx, ours in enumerate(("q_proj", "k_proj",
                                                "v_proj")):
                        piece = w[:, idx].reshape(heads * d,
                                                  *tensor.shape[1:])
                        if leaf == "bias":
                            L[ours + "_bias"] = {"bias": piece}
                        else:
                            pw = piece.T
                            L[ours] = (
                                linear_method.quantize(pw, np.float32)
                                if not isinstance(
                                    linear_method,
                                    UnquantizedLinearMethod)
                                else {"weight": pw})
                    continue
                neox_map = {"attention.dense": "o_proj",
                            "mlp.dense_h_to_4h": "up_proj",
                            "mlp.dense_4h_to_h": "down_proj",
                            "input_layernorm": "input_layernorm",
                            "post_attention_layernorm":
                                "post_attention_layernorm"}
                ours = neox_map.get(sub)
                if ours is None:
                    if "rotary_emb" not in sub and "bias" not in sub:
                        logger.warning("unmapped GPT-NeoX weight %s", name)
                    continue
                if "layernorm" in ours:
                    L.setdefault(ours, {})[leaf] = tensor
                elif leaf == "bias":
                    L[ours + "_bias"] = {"bias": tensor}
                else:
                    w = tensor.T
                    L[ours] = (
                        linear_method.quantize(w, np.float32)
                        if not isinstance(linear_method,
                                          UnquantizedLinearMethod)
                        else {"weight": w})
            continue
        if name.startswith("model.decoder.") or name.startswith("decoder."):
            # OPT family (models/opt.py)
            rest = name.split("decoder.", 1)[1]
            if rest in ("embed_tokens.weight", "embed_positions.weight"):
                key = rest.split(".")[0]
                tree.setdefault(key, {})["weight"] = tensor
            elif rest.startswith("final_layer_norm."):
                tree.setdefault("final_layer_norm", {})[
                    rest.split(".")[-1]] = tensor
            elif rest.startswith("layers."):
                parts = rest.split(".")
                li = int(parts[1])
                sub = ".".join(parts[2:-1])
                leaf = parts[-1]
                ours = _OPT_MAP.get(sub)
                if ours is None:
                    logger.warning("unmapped OPT weight %s", name)
                    continue
                if "layer_norm" in ours:
                    tree["layers"][li].setdefault(ours, {})[leaf] = tensor
                elif leaf == "bias":
                    tree["layers"][li][ours + "_bias"] = {"bias": tensor}
                else:
                    w = tensor.T
                    tree["layers"][li][ours] = (
                        linear_method.quantize(w, np.float32)
                        if not isinstance(linear_method,
                                          UnquantizedLinearMethod)
                        else {"weight": w})
            continue
        if name in ("model.embed_tokens.weight",):
            tree["embed_tokens"]["weight"] = tensor
        elif name in ("lm_head.weight",):
            if "lm_head" in shapes:
                tree["lm_head"] = {"weight": tensor.T}
        elif name == "lm_head.bias":
            if "lm_head_bias" in shapes:
                tree["lm_head_bias"] = {"bias": tensor}
        elif name.startswith("score."):
            # decoder classification / reward heads (registry seq-cls
            # builders; reference as_seqcls_model / qwen2_rm.py score).
            # Plain head: score.weight; reward MLP: score.{0,2}.{w,b}
            # (nn.Sequential indices).
            parts = name.split(".")
            if parts[1] in ("0", "2"):
                key = "score_fc1" if parts[1] == "0" else "score_fc2"
                leaf = parts[2]
                tree.setdefault(key, {})[leaf] = (
                    tensor.T if leaf == "weight" else tensor)
            elif "score" in shapes:
                tree.setdefault("score", {})["weight"] = tensor.T
        elif name in ("model.norm.weight", "model.final_layernorm.weight"):
            tree["norm"]["weight"] = tensor
        elif name in ("model.norm.bias", "model.final_layernorm.bias"):
            tree["norm"]["bias"] = tensor
        elif name.startswith("model.layers."):
            parts = name.split(".")
            li = int(parts[2])
            rest = ".".join(parts[3:-1])
            leaf = parts[-1]
            if fam == "glm4":
                # Glm4 sandwich norms -> our use_post_norms names
                rest = {"post_self_attn_layernorm":
                            "post_attention_layernorm",
                        "post_attention_layernorm":
                            "pre_feedforward_layernorm",
                        "post_mlp_layernorm":
                            "post_feedforward_layernorm"}.get(rest, rest)
            if fam == "persimmon":
                # Persimmon (reference models/persimmon.py): fused
                # query_key_value rows grouped [heads, (q,k,v), d];
                # NeoX-ish names under the llama "model." prefix
                if rest == "self_attn.query_key_value":
                    heads, d = cfg.num_attention_heads, cfg.head_dim
                    w = tensor.reshape(heads, 3, d, *tensor.shape[1:])
                    L = tree["layers"][li]
                    put = _mk_put_linear(tree, linear_method)
                    for idx, ours2 in enumerate(("q_proj", "k_proj",
                                                 "v_proj")):
                        piece = w[:, idx].reshape(heads * d,
                                                  *tensor.shape[1:])
                        if leaf == "bias":
                            L[ours2 + "_bias"] = {"bias": piece}
                        else:
                            put(L, ours2, piece.T)
                    continue
                rest = {"self_attn.dense": "self_attn.o_proj",
                        "mlp.dense_h_to_4h": "mlp.up_proj",
                        "mlp.dense_4h_to_h": "mlp.down_proj",
                        "self_attn.q_layernorm": "self_attn.q_norm",
                        "self_attn.k_layernorm": "self_attn.k_norm",
                        }.get(rest, rest)
            if fam == "decilm" and rest in ("self_attn.k_proj",
                                            "self_attn.v_proj") \
                    and leaf == "weight":
                # DeciLM variable GQA: normalize every layer's k/v to
                # the max kv-head count by repeating head blocks
                # (reference models/decilm.py::_degroup_weight — the
                # reference runs uniform GQA the same way)
                d = cfg.head_dim
                src_kvh = tensor.shape[0] // d
                reps = cfg.num_key_value_heads // src_kvh
                if reps > 1:
                    tensor = np.repeat(
                        tensor.reshape(src_kvh, d, -1), reps,
                        axis=0).reshape(cfg.num_key_value_heads * d, -1)
            if fam == "aria":
                # Aria MoE names (reference models/aria.py): router +
                # fused grouped-expert stacks fc1 [E,h,2I] (projection|
                # gate halves -> w1|w3) and fc2 [E,I,h] -> w2
                L = tree["layers"][li]
                if rest == "mlp.router":
                    L.setdefault("moe", {}).setdefault(
                        "router", {})["weight"] = tensor.T
                    continue
                if rest == "mlp.experts.fc1":
                    half = tensor.shape[2] // 2
                    exp = L.setdefault("moe", {}).setdefault(
                        "experts", {})
                    exp["w1"] = tensor[:, :, :half]
                    exp["w3"] = tensor[:, :, half:]
                    continue
                if rest == "mlp.experts.fc2":
                    L.setdefault("moe", {}).setdefault(
                        "experts", {})["w2"] = tensor
                    continue
                if rest.startswith("mlp.shared_experts."):
                    L[f"shared_{rest.split('.')[-1]}"] = {
                        "weight": tensor.T}
                    continue
            if fam == "arctic":
                # Arctic naming (reference models/arctic.py): merged
                # w13 tensors split into gate|up rows; dense layers
                # live under block_sparse_moe.mlp
                L = tree["layers"][li]
                put = _mk_put_linear(tree, linear_method)
                if rest in ("block_sparse_moe.mlp.w13",
                            "residual_mlp.w13"):
                    half = tensor.shape[0] // 2
                    pre = ("" if rest.startswith("block_sparse_moe")
                           else "residual_")
                    put(L, pre + "gate_proj", tensor[:half].T)
                    put(L, pre + "up_proj", tensor[half:].T)
                    continue
                if rest == "block_sparse_moe.mlp.w2":
                    put(L, "down_proj", tensor.T)
                    continue
                if rest == "residual_mlp.w2":
                    put(L, "residual_down_proj", tensor.T)
                    continue
                if rest == "residual_layernorm":
                    L["residual_layernorm"] = {"weight": tensor}
                    continue
            if fam == "grok1":
                # Grok-1 naming (reference models/grok1.py:474): attn.*
                # projections, moe_block with linear/linear_1/linear_v
                # experts, pre/post branch norms
                parts_g = rest.split(".")
                if parts_g[0] == "attn":
                    rest = "self_attn." + ".".join(parts_g[1:])
                elif rest == "moe_block.gate":
                    rest = "mlp.gate"
                elif parts_g[0] == "moe_block" and parts_g[1] == "experts":
                    w_name = {"linear": "w1", "linear_1": "w2",
                              "linear_v": "w3"}[parts_g[3]]
                    rest = f"mlp.experts.{parts_g[2]}.{w_name}"
                else:
                    rest = {"pre_attn_norm": "input_layernorm",
                            "post_attn_norm": "post_attention_layernorm",
                            "pre_moe_norm": "pre_feedforward_layernorm",
                            "post_moe_norm": "post_feedforward_layernorm",
                            }.get(rest, rest)
            # Generic MoE names (Mixtral block_sparse_moe.*, Qwen2-MoE
            # mlp.gate/experts/shared_expert.*): intercept ONLY the
            # MoE-specific tensors; attention (and dense-layer MLP)
            # projections fall through to the generic, possibly
            # quantized, path below.
            if is_moe and not is_deepseek:
                L = tree["layers"][li]
                if rest in ("block_sparse_moe.gate", "mlp.gate",
                            "block_sparse_moe.router.layer"):
                    L.setdefault("moe", {}).setdefault(
                        "router", {})["weight"] = tensor.T
                    continue
                if rest == "block_sparse_moe.input_linear":
                    # GraniteMoe fused expert stack [E, 2I, H]:
                    # rows [gate; up] (HF GraniteMoeMoE chunk order)
                    half = tensor.shape[1] // 2
                    pend = pending_experts.setdefault(li, {})
                    for e in range(tensor.shape[0]):
                        pend.setdefault("gate_proj", {})[e] = \
                            tensor[e, :half].T
                        pend.setdefault("up_proj", {})[e] = \
                            tensor[e, half:].T
                    continue
                if rest == "block_sparse_moe.output_linear":
                    # [E, H, I] -> per-expert [I, H]
                    pend = pending_experts.setdefault(li, {})
                    for e in range(tensor.shape[0]):
                        pend.setdefault("down_proj", {})[e] = tensor[e].T
                    continue
                if rest == "shared_mlp.input_linear":
                    # GraniteMoeShared ungated shared expert [2I_s, H]
                    half = tensor.shape[0] // 2
                    L["shared_gate_proj"] = {"weight": tensor[:half].T}
                    L["shared_up_proj"] = {"weight": tensor[half:].T}
                    continue
                if rest == "shared_mlp.output_linear":
                    L["shared_down_proj"] = {"weight": tensor.T}
                    continue
                if rest.startswith(("block_sparse_moe.experts.",
                                    "mlp.experts.")):
                    p2 = rest.split(".")
                    proj = {"w1": "gate_proj", "w3": "up_proj",
                            "w2": "down_proj"}.get(p2[3], p2[3])
                    pending_experts.setdefault(li, {}).setdefault(
                        proj, {})[int(p2[2])] = tensor.T
                    continue
                if rest.startswith(("mlp.shared_expert.",
                                    "mlp.shared_experts.")):
                    # DeepSeek v1 spells it plural (models/deepseek.py)
                    L[f"shared_{rest.split('.')[-1]}"] = {
                        "weight": tensor.T}
                    continue
                if rest == "mlp.shared_expert_gate":
                    L["shared_expert_gate"] = {"weight": tensor.T}
                    continue
            if is_deepseek:
                # DeepSeek-V2/V3 (models/deepseek.py): MLA projections,
                # routed-expert stacks, shared experts
                L = tree["layers"][li]
                if rest == "mlp.gate":
                    L.setdefault("moe", {}).setdefault(
                        "router", {})["weight"] = tensor.T
                elif rest.startswith("mlp.experts."):
                    p2 = rest.split(".")
                    pending_experts.setdefault(li, {}).setdefault(
                        p2[3], {})[int(p2[2])] = tensor.T
                elif rest.startswith("mlp.shared_experts."):
                    L[f"shared_{rest.split('.')[-1]}"] = {
                        "weight": tensor.T}
                elif rest == "self_attn.kv_a_proj_with_mqa":
                    L["kv_a_proj"] = {"weight": tensor.T}
                elif rest in ("self_attn.q_a_layernorm",
                              "self_attn.kv_a_layernorm"):
                    L[rest.split(".")[1]] = {"weight": tensor}
                elif rest in ("self_attn.q_proj", "self_attn.q_a_proj",
                              "self_attn.q_b_proj", "self_attn.kv_b_proj",
                              "self_attn.o_proj"):
                    L[rest.split(".")[1]] = {"weight": tensor.T}
                elif rest in ("input_layernorm",
                              "post_attention_layernorm"):
                    L[rest] = {"weight": tensor}
                elif rest in ("mlp.gate_proj", "mlp.up_proj",
                              "mlp.down_proj"):
                    L[rest.split(".")[1]] = {"weight": tensor.T}
                else:
                    logger.warning("unmapped DeepSeek weight %s", name)
                continue
            # Phi-3 style fused projections: split into our per-proj
            # params (reference handles this via packed weight_loaders,
            # linear.py:445,719)
            if leaf == "weight" and rest == "self_attn.qkv_proj":
                d = cfg.head_dim
                nq = cfg.num_attention_heads * d
                nkv = cfg.num_key_value_heads * d
                splits = {"q_proj": tensor[:nq],
                          "k_proj": tensor[nq:nq + nkv],
                          "v_proj": tensor[nq + nkv:nq + 2 * nkv]}
                for ours2, w in splits.items():
                    tree["layers"][li][ours2] = (
                        linear_method.quantize(w.T, np.float32)
                        if not isinstance(linear_method,
                                          UnquantizedLinearMethod)
                        else {"weight": w.T})
                continue
            if leaf == "weight" and rest == "mlp.gate_up_proj":
                half = tensor.shape[0] // 2
                for ours2, w in (("gate_proj", tensor[:half]),
                                 ("up_proj", tensor[half:])):
                    tree["layers"][li][ours2] = (
                        linear_method.quantize(w.T, np.float32)
                        if not isinstance(linear_method,
                                          UnquantizedLinearMethod)
                        else {"weight": w.T})
                continue
            ours = _HF_LAYER_MAP.get(rest)
            if ours is None:
                logger.warning("unmapped weight %s", name)
                continue
            # weight or bias leaf of a norm (incl. q/k norms, whose
            # Cohere [heads, d] weights load unreshaped)
            if "layernorm" in ours or ours in ("q_norm", "k_norm"):
                tree["layers"][li].setdefault(ours, {})[leaf] = tensor
            elif leaf in ("codes", "codebooks", "scales"):
                pending_aqlm.setdefault((li, ours), {})[leaf] = tensor
            elif leaf == "weight":
                w = tensor.T  # HF stores [out, in]; we use [in, out]
                if is_pq or not isinstance(linear_method,
                                           UnquantizedLinearMethod):
                    tree["layers"][li][ours] = linear_method.quantize(
                        w, np.float32)
                else:
                    tree["layers"][li][ours] = {"weight": w}
            elif leaf == "bias":
                tree["layers"][li][ours + "_bias"] = {"bias": tensor}

    for (li, ours), arts in pending_aqlm.items():
        tree["layers"][li][ours] = convert_aqlm_artifacts(arts)

    for li, projs in pending_experts.items():
        stacks = {}
        for proj, key in (("gate_proj", "w1"), ("up_proj", "w3"),
                          ("down_proj", "w2")):
            per = projs[proj]
            stacks[key] = np.stack([per[e] for e in range(len(per))])
        tree["layers"][li].setdefault("moe", {})["experts"] = stacks

    if getattr(cfg, "tie_word_embeddings", True):
        tree.pop("lm_head", None)

    # param-less entries (e.g. OLMo's non-parametric layernorms) exist
    # in the template as EMPTY dicts; mirror them so trees match
    def _fill_empty(sh, tr):
        if isinstance(sh, dict):
            for k, v in sh.items():
                if isinstance(v, dict) and not v:
                    tr.setdefault(k, {})
                elif k in tr:
                    _fill_empty(v, tr[k])
        elif isinstance(sh, list):
            for s2, t2 in zip(sh, tr):
                _fill_empty(s2, t2)

    _fill_empty(shapes, tree)
    return _tree_device_put(tree, model.param_specs(), mesh)


def convert_aqlm_artifacts(arts: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """AQLM HF layout -> our TPU layout (lossless; see module docstring).

    Reference shapes (aqlm.py:253-316): codes [out, in/g, m] int8/int16
    (signed, bias 2^(b-1) applied on the unsigned index), codebooks
    [m, 2^b, out_group=1, g], scales [out, 1, 1, 1].
    """
    codes = arts["codes"]
    codebooks = arts["codebooks"]
    scales = arts["scales"]
    m = codes.shape[-1]
    nbits = {np.dtype(np.int8): 8, np.dtype(np.uint8): 8,
             np.dtype(np.int16): 16, np.dtype(np.uint16): 16}[codes.dtype]
    # signed storage: unsigned index = signed + 2^(nbits-1)
    if codes.dtype in (np.dtype(np.int8), np.dtype(np.int16)):
        ucodes = codes.astype(np.int32) + (1 << (nbits - 1))
    else:
        ucodes = codes.astype(np.int32)
    udtype = np.uint8 if nbits == 8 else np.uint16
    ucodes = ucodes.astype(udtype)
    # [out, J, m] -> [m, J, out]
    ucodes = np.transpose(ucodes, (2, 1, 0))
    cb = codebooks.reshape(m, codebooks.shape[1], -1).astype(np.float32)
    sc = scales.reshape(-1).astype(np.float32)
    return {"codes": ucodes, "codebooks": cb, "scales": sc}


def load_model_params(model, mesh: Mesh, config, linear_method) -> Any:
    if config.model.load_format == "dummy":
        return load_dummy(model, mesh, config.model.seed)
    if config.model.load_format == "sharded_state":
        return load_sharded_state(model, mesh, config.model.model)
    model_dir = config.model.model
    if not os.path.isdir(model_dir):
        raise ValueError(
            f"model {model_dir!r} is not a local directory; this "
            "environment has no network access — pass a local path or "
            "use load_format='dummy'")
    return load_hf(model, mesh, model_dir, linear_method)


# ---------------------------------------------------------------------------
# sharded-state checkpointing (role of reference ShardedStateLoader,
# model_loader/loader.py:567 + save_sharded_state example): skip the HF
# parse + quantize + reshard work on startup by saving the final device
# param tree with orbax and restoring it with the target shardings.


def _ckpt_dir(path: str) -> str:
    return os.path.join(os.path.abspath(path), "sharded_state")


def save_sharded_state(model, params, path: str) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_ckpt_dir(path), params)
    ckptr.wait_until_finished()
    # manifest: the linear-method FORM the saved tree is in (the
    # resident transform may have replaced PQ codes with dense/int8
    # weights after load; restore must rebuild the matching target tree)
    method = type(getattr(model, "linear_method", None)).__name__
    with open(os.path.join(os.path.abspath(path),
                           "vpq_sharded_manifest.json"), "w") as f:
        json.dump({"linear_method": method}, f)
    logger.info("sharded state saved to %s", _ckpt_dir(path))


def _restore_linear_method(model, path: str) -> None:
    """Swap model.linear_method to the form recorded at save time (so
    param_shapes/param_specs build the on-disk tree structure)."""
    mf = os.path.join(os.path.abspath(path), "vpq_sharded_manifest.json")
    try:
        with open(mf) as f:
            name = json.load(f).get("linear_method")
    except OSError:
        return  # pre-manifest checkpoint: tree matches the config method
    current = type(getattr(model, "linear_method", None)).__name__
    if name == current or name is None:
        return
    from vllm_pq_tpu.quantization.methods import (Int8LinearMethod,
                                                  Int8W8A8LinearMethod,
                                                  UnquantizedLinearMethod)
    swap = {"UnquantizedLinearMethod": UnquantizedLinearMethod,
            "Int8LinearMethod": Int8LinearMethod,
            "Int8W8A8LinearMethod": Int8W8A8LinearMethod}.get(name)
    if swap is None:
        logger.warning("sharded-state manifest method %r unknown; "
                       "restoring with the configured method", name)
        return
    model.linear_method = swap()
    logger.info("sharded state was saved in %s form; restoring as such",
                name)


def load_sharded_state(model, mesh: Mesh, path: str) -> Any:
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding

    _restore_linear_method(model, path)
    shapes = model.param_shapes()
    specs = model.param_specs()

    def mk_abstract(sv, spec):
        shape, dtype = sv
        sharding = NamedSharding(mesh, spec if isinstance(spec, P) else P())
        return jax.ShapeDtypeStruct(shape, jnp.dtype(dtype),
                                    sharding=sharding)

    def walk(sh, sp):
        if isinstance(sh, dict):
            return {k: walk(sh[k], sp[k] if isinstance(sp, dict) else sp)
                    for k in sh}
        if isinstance(sh, list):
            return [walk(a, b) for a, b in zip(sh, sp)]
        return mk_abstract(sh, sp)

    target = walk(shapes, specs)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_ckpt_dir(path), target)
