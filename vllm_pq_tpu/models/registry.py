"""Model registry (role of reference ``models/registry.py:334,522``).

Maps HF ``architectures[0]`` to a model builder. New families register
with ``@register_model``.
"""

import json
import os
from typing import Callable, Dict, Tuple

from vllm_pq_tpu.config import EngineConfig
from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)

_REGISTRY: Dict[str, Callable] = {}


def register_model(*names):
    def deco(fn):
        for n in names:
            _REGISTRY[n] = fn
        return fn
    return deco


def _normalize_params_json(raw: dict) -> dict:
    """Mistral-format ``params.json`` -> HF-style config dict (role of
    reference transformers_utils/config.py::load_params_config:615).
    Multimodal checkpoints nest the decoder under text_config and the
    ViT under vision_config with arch PixtralForConditionalGeneration."""
    key_map = {"dim": "hidden_size", "norm_eps": "rms_norm_eps",
               "n_kv_heads": "num_key_value_heads",
               "n_layers": "num_hidden_layers",
               "n_heads": "num_attention_heads",
               "hidden_dim": "intermediate_size"}

    def remap(d):
        return {key_map.get(k, k): (remap(v) if isinstance(v, dict)
                                    else v) for k, v in d.items()}

    raw = remap(raw)
    raw.setdefault("hidden_act", raw.pop("activation", "silu"))
    raw.setdefault("tie_word_embeddings",
                   raw.pop("tie_embeddings", False))
    raw.setdefault("max_position_embeddings",
                   raw.get("max_seq_len", 128_000))
    vision = raw.pop("vision_encoder", None)
    if raw.get("moe") is not None:
        raw["architectures"] = ["MixtralForCausalLM"]
        moe = raw["moe"]
        raw.setdefault("num_local_experts",
                       moe.get("num_experts", 8))
        raw.setdefault("num_experts_per_tok",
                       moe.get("num_experts_per_tok", 2))
    else:
        raw["architectures"] = ["MistralForCausalLM"]
    raw.setdefault("model_type", "transformer")
    if vision is not None:
        raw = {"text_config": raw, "vision_config": vision,
               "architectures": ["PixtralForConditionalGeneration"],
               "model_type": "pixtral"}
    return raw


def _load_hf_config(model_path: str, config: EngineConfig):
    cfg_file = os.path.join(model_path, "config.json")
    mistral_file = os.path.join(model_path, "params.json")
    raw = None
    if os.path.isfile(cfg_file):
        with open(cfg_file) as f:
            raw = json.load(f)
    elif os.path.isfile(mistral_file):
        with open(mistral_file) as f:
            raw = _normalize_params_json(json.load(f))
        raw["_mistral_format"] = True
    if raw is not None:
        raw.update(config.model.hf_overrides)

        class _NS:
            def __init__(self, d):
                self.__dict__.update(d)
        return _NS(raw)
    try:
        from transformers import AutoConfig
        hf = AutoConfig.from_pretrained(
            config.model.model, local_files_only=True,
            trust_remote_code=config.model.trust_remote_code)
        for k, v in config.model.hf_overrides.items():
            setattr(hf, k, v)
        return hf
    except Exception:
        return None


@register_model("Qwen2ForCausalLM",
                # pooling/embedding alias (reference registry.py:141
                # Qwen2EmbeddingModel -> qwen2 + pooler)
                "Qwen2EmbeddingModel")
def _build_qwen2(hf_config, config: EngineConfig, linear_method):
    # Qwen2 = llama math + always-on qkv bias (its HF config carries no
    # attention_bias field; reference models/qwen2.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = (LlamaConfig.from_hf_config(hf_config) if hf_config is not None
          else LlamaConfig())
    mc.attention_bias = True
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("LlamaForCausalLM", "MistralForCausalLM",
                "MinistralForCausalLM",  # mistral + uniform sliding window
                "TinyLlamaForCausalLM",
                # llama-architecture aliases (reference registry rows
                # with identical math: models/{aquila,xverse}.py)
                "AquilaForCausalLM", "AquilaModel",
                "XverseForCausalLM", "InternLM3ForCausalLM",
                "LLaMAForCausalLM",  # legacy spelling (registry.py:74)
                # bare-model rows: embedding/pooling checkpoints served
                # via LLM.encode / /v1/embeddings (reference registry
                # pooling rows, registry.py:137-141)
                "LlamaModel", "MistralModel", "Qwen2Model")
def _build_llama(hf_config, config: EngineConfig, linear_method):
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    if hf_config is not None:
        mc = LlamaConfig.from_hf_config(hf_config)
    else:
        mc = LlamaConfig()
    mc.dtype = config.model.jax_dtype
    if config.scheduler.max_model_len > mc.max_position_embeddings:
        logger.warning(
            "max_model_len %d > model max_position_embeddings %d",
            config.scheduler.max_model_len, mc.max_position_embeddings)
    return LlamaModel(mc, linear_method)


@register_model("GemmaForCausalLM")
def _build_gemma(hf_config, config: EngineConfig, linear_method):
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.hidden_act = (getattr(hf_config, "hidden_activation", None)
                     or getattr(hf_config, "hidden_act", None)
                     or "gelu_pytorch_tanh")
    mc.embed_scale = mc.hidden_size ** 0.5
    mc.gemma_norm = True
    mc.tie_word_embeddings = True
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("Gemma2ForCausalLM",
                "Gemma2Model")  # pooling row (ref registry.py:139)
def _build_gemma2(hf_config, config: EngineConfig, linear_method):
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.hidden_act = (getattr(hf_config, "hidden_activation", None)
                     or "gelu_pytorch_tanh")
    mc.embed_scale = mc.hidden_size ** 0.5
    mc.gemma_norm = True
    mc.tie_word_embeddings = True
    mc.use_post_norms = True
    mc.final_logit_softcap = getattr(hf_config,
                                     "final_logit_softcapping", 30.0)
    mc.attn_logit_softcap = getattr(hf_config,
                                    "attn_logit_softcapping", 50.0)
    mc.query_pre_attn_scalar = getattr(hf_config,
                                       "query_pre_attn_scalar", None)
    mc.sliding_window_pattern = 2
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("Gemma3ForCausalLM", "Gemma3TextModel")
def _build_gemma3(hf_config, config: EngineConfig, linear_method):
    # Gemma3 text: gemma2 block + per-head gemma-style q/k norms, dual
    # rope tables (global theta=1e6 with optional linear scaling; local
    # sliding layers theta=rope_local_base_freq unscaled), 5:1
    # local:global layer pattern, no attn softcap (reference
    # models/gemma3.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.hidden_act = (getattr(hf_config, "hidden_activation", None)
                     or "gelu_pytorch_tanh")
    mc.embed_scale = mc.hidden_size ** 0.5
    mc.gemma_norm = True
    mc.tie_word_embeddings = getattr(hf_config, "tie_word_embeddings",
                                     True)
    mc.use_post_norms = True
    mc.qk_norm = "head_gemma"
    mc.query_pre_attn_scalar = getattr(hf_config,
                                       "query_pre_attn_scalar", 256)
    mc.final_logit_softcap = getattr(hf_config,
                                     "final_logit_softcapping", None)
    mc.attn_logit_softcap = getattr(hf_config,
                                    "attn_logit_softcapping", None)
    mc.rope_local_theta = getattr(hf_config, "rope_local_base_freq",
                                  10000.0)
    lt = getattr(hf_config, "layer_types", None)
    if lt:
        mc.sliding_window_layers = tuple(
            t == "sliding_attention" for t in lt)
    else:
        mc.sliding_window_pattern = getattr(hf_config,
                                            "sliding_window_pattern", 6)
    mc.rms_norm_eps = getattr(hf_config, "rms_norm_eps", 1e-6)
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("Phi3ForCausalLM")
def _build_phi3(hf_config, config: EngineConfig, linear_method):
    # Phi-3 is llama-math with fused qkv/gate_up checkpoint tensors; the
    # loader splits them (model_loader/loader.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("GPT2LMHeadModel")
def _build_gpt2(hf_config, config: EngineConfig, linear_method):
    from vllm_pq_tpu.models.gpt2 import GPT2Config, GPT2Model
    mc = (GPT2Config.from_hf_config(hf_config) if hf_config is not None
          else GPT2Config())
    mc.dtype = config.model.jax_dtype
    return GPT2Model(mc, linear_method)


@register_model("GPTBigCodeForCausalLM")
def _build_gpt_bigcode(hf_config, config: EngineConfig, linear_method):
    # Starcoder-1: gpt2 block with multi-query attention and Linear
    # (not Conv1D) checkpoint layout (reference models/gpt_bigcode.py)
    from vllm_pq_tpu.models.gpt2 import GPT2Config, GPT2Model
    mc = GPT2Config.from_hf_config(hf_config)
    mc.multi_query = getattr(hf_config, "multi_query", True)
    mc.hf_family = "gpt_bigcode"
    mc.dtype = config.model.jax_dtype
    return GPT2Model(mc, linear_method)


@register_model("OPTForCausalLM")
def _build_opt(hf_config, config: EngineConfig, linear_method):
    from vllm_pq_tpu.models.opt import OPTConfig, OPTModel
    mc = (OPTConfig.from_hf_config(hf_config) if hf_config is not None
          else OPTConfig())
    mc.dtype = config.model.jax_dtype
    return OPTModel(mc, linear_method)


@register_model("MixtralForCausalLM",
                # GPTQ/AWQ mixtral checkpoints (reference
                # mixtral_quant.py — same math, quantized weights ride
                # the normal quantization registry here)
                "QuantMixtralForCausalLM")
def _build_mixtral(hf_config, config: EngineConfig, linear_method):
    from vllm_pq_tpu.models.mixtral import MixtralConfig, MixtralModel
    if hf_config is not None:
        mc = MixtralConfig.from_hf_config(hf_config)
    else:
        mc = MixtralConfig()
    mc.dtype = config.model.jax_dtype
    ep = config.parallel.enable_expert_parallel
    if ep and mc.num_local_experts % config.parallel.tensor_parallel_size:
        raise ValueError(
            f"expert parallelism needs num_experts "
            f"({mc.num_local_experts}) divisible by tp "
            f"({config.parallel.tensor_parallel_size})")
    return MixtralModel(mc, linear_method, expert_parallel=ep)


@register_model("LlavaForConditionalGeneration",
                # Mantis is llava-architecture with a different chat
                # processor (reference registry.py -> models/llava.py
                # MantisForConditionalGeneration row)
                "MantisForConditionalGeneration")
def _build_llava(hf_config, config: EngineConfig, linear_method):
    from types import SimpleNamespace

    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.models.llava import LlavaModel
    from vllm_pq_tpu.multimodal.clip import CLIPVisionConfig

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None))
    vc = ns(getattr(hf_config, "vision_config", None))
    mc = LlamaConfig.from_hf_config(tc) if tc is not None else LlamaConfig()
    mc.dtype = config.model.jax_dtype
    tower = None
    if vc is not None and getattr(vc, "model_type", "") == "pixtral":
        # Pixtral-12B ships as a LLaVA composite with a RoPE-2D ViT
        # (reference models/pixtral.py PixtralHFVisionModel)
        from vllm_pq_tpu.multimodal.pixtral import (PixtralVisionConfig,
                                                    PixtralVisionTower)
        vcfg = PixtralVisionConfig.from_hf(vc)
        fl = getattr(hf_config, "vision_feature_layer", -1)
        tower = PixtralVisionTower(vcfg, fl if fl is not None else -1)
        return LlavaModel(
            mc, vcfg, linear_method,
            image_token_index=getattr(hf_config, "image_token_index",
                                      10),
            vision_feature_select_strategy="full",
            projector_act=getattr(hf_config, "projector_hidden_act",
                                  "gelu"),
            tower=tower)
    vcfg = (CLIPVisionConfig.from_hf(vc) if vc is not None
            else CLIPVisionConfig())
    return LlavaModel(
        mc, vcfg, linear_method,
        image_token_index=getattr(hf_config, "image_token_index", 32000),
        vision_feature_layer=getattr(hf_config, "vision_feature_layer",
                                     -2),
        vision_feature_select_strategy=getattr(
            hf_config, "vision_feature_select_strategy", "default"),
        projector_act=getattr(hf_config, "projector_hidden_act", "gelu"))


@register_model("SolarForCausalLM")
def _build_solar(hf_config, config: EngineConfig, linear_method):
    # Upstage SOLAR: llama math + depth-up-scaled skip connections
    # (reference models/solar.py bskcn_1..4 / bskcn_tv)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)

    def tup(name):
        v = getattr(hf_config, name, None)
        return tuple(v) if v else None
    mc.bskcn_1 = tup("bskcn_1")
    mc.bskcn_2 = tup("bskcn_2")
    mc.bskcn_3 = tup("bskcn_3")
    mc.bskcn_4 = tup("bskcn_4")
    tv = getattr(hf_config, "bskcn_tv", None)
    mc.bskcn_tv = float(tv[1]) if tv else 0.0  # inference weight
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("TeleChat2ForCausalLM")
def _build_telechat2(hf_config, config: EngineConfig, linear_method):
    # TeleChat2: llama math, biased o_proj ("dense") + down_proj only
    # (reference models/telechat2.py:36-49 sets bias then strips it
    # from qkv/gate_up); GPT-style tree with per-head-interleaved
    # key_value handled by the telechat2 loader family
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    hf = hf_config
    mc = LlamaConfig(
        vocab_size=hf.vocab_size,
        hidden_size=hf.hidden_size,
        intermediate_size=getattr(hf, "ffn_hidden_size",
                                  getattr(hf, "intermediate_size", None)
                                  or 4 * hf.hidden_size),
        num_hidden_layers=getattr(hf, "n_layer",
                                  getattr(hf, "num_hidden_layers", 32)),
        num_attention_heads=getattr(hf, "n_head",
                                    getattr(hf, "num_attention_heads",
                                            32)),
        num_key_value_heads=getattr(hf, "n_head",
                                    getattr(hf, "num_attention_heads",
                                            32)),
        rms_norm_eps=getattr(hf, "layer_norm_epsilon", 1e-5),
        max_position_embeddings=getattr(hf, "seq_length", 8192),
        tie_word_embeddings=False,
    )
    mc.o_proj_bias = True
    mc.mlp_bias = "down"
    mc.hf_family = "telechat2"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("GritLM")
def _build_gritlm(hf_config, config: EngineConfig, linear_method):
    # GritLM: generative + embedding hybrid on a Mistral decoder
    # (reference models/gritlm.py subclasses LlamaForCausalLM; its
    # instruction-masked mean pooling is served via LLM.encode)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("Fairseq2LlamaForCausalLM")
def _build_fairseq2_llama(hf_config, config: EngineConfig, linear_method):
    # Llama weights exported by fairseq2 (reference
    # models/fairseq2_llama.py): decoder_frontend/decoder.layers tree,
    # q/k stored in interleaved rotary order — the loader family
    # remaps names and de-interleaves (reshape_fairseq2_weights role)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.hf_family = "fairseq2"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("QWenLMHeadModel")
def _build_qwen_v1(hf_config, config: EngineConfig, linear_method):
    # Qwen v1 (reference models/qwen.py text path): llama math with a
    # fused biased c_attn, SwiGLU w2(gate)/w1(up)/c_proj where the HF
    # intermediate_size counts BOTH halves, RMSNorm ln_1/ln_2
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    hf = hf_config
    mc = LlamaConfig(
        vocab_size=hf.vocab_size,
        hidden_size=hf.hidden_size,
        intermediate_size=hf.intermediate_size // 2,
        num_hidden_layers=hf.num_hidden_layers,
        num_attention_heads=hf.num_attention_heads,
        num_key_value_heads=hf.num_attention_heads,
        rms_norm_eps=getattr(hf, "layer_norm_epsilon", 1e-6),
        rope_theta=getattr(hf, "rotary_emb_base", 10000.0),
        max_position_embeddings=getattr(hf, "max_position_embeddings",
                                        8192),
        tie_word_embeddings=False,
    )
    mc.attention_bias = True
    mc.hf_family = "qwen_v1"
    mc.dtype = config.model.jax_dtype
    visual = getattr(hf, "visual", None)
    if visual:
        # real Qwen-VL checkpoints carry architectures=
        # ["QWenLMHeadModel"] WITH a `visual` config block (reference
        # registry maps them to QwenVLForConditionalGeneration)
        from vllm_pq_tpu.models.qwen_vl import QwenVLModel
        return QwenVLModel(mc, dict(visual), linear_method)
    return LlamaModel(mc, linear_method)


@register_model("QwenVLForConditionalGeneration")
def _build_qwen_vl(hf_config, config: EngineConfig, linear_method):
    # Qwen-VL v1 (reference models/qwen_vl.py): CLIP-style ViT +
    # perceiver resampler attn_pool on the QWen v1 decoder
    return _build_qwen_v1(hf_config, config, linear_method)


@register_model("Phi3SmallForCausalLM")
def _build_phi3_small(hf_config, config: EngineConfig, linear_method):
    # Phi-3-Small (reference models/phi3_small.py): LayerNorm blocks,
    # fused head-major query_key_value + biased dense, gegelu MLP, mup
    # scaling, and blocksparse attention (local blocks + per-head
    # vertical stride columns; every n-th layer dense). The sparse
    # mask runs in the XLA attention paths (ops/attention.py) — the
    # reference's triton kernel is CUDA-only, so this is the
    # TPU-native equivalent, not a port.
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    h = hf_config

    def g(k, d=None):
        return getattr(h, k, d)
    heads = g("num_attention_heads", 32)
    mc = LlamaConfig(
        vocab_size=g("vocab_size", 100352),
        hidden_size=g("hidden_size", 4096),
        intermediate_size=g("intermediate_size", 14336),
        num_hidden_layers=g("num_hidden_layers", 32),
        num_attention_heads=heads,
        num_key_value_heads=g("num_key_value_heads", None) or heads,
        rms_norm_eps=g("layer_norm_epsilon", 1e-5),
        rope_theta=g("rope_embedding_base", 1e6),
        max_position_embeddings=g("max_position_embeddings", 8192),
        tie_word_embeddings=bool(g("tie_word_embeddings", True)),
        attention_bias=True,
    )
    mc.norm_type = "layernorm"
    mc.o_proj_bias = True
    mc.mlp_style = "mlp"
    mc.mlp_bias = True
    mc.hidden_act = "gegelu"
    mc.gegelu_limit = g("gegelu_limit", None)
    if g("mup_use_scaling", False):
        # sm_scale = mup_attn_multiplier / head_dim
        mc.attention_multiplier = (g("mup_attn_multiplier", 1.0)
                                   / (mc.hidden_size // heads))
        mc.embed_scale = g("mup_embedding_multiplier", None)
        wm = g("mup_width_multiplier", None)
        if wm:
            mc.logit_scale = 1.0 / wm
    bs = g("blocksparse_block_size", None)
    if bs:
        vs = g("blocksparse_vert_stride", 8)
        homo = bool(g("blocksparse_homo_head_pattern", False))
        step = 0 if homo else max(1, vs // heads)
        mc.blocksparse = (int(bs),
                          int(g("blocksparse_num_local_blocks", 16)),
                          int(vs), int(step))
        mc.blocksparse_dense_every_n = g(
            "dense_attention_every_n_layers", None)
    mc.hf_family = "phi3small"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("PrithviGeoSpatialMAE")
def _build_prithvi(hf_config, config: EngineConfig, linear_method):
    # Prithvi geospatial MAE (reference prithvi_geospatial_mae.py): an
    # in-tree ViT-MAE encoder (the reference delegates to the external
    # terratorch package); serves pooled patch features
    from types import SimpleNamespace

    from vllm_pq_tpu.models.prithvi import PrithviModel
    h = hf_config
    # terratorch-style configs nest under pretrained_cfg/model_args
    pc = getattr(h, "pretrained_cfg", None)
    if pc:
        ma = (pc.get("model_args", {})
              if isinstance(pc, dict) else
              getattr(pc, "model_args", {}))
        merged = {}
        if isinstance(ma, dict):
            merged.update(ma.get("backbone_kwargs", ma))
        h = SimpleNamespace(**{**(vars(h) if not isinstance(h, dict)
                                  else h), **merged})
    m = PrithviModel(h, linear_method)
    m.cfg.dtype = config.model.jax_dtype
    return m


@register_model("Florence2ForConditionalGeneration",
                "Florence2LanguageForConditionalGeneration")
def _build_florence2(hf_config, config: EngineConfig, linear_method):
    # Florence-2 (reference models/florence2.py): DaViT hierarchical
    # vision tower prepended to the BART encoder; BART decoder
    # generates with cross-attention
    from vllm_pq_tpu.models.bart import BartConfig
    from vllm_pq_tpu.models.florence2 import Florence2Model
    h = hf_config
    tc = getattr(h, "text_config", None) or h
    if isinstance(tc, dict):
        from types import SimpleNamespace
        tc = SimpleNamespace(**tc)
    mc = BartConfig.from_hf_config(tc)
    mc.dtype = config.model.jax_dtype
    vc = getattr(h, "vision_config", None) or {}
    if not isinstance(vc, dict):
        vc = vc.to_dict() if hasattr(vc, "to_dict") else vars(vc)
    return Florence2Model(mc, vc, linear_method,
                          pad_token_id=getattr(h, "pad_token_id", 1))


@register_model("MolmoForCausalLM")
def _build_molmo(hf_config, config: EngineConfig, linear_method):
    # Molmo (reference models/molmo.py): CLIP ViT (layers -2/-9 concat)
    # + 2x2 attention pooling + SwiGLU projector on a llama-math
    # decoder with fused att_proj, MulAndSilu ff_proj, optional
    # full-width qk RMSNorm and the norm-after (OLMo2-style) block
    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.models.molmo import MolmoModel
    h = hf_config

    def g(k, d=None):
        return getattr(h, k, d)
    heads = g("num_attention_heads", 28)
    emb_size = g("embedding_size", None) or g("vocab_size", 152064)
    mc = LlamaConfig(
        vocab_size=emb_size,
        hidden_size=g("hidden_size", 3584),
        intermediate_size=g("intermediate_size", 37888) // 2,
        num_hidden_layers=g("num_hidden_layers", 28),
        num_attention_heads=heads,
        num_key_value_heads=g("num_key_value_heads", None) or heads,
        rms_norm_eps=g("layer_norm_eps", 1e-6),
        rope_theta=g("rope_theta", 1e6),
        max_position_embeddings=g("max_position_embeddings", 4096),
        tie_word_embeddings=bool(g("weight_tying", False)),
        attention_bias=bool(g("qkv_bias", False)),
    )
    mc.embed_extra_rows = int(g("additional_vocab_size", 128))
    if g("attention_layer_norm", False):
        mc.qk_norm = "full"
    if g("norm_after", False):
        mc.block_style = "olmo2"
    mc.hf_family = "molmo"
    mc.dtype = config.model.jax_dtype
    # <im_patch> rides in the extra embedding rows right after the
    # regular vocab (reference molmo.py:66 IMAGE_PATCH_TOKEN; the
    # processor resolves the true id from the tokenizer)
    patch_id = int(g("image_patch_id", 0) or (emb_size + 2))
    vis = g("vision_config", None) or g("vision_backbone", None)
    return MolmoModel(mc, linear_method, image_patch_id=patch_id,
                      vis_overrides=dict(vis) if vis else None)


@register_model("TransformersModel")
def _build_transformers_fallback(hf_config, config: EngineConfig,
                                 linear_method):
    # Catch-all row (reference models/transformers.py): any decoder
    # whose config carries the standard HF fields runs on the generic
    # llama-architecture builder. Also the target of build_model's
    # unknown-arch fallback.
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = (LlamaConfig.from_hf_config(hf_config)
          if hf_config is not None else LlamaConfig())
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("PixtralForConditionalGeneration")
def _build_pixtral_standalone(hf_config, config: EngineConfig,
                              linear_method):
    # Mistral-format standalone Pixtral (reference models/pixtral.py):
    # the params.json layout normalized by _normalize_params_json —
    # Mistral decoder + RoPE-2D ViT + w_in/GELU/w_out adapter. Weight
    # names are Mistral-native (vision_encoder./vision_language_adapter.
    # /layers.N.attention.wq...), handled by the loader's mistral branch.
    from types import SimpleNamespace

    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.models.llava import LlavaModel
    from vllm_pq_tpu.multimodal.pixtral import (PixtralVisionConfig,
                                                PixtralVisionTower)

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None)) or hf_config
    vc = ns(getattr(hf_config, "vision_config", None))
    mc = LlamaConfig.from_hf_config(tc)
    mc.hf_family = "mistral_native"
    mc.dtype = config.model.jax_dtype
    vcfg = (PixtralVisionConfig.from_hf(vc) if vc is not None
            else PixtralVisionConfig())
    tower = PixtralVisionTower(vcfg, -1)
    return LlavaModel(
        mc, vcfg, linear_method,
        image_token_index=getattr(vc, "image_token_id", 10),
        vision_feature_select_strategy="full",
        projector_act="gelu",  # adapter: w_in -> GELU -> w_out
        tower=tower)


@register_model("LlavaNextVideoForConditionalGeneration")
def _build_llava_next_video(hf_config, config: EngineConfig,
                            linear_method):
    # LLaVA-NeXT-Video (reference models/llava_next_video.py): anyres
    # images + average-pooled video frames on the CLIP tower
    from types import SimpleNamespace

    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.models.llava_next_video import LlavaNextVideoModel
    from vllm_pq_tpu.multimodal.clip import CLIPVisionConfig

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None))
    vc = ns(getattr(hf_config, "vision_config", None))
    mc = LlamaConfig.from_hf_config(tc) if tc is not None else LlamaConfig()
    mc.dtype = config.model.jax_dtype
    vcfg = (CLIPVisionConfig.from_hf(vc) if vc is not None
            else CLIPVisionConfig())
    return LlavaNextVideoModel(
        mc, vcfg, linear_method,
        image_token_index=getattr(hf_config, "image_token_index", 32001),
        vision_feature_layer=getattr(hf_config, "vision_feature_layer",
                                     -2),
        vision_feature_select_strategy=getattr(
            hf_config, "vision_feature_select_strategy", "default"),
        projector_act=getattr(hf_config, "projector_hidden_act", "gelu"),
        image_grid_pinpoints=getattr(hf_config, "image_grid_pinpoints",
                                     None),
        spatial_pool_stride=getattr(hf_config, "spatial_pool_stride", 2),
        spatial_pool_mode=getattr(hf_config, "spatial_pool_mode",
                                  "average"),
        video_token_index=getattr(hf_config, "video_token_index", 32000))


@register_model("LlavaOnevisionForConditionalGeneration")
def _build_llava_onevision(hf_config, config: EngineConfig,
                           linear_method):
    # LLaVA-OneVision (reference models/llava_onevision.py): SigLIP
    # anyres_max grid + bilinear-pooled video frames on a Qwen2 LM
    from types import SimpleNamespace

    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.models.llava_onevision import LlavaOnevisionModel
    from vllm_pq_tpu.multimodal.siglip import (SiglipVisionConfig,
                                               SiglipVisionTower)

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None))
    vc = ns(getattr(hf_config, "vision_config", None))
    mc = LlamaConfig.from_hf_config(tc) if tc is not None else LlamaConfig()
    if getattr(tc, "model_type", "qwen2") == "qwen2":
        mc.attention_bias = True
    mc.dtype = config.model.jax_dtype
    vcfg = (SiglipVisionConfig.from_hf(vc) if vc is not None
            else SiglipVisionConfig())
    # vision_feature_layer=-1 = hidden_states[-1], BEFORE post_layernorm
    tower = SiglipVisionTower(vcfg, apply_post_layernorm=False)
    return LlavaOnevisionModel(
        mc, vcfg, linear_method,
        image_token_index=getattr(hf_config, "image_token_index",
                                  151646),
        vision_feature_select_strategy="full",
        projector_act=getattr(hf_config, "projector_hidden_act", "gelu"),
        tower=tower,
        image_grid_pinpoints=getattr(hf_config, "image_grid_pinpoints",
                                     None),
        vision_aspect_ratio=getattr(hf_config, "vision_aspect_ratio",
                                    "anyres_max_9"),
        video_token_index=getattr(hf_config, "video_token_index",
                                  151647))


@register_model("PaliGemmaForConditionalGeneration")
def _build_paligemma(hf_config, config: EngineConfig, linear_method):
    from types import SimpleNamespace

    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.models.paligemma import PaliGemmaModel
    from vllm_pq_tpu.multimodal.siglip import SiglipVisionConfig

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None))
    vc = ns(getattr(hf_config, "vision_config", None))
    mc = LlamaConfig.from_hf_config(tc) if tc is not None else LlamaConfig()
    # Gemma text stack flags (same as _build_gemma)
    mc.hidden_act = (getattr(tc, "hidden_activation", None)
                     or getattr(tc, "hidden_act", None)
                     or "gelu_pytorch_tanh")
    mc.embed_scale = mc.hidden_size ** 0.5
    mc.gemma_norm = True
    mc.tie_word_embeddings = True
    mc.dtype = config.model.jax_dtype
    vcfg = (SiglipVisionConfig.from_hf(vc) if vc is not None
            else SiglipVisionConfig())
    return PaliGemmaModel(
        mc, vcfg, linear_method,
        image_token_index=getattr(hf_config, "image_token_index",
                                  257152),
        projection_dim=(getattr(vc, "projection_dim", None)
                        or getattr(hf_config, "projection_dim", 0)
                        or 0))


@register_model("Blip2ForConditionalGeneration")
def _build_blip2(hf_config, config: EngineConfig, linear_method):
    from types import SimpleNamespace

    from vllm_pq_tpu.models.blip2 import (Blip2Model, Blip2QFormerCfg,
                                          Blip2VisionCfg)
    from vllm_pq_tpu.models.opt import OPTConfig

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None))
    vc = ns(getattr(hf_config, "vision_config", None))
    qc = ns(getattr(hf_config, "qformer_config", None))
    mc = (OPTConfig.from_hf_config(tc) if tc is not None
          else OPTConfig())
    mc.dtype = config.model.jax_dtype
    return Blip2Model(
        mc,
        Blip2VisionCfg.from_hf(vc) if vc is not None
        else Blip2VisionCfg(),
        Blip2QFormerCfg.from_hf(qc) if qc is not None
        else Blip2QFormerCfg(),
        linear_method,
        num_query_tokens=getattr(hf_config, "num_query_tokens", 32),
        image_token_index=getattr(hf_config, "image_token_index",
                                  50265))


@register_model("Qwen2AudioForConditionalGeneration")
def _build_qwen2_audio(hf_config, config: EngineConfig, linear_method):
    from types import SimpleNamespace

    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.models.qwen2_audio import (Qwen2AudioEncoderConfig,
                                                Qwen2AudioModel)

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None))
    ac = ns(getattr(hf_config, "audio_config", None))
    mc = LlamaConfig.from_hf_config(tc) if tc is not None else LlamaConfig()
    mc.attention_bias = True  # qwen2 text stack
    mc.dtype = config.model.jax_dtype
    acfg = (Qwen2AudioEncoderConfig.from_hf(ac) if ac is not None
            else Qwen2AudioEncoderConfig())
    return Qwen2AudioModel(
        mc, acfg, linear_method,
        audio_token_index=getattr(hf_config, "audio_token_index",
                                  151646))


@register_model("JAISLMHeadModel")
def _build_jais(hf_config, config: EngineConfig, linear_method):
    # Core42 JAIS (reference models/jais.py): GPT-2-style tree with
    # ALiBi positions, biased fused c_attn, SwiGLU c_fc/c_fc2, and muP
    # scalings (embeddings_scale, width-scaled logits, 1/d attention
    # when scale_qk_dot_by_d)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    hf = hf_config
    h = getattr(hf, "n_embd", getattr(hf, "hidden_size", 768))
    heads = getattr(hf, "n_head", getattr(hf, "num_attention_heads", 12))
    inner = getattr(hf, "n_inner", None) or 4 * h
    swiglu = getattr(hf, "activation_function", "gelu") == "swiglu"
    mc = LlamaConfig(
        vocab_size=hf.vocab_size, hidden_size=h,
        # JAIS n_inner counts ONE branch (c_fc and c_fc2 each [h, inner])
        intermediate_size=inner,
        num_hidden_layers=getattr(hf, "n_layer",
                                  getattr(hf, "num_hidden_layers", 12)),
        num_attention_heads=heads, num_key_value_heads=heads,
        rms_norm_eps=getattr(hf, "layer_norm_epsilon", 1e-5),
        max_position_embeddings=getattr(hf, "n_positions", 2048),
        tie_word_embeddings=True,
    )
    mc.norm_type = "layernorm"
    mc.alibi = getattr(hf, "position_embedding_type", "alibi") == "alibi"
    mc.attention_bias = True
    mc.o_proj_bias = True
    mc.mlp_bias = True
    mc.mlp_style = "swiglu" if swiglu else "mlp"
    mc.hidden_act = "silu" if swiglu else "gelu_new"
    emb_scale = getattr(hf, "embeddings_scale",
                        getattr(hf, "mup_embeddings_scale", None))
    if emb_scale and emb_scale != 1.0:
        mc.embed_scale = float(emb_scale)
    alpha = getattr(hf, "mup_output_alpha", None)
    wscale = getattr(hf, "mup_width_scale", None)
    if alpha is not None and wscale is not None:
        mc.logit_scale = float(alpha) * float(wscale)
    elif getattr(hf, "width_scale", None):
        mc.logit_scale = float(hf.width_scale)
    if getattr(hf, "mup_scale_qk_dot_by_d",
               getattr(hf, "scale_qk_dot_by_d", False)):
        mc.attention_multiplier = 1.0 / mc.head_dim
    mc.hf_family = "jais"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("ChameleonForConditionalGeneration")
def _build_chameleon(hf_config, config: EngineConfig, linear_method):
    # Chameleon (reference models/chameleon.py): llama math + per-head
    # non-affine LayerNorm qk-norm with learned per-head scale/bias;
    # images enter as discrete VQ tokens already present in the vocab
    # (the host-side VQ-VAE tokenizer is out of scope — prompts carry
    # image token ids directly)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.qk_norm = "head_ln_chameleon"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("Phi3VForCausalLM")
def _build_phi3v(hf_config, config: EngineConfig, linear_method):
    # Phi-3-Vision (reference models/phi3v.py): hardwired CLIP
    # ViT-L/14-336 tower (layer -2) + HD transform + Phi-3 decoder
    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.models.phi3v import Phi3VModel
    from vllm_pq_tpu.multimodal.clip import CLIPVisionConfig
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.dtype = config.model.jax_dtype
    # reference CLIP_VIT_LARGE_PATCH14_336_CONFIG (phi3v.py:61);
    # a nested vision_config (used by the tiny tests) overrides
    vc = getattr(hf_config, "vision_config", None)
    if isinstance(vc, dict):
        from types import SimpleNamespace
        vc = SimpleNamespace(**vc)
    if vc is not None:
        vcfg = CLIPVisionConfig.from_hf(vc)
    else:
        vcfg = CLIPVisionConfig(
            hidden_size=1024, intermediate_size=4096,
            num_hidden_layers=24, num_attention_heads=16,
            image_size=336, patch_size=14)
    return Phi3VModel(
        mc, vcfg, linear_method,
        image_token_index=getattr(hf_config, "image_token_id", 32044))


@register_model("Phi4MMForCausalLM")
def _build_phi4mm(hf_config, config: EngineConfig, linear_method):
    # Phi-4-multimodal (reference models/phi4mm.py): SigLIP-so400m
    # tapped at layer -2 + AvgPool2d token compression + the Phi-3V HD
    # transform on the Phi-4-mini decoder; modality LoRAs
    # (vision-lora/speech-lora PEFT dirs) serve via lora/; audio
    # encoder not yet implemented
    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.models.phi4mm import Phi4MMModel
    from vllm_pq_tpu.multimodal.siglip import SiglipVisionConfig
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.dtype = config.model.jax_dtype
    vc = getattr(hf_config, "vision_config", None)
    if isinstance(vc, dict):
        from types import SimpleNamespace
        vc = SimpleNamespace(**vc)
    if vc is not None:
        vcfg = SiglipVisionConfig.from_hf(vc)
    else:
        # SigLIP so400m/patch14/448 (reference phi4mm.py
        # get_navit_vision_model)
        vcfg = SiglipVisionConfig(
            hidden_size=1152, intermediate_size=4304,
            num_hidden_layers=27, num_attention_heads=16,
            image_size=448, patch_size=14)
    ap = getattr(hf_config, "audio_processor", None) or {}
    if isinstance(ap, dict):
        audio_cfg = ap.get("config")
    else:
        audio_cfg = getattr(ap, "config", None)
    return Phi4MMModel(
        mc, vcfg, linear_method,
        image_token_index=getattr(hf_config, "image_token_id",
                                  200010),
        audio_cfg=audio_cfg,
        audio_token_index=getattr(hf_config, "audio_token_id",
                                  200011))


@register_model("UltravoxModel")
def _build_ultravox(hf_config, config: EngineConfig, linear_method):
    # Ultravox speech-language (reference models/ultravox.py): Whisper
    # encoder + frame-stacking SwiGLU projector + llama-family LM
    from types import SimpleNamespace

    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.models.qwen2_audio import Qwen2AudioEncoderConfig
    from vllm_pq_tpu.models.ultravox import UltravoxModel

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None))
    ac = ns(getattr(hf_config, "audio_config", None))
    mc = LlamaConfig.from_hf_config(tc) if tc is not None else LlamaConfig()
    if getattr(tc, "model_type", "") == "qwen2":
        mc.attention_bias = True
    mc.dtype = config.model.jax_dtype
    acfg = (Qwen2AudioEncoderConfig.from_hf(ac) if ac is not None
            else Qwen2AudioEncoderConfig())
    return UltravoxModel(
        mc, acfg, linear_method,
        audio_token_index=getattr(hf_config, "audio_token_index", 32000),
        stack_factor=getattr(hf_config, "stack_factor", 8),
        projector_hidden=getattr(hf_config, "hidden_size", 4096),
        projector_act=getattr(hf_config, "projector_act", "swiglu"),
        projector_ln_mid=getattr(hf_config, "projector_ln_mid", False))


@register_model("BartForConditionalGeneration", "BartModel")
def _build_bart(hf_config, config: EngineConfig, linear_method):
    from vllm_pq_tpu.models.bart import BartConfig, BartModel
    mc = (BartConfig.from_hf_config(hf_config) if hf_config is not None
          else BartConfig())
    mc.dtype = config.model.jax_dtype
    return BartModel(mc, linear_method)


@register_model("InternVLForConditionalGeneration",
                # the arch string REAL InternVL2/2.5 checkpoints carry
                # (reference registry.py:166 InternVLChatModel); their
                # config nests the decoder under ``llm_config``
                "InternVLChatModel",
                # same chat format, NVIDIA/H2O forks (reference
                # models/nvlm_d.py, h2ovl.py — both subclass the
                # InternVL processor/tower with minor prompt deltas)
                "NVLM_D", "H2OVLChatModel")
def _build_internvl(hf_config, config: EngineConfig, linear_method):
    from types import SimpleNamespace

    from vllm_pq_tpu.models.internvl import InternVLModel
    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.multimodal.internvit import InternVisionConfig

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None)
            or getattr(hf_config, "llm_config", None))
    vc = ns(getattr(hf_config, "vision_config", None))
    mc = LlamaConfig.from_hf_config(tc) if tc is not None else LlamaConfig()
    llm_arch = (getattr(tc, "architectures", None) or [""])[0]
    if getattr(tc, "model_type", "") == "qwen2" \
            or "Qwen2" in llm_arch:
        mc.attention_bias = True  # qwen2 text stack (registry _build_qwen2)
    if "InternLM2" in llm_arch:
        # legacy InternVL2/2.5 text stack: InternLM2 wqkv naming
        # (reference models/internlm2.py role)
        mc.attention_bias = getattr(tc, "bias", False)
        mc.hf_family = "internlm2"
    mc.dtype = config.model.jax_dtype
    vcfg = (InternVisionConfig.from_hf(vc) if vc is not None
            else InternVisionConfig())
    sel = getattr(hf_config, "select_layer", -1)
    if sel < -1:
        # feature tap below the top: drop the unused trailing blocks
        # (reference internvl.py vision_feature_layer slicing)
        vcfg.num_hidden_layers = vcfg.num_hidden_layers + sel + 1
    return InternVLModel(
        mc, vcfg, linear_method,
        image_token_id=getattr(hf_config, "image_token_id", 151667),
        downsample_ratio=getattr(hf_config, "downsample_ratio", 0.5),
        projector_act=getattr(hf_config, "projector_hidden_act",
                              "gelu"))


@register_model("Idefics3ForConditionalGeneration",
                "SmolVLMForConditionalGeneration")
def _build_idefics3(hf_config, config: EngineConfig, linear_method):
    from types import SimpleNamespace

    from vllm_pq_tpu.models.idefics3 import Idefics3Model
    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.multimodal.siglip import SiglipVisionConfig

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None))
    vc = ns(getattr(hf_config, "vision_config", None))
    mc = LlamaConfig.from_hf_config(tc) if tc is not None else LlamaConfig()
    mc.dtype = config.model.jax_dtype
    vcfg = (SiglipVisionConfig.from_hf(vc) if vc is not None
            else SiglipVisionConfig())
    return Idefics3Model(
        mc, vcfg, linear_method,
        image_token_id=getattr(hf_config, "image_token_id", 128257),
        scale_factor=int(getattr(hf_config, "scale_factor", 2)))


@register_model("GPTNeoXForCausalLM")
def _build_gpt_neox(hf_config, config: EngineConfig, linear_method):
    # parallel-residual layernorm decoder with fused (de-interleaved at
    # load) qkv, partial rotary, biased two-linear MLP (reference
    # models/gpt_neox.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = (LlamaConfig.from_hf_config(hf_config) if hf_config is not None
          else LlamaConfig())
    mc.norm_type = "layernorm"
    mc.rms_norm_eps = getattr(hf_config, "layer_norm_eps", 1e-5)
    mc.parallel_residual = getattr(hf_config, "use_parallel_residual",
                                   True)
    mc.partial_rotary_factor = getattr(hf_config, "rotary_pct", 1.0)
    mc.rope_theta = getattr(hf_config, "rotary_emb_base",
                            getattr(hf_config, "rope_theta", 10000.0))
    mc.mlp_style = "mlp"
    mc.attention_bias = True
    mc.o_proj_bias = True
    mc.mlp_bias = True
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("PhiForCausalLM")
def _build_phi(hf_config, config: EngineConfig, linear_method):
    # Phi-1/1.5/2: parallel residual with a SINGLE shared input norm,
    # biased lm_head, partial rotary (reference models/phi.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = (LlamaConfig.from_hf_config(hf_config) if hf_config is not None
          else LlamaConfig())
    mc.norm_type = "layernorm"
    mc.rms_norm_eps = getattr(hf_config, "layer_norm_eps", 1e-5)
    mc.parallel_residual = True
    mc.shared_input_norm = True
    mc.partial_rotary_factor = getattr(hf_config, "partial_rotary_factor",
                                       0.5)
    mc.mlp_style = "mlp"
    mc.attention_bias = True
    mc.o_proj_bias = True
    mc.mlp_bias = True
    mc.lm_head_bias = True
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("StableLmForCausalLM", "StableLMEpochForCausalLM",
                "StableLmEpochForCausalLM",
                "StablelmForCausalLM")  # ref registry.py spelling
def _build_stablelm(hf_config, config: EngineConfig, linear_method):
    # llama block with layernorm + partial rotary (reference
    # models/stablelm.py; the Epoch alias uses norm_eps / rope_pct
    # config field names)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = (LlamaConfig.from_hf_config(hf_config) if hf_config is not None
          else LlamaConfig())
    mc.norm_type = "layernorm"
    mc.rms_norm_eps = getattr(hf_config, "layer_norm_eps",
                              getattr(hf_config, "norm_eps", 1e-5))
    mc.partial_rotary_factor = getattr(
        hf_config, "partial_rotary_factor",
        getattr(hf_config, "rope_pct", 0.25))
    mc.attention_bias = getattr(hf_config, "use_qkv_bias", False)
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("OrionForCausalLM")
def _build_orion(hf_config, config: EngineConfig, linear_method):
    # Orion-14B: llama structure with biased LayerNorm in place of
    # RMSNorm (reference models/orion.py:181 nn.LayerNorm with
    # eps=config.rms_norm_eps)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.norm_type = "layernorm"
    mc.norm_bias = True
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("MiniCPMForCausalLM")
def _build_minicpm(hf_config, config: EngineConfig, linear_method):
    # MiniCPM: llama + mu-parametrization scalers — embeddings scaled by
    # scale_emb, each residual branch by scale_depth/sqrt(L), logits by
    # dim_model_base/hidden (reference models/minicpm.py:341,399,552)
    import math

    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.embed_scale = getattr(hf_config, "scale_emb", 1.0)
    if mc.embed_scale == 1.0:
        mc.embed_scale = None
    sd = getattr(hf_config, "scale_depth", 1.0)
    mc.residual_multiplier = sd / math.sqrt(mc.num_hidden_layers)
    dmb = getattr(hf_config, "dim_model_base", None)
    if dmb:
        mc.logit_scale = dmb / mc.hidden_size
    mc.tie_word_embeddings = getattr(hf_config, "tie_word_embeddings",
                                     True)
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("HeliumForCausalLM")
def _build_helium(hf_config, config: EngineConfig, linear_method):
    # Kyutai Helium: llama math with INTERLEAVED (gptj-style) rotary
    # (HF modeling_helium rotate_half stacks even/odd lanes),
    # theta=100000
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.rope_style = "gptj"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("ExaoneForCausalLM")
def _build_exaone(hf_config, config: EngineConfig, linear_method):
    # LG EXAONE: llama math under a GPT-style checkpoint tree
    # (transformer.h.*.attn.attention.*, mlp.c_fc_0/c_fc_1/c_proj;
    # reference models/exaone.py:489 stacked-params mapping)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    h = getattr(hf_config, "hidden_size", 4096)
    heads = getattr(hf_config, "num_attention_heads", 32)
    mc = LlamaConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=h,
        intermediate_size=getattr(hf_config, "intermediate_size", 4 * h),
        num_hidden_layers=getattr(hf_config, "num_layers",
                                  getattr(hf_config, "num_hidden_layers",
                                          32)),
        num_attention_heads=heads,
        num_key_value_heads=getattr(hf_config, "num_key_value_heads",
                                    heads),
        rms_norm_eps=getattr(hf_config, "layer_norm_epsilon", 1e-5),
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rope_scaling=getattr(hf_config, "rope_scaling", None),
        max_position_embeddings=getattr(hf_config,
                                        "max_position_embeddings", 4096),
        tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                    False),
        hidden_act=getattr(hf_config, "activation_function", "silu"),
    )
    mc.hf_family = "exaone"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("Starcoder2ForCausalLM")
def _build_starcoder2(hf_config, config: EngineConfig, linear_method):
    # GQA layernorm decoder, biased everywhere, gelu two-linear MLP,
    # sliding window (reference models/starcoder2.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = (LlamaConfig.from_hf_config(hf_config) if hf_config is not None
          else LlamaConfig())
    mc.norm_type = "layernorm"
    mc.rms_norm_eps = getattr(hf_config, "norm_epsilon", 1e-5)
    # HF Starcoder2Config defaults tie_word_embeddings to True, so a
    # config.json that omits the field means TIED (generic reader
    # assumes False)
    mc.tie_word_embeddings = getattr(hf_config, "tie_word_embeddings",
                                     True)
    mc.mlp_style = "mlp"
    use_bias = getattr(hf_config, "use_bias", True)
    mc.attention_bias = use_bias
    mc.o_proj_bias = use_bias
    mc.mlp_bias = use_bias
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("FalconForCausalLM", "RWForCausalLM")
def _build_falcon(hf_config, config: EngineConfig, linear_method):
    # Falcon-7B: MQA + parallel residual with a single shared input
    # norm; Falcon-40B (new_decoder_arch): GQA + separate ln_attn /
    # ln_mlp (reference models/falcon.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    h = getattr(hf_config, "hidden_size", 4544)
    heads = getattr(hf_config, "num_attention_heads",
                    getattr(hf_config, "n_head", 71))
    new_arch = getattr(hf_config, "new_decoder_architecture",
                       getattr(hf_config, "new_decoder_arch", False))
    if new_arch:
        kvh = getattr(hf_config, "num_kv_heads", heads)
    elif getattr(hf_config, "multi_query", True):
        kvh = 1
    else:
        kvh = heads
    mc = LlamaConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=h,
        intermediate_size=getattr(hf_config, "ffn_hidden_size", 4 * h),
        num_hidden_layers=getattr(hf_config, "num_hidden_layers",
                                  getattr(hf_config, "n_layer", 32)),
        num_attention_heads=heads,
        num_key_value_heads=kvh,
        rms_norm_eps=getattr(hf_config, "layer_norm_epsilon", 1e-5),
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        max_position_embeddings=getattr(hf_config,
                                        "max_position_embeddings", 2048),
        tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                    True),
    )
    mc.norm_type = "layernorm"
    mc.mlp_style = "mlp"
    mc.hidden_act = "gelu"
    mc.parallel_residual = getattr(hf_config, "parallel_attn", True)
    # 7B shares one input norm between attn and mlp; 40B has ln_attn +
    # ln_mlp (mapped to input/post_attention layernorm)
    mc.shared_input_norm = mc.parallel_residual and not new_arch
    use_bias = getattr(hf_config, "bias", False)
    mc.attention_bias = use_bias
    mc.o_proj_bias = use_bias
    mc.mlp_bias = use_bias
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("InternLMForCausalLM")
def _build_internlm(hf_config, config: EngineConfig, linear_method):
    # InternLM-1: llama math with qkv+o biases (reference
    # models/internlm.py via llama with bias=True)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    bias = getattr(hf_config, "bias", True)
    mc.attention_bias = bias
    mc.o_proj_bias = bias
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("Qwen3ForCausalLM")
def _build_qwen3(hf_config, config: EngineConfig, linear_method):
    # Qwen3 = llama + per-head RMS q/k norms, no qkv bias (reference
    # models/qwen3.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = (LlamaConfig.from_hf_config(hf_config) if hf_config is not None
          else LlamaConfig())
    mc.qk_norm = "head"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("GraniteForCausalLM")
def _build_granite(hf_config, config: EngineConfig, linear_method):
    # IBM Granite: llama + embedding/residual/attention multipliers and
    # logits_scaling divisor (reference models/granite.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.embed_scale = getattr(hf_config, "embedding_multiplier", 1.0)
    if mc.embed_scale == 1.0:
        mc.embed_scale = None
    mc.residual_multiplier = getattr(hf_config, "residual_multiplier",
                                     1.0)
    mc.attention_multiplier = getattr(hf_config, "attention_multiplier",
                                      None)
    ls = getattr(hf_config, "logits_scaling", 1.0)
    mc.logit_scale = (1.0 / ls) if ls and ls != 1.0 else None
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("CohereForCausalLM", "Cohere2ForCausalLM")
def _build_cohere(hf_config, config: EngineConfig, linear_method):
    # Command-R: bias-free layernorm, parallel residual sharing ONE
    # input norm, interleaved rope, logit_scale, tied embeddings
    # (reference models/commandr.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.norm_type = "layernorm"
    mc.norm_bias = False
    mc.rms_norm_eps = getattr(hf_config, "layer_norm_eps", 1e-5)
    mc.parallel_residual = True
    mc.shared_input_norm = True
    mc.rope_style = "gptj"
    mc.tie_word_embeddings = True
    mc.logit_scale = getattr(hf_config, "logit_scale", 1.0)
    if getattr(hf_config, "use_qk_norm", False):
        mc.qk_norm = "head_ln"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("GPTJForCausalLM")
def _build_gptj(hf_config, config: EngineConfig, linear_method):
    # GPT-J: parallel residual off ONE norm, interleaved partial rotary,
    # biased two-linear MLP + biased lm_head (reference models/gpt_j.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    h = getattr(hf_config, "n_embd", 4096)
    heads = getattr(hf_config, "n_head", 16)
    mc = LlamaConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=h,
        intermediate_size=getattr(hf_config, "n_inner", None) or 4 * h,
        num_hidden_layers=getattr(hf_config, "n_layer", 28),
        num_attention_heads=heads,
        num_key_value_heads=heads,
        max_position_embeddings=getattr(hf_config, "n_positions", 2048),
        rope_theta=10000.0,
    )
    mc.norm_type = "layernorm"
    mc.rms_norm_eps = getattr(hf_config, "layer_norm_epsilon", 1e-5)
    mc.parallel_residual = True
    mc.shared_input_norm = True
    mc.rope_style = "gptj"
    mc.partial_rotary_factor = (getattr(hf_config, "rotary_dim", None)
                                or mc.head_dim) / mc.head_dim
    mc.mlp_style = "mlp"
    mc.mlp_bias = True
    mc.hidden_act = getattr(hf_config, "activation_function", "gelu_new")
    mc.lm_head_bias = True
    mc.hf_family = "gptj"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("OlmoForCausalLM")
def _build_olmo(hf_config, config: EngineConfig, linear_method):
    # OLMo: non-parametric layernorm, optional qkv clamp (reference
    # models/olmo.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.norm_type = "layernorm"
    mc.norm_affine = False
    mc.rms_norm_eps = 1e-5
    mc.clip_qkv = getattr(hf_config, "clip_qkv", None)
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("Olmo2ForCausalLM")
def _build_olmo2(hf_config, config: EngineConfig, linear_method):
    # OLMo2: branch-output norms (no input norms), full-width q/k RMS
    # norms (reference models/olmo2.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.block_style = "olmo2"
    mc.qk_norm = "full"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("GlmForCausalLM")
def _build_glm(hf_config, config: EngineConfig, linear_method):
    # GLM-4: llama structure + interleaved partial rotary + qkv bias +
    # packed gate_up (reference models/glm.py via transformers backend)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.rope_style = "gptj"
    mc.partial_rotary_factor = getattr(hf_config,
                                       "partial_rotary_factor", 0.5)
    mc.attention_bias = getattr(hf_config, "attention_bias", True)
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("BloomForCausalLM")
def _build_bloom(hf_config, config: EngineConfig, linear_method):
    # Bloom: ALiBi, layernorm everywhere incl. post-embedding norm,
    # head-interleaved fused qkv (reference models/bloom.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    h = getattr(hf_config, "hidden_size", getattr(hf_config, "n_embed",
                                                  1024))
    heads = getattr(hf_config, "n_head",
                    getattr(hf_config, "num_attention_heads", 16))
    mc = LlamaConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=h,
        intermediate_size=4 * h,
        num_hidden_layers=getattr(hf_config, "n_layer", 24),
        num_attention_heads=heads,
        num_key_value_heads=heads,
        max_position_embeddings=getattr(hf_config,
                                        "max_position_embeddings", 2048),
    )
    mc.alibi = True
    mc.norm_type = "layernorm"
    mc.rms_norm_eps = getattr(hf_config, "layer_norm_epsilon", 1e-5)
    mc.embed_norm = True
    mc.mlp_style = "mlp"
    mc.mlp_bias = True
    mc.attention_bias = True
    mc.o_proj_bias = True
    mc.hidden_act = "gelu_pytorch_tanh"
    mc.tie_word_embeddings = True
    mc.hf_family = "bloom"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("MPTForCausalLM", "MptForCausalLM")
def _build_mpt(hf_config, config: EngineConfig, linear_method):
    # MPT: ALiBi, bias-free layernorm + linears, fused Wqkv with
    # optional clamp (reference models/mpt.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    h = getattr(hf_config, "d_model", 2048)
    heads = getattr(hf_config, "n_heads", 16)
    attn_cfg = getattr(hf_config, "attn_config", {}) or {}
    if not isinstance(attn_cfg, dict):
        attn_cfg = attn_cfg.__dict__
    kvh = attn_cfg.get("kv_n_heads", heads)
    mc = LlamaConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=h,
        intermediate_size=getattr(hf_config, "expansion_ratio", 4) * h,
        num_hidden_layers=getattr(hf_config, "n_layers", 24),
        num_attention_heads=heads,
        num_key_value_heads=kvh,
        max_position_embeddings=getattr(hf_config, "max_seq_len", 2048),
    )
    mc.alibi = attn_cfg.get("alibi", True)
    mc.clip_qkv = attn_cfg.get("clip_qkv", None)
    mc.norm_type = "layernorm"
    mc.norm_bias = not getattr(hf_config, "no_bias", True)
    mc.rms_norm_eps = 1e-5
    mc.mlp_style = "mlp"
    mc.mlp_bias = not getattr(hf_config, "no_bias", True)
    mc.attention_bias = not getattr(hf_config, "no_bias", True)
    mc.hidden_act = "gelu"
    mc.tie_word_embeddings = True
    mc.hf_family = "mpt"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("BaichuanForCausalLM", "BaiChuanForCausalLM")
def _build_baichuan(hf_config, config: EngineConfig, linear_method):
    # Baichuan: llama structure with fused W_pack qkv; the 13B variant
    # (arch spelled "BaichuanForCausalLM" with 40 layers / no rope in
    # HF's impl) uses ALiBi (reference models/baichuan.py:330-349
    # position_embedding selection)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    # vLLM keys alibi off the model size: 13B (hidden 5120) = ALiBi
    if getattr(hf_config, "position_embedding", None) == "ALIBI" or \
            mc.hidden_size >= 5120:
        mc.alibi = True
    mc.hf_family = "baichuan"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("InternLM2ForCausalLM",
                # visual-expert variant (reference models/internlm2_ve.py)
                # is text-identical when no visual tokens are routed; the
                # extra feed_forward_ve branch exists only for InternVL
                # composites, which splice embeddings instead here
                "InternLM2VEForCausalLM")
def _build_internlm2(hf_config, config: EngineConfig, linear_method):
    # InternLM2: llama math, grouped fused wqkv + renamed tree
    # (reference models/internlm2.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.attention_bias = getattr(hf_config, "bias", False)
    mc.hf_family = "internlm2"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("Qwen2VLForConditionalGeneration")
def _build_qwen2_vl(hf_config, config: EngineConfig, linear_method):
    # Qwen2-VL: Qwen2 text decoder + MRoPE + ViT vision tower
    # (reference models/qwen2_vl.py + rotary_embedding.py:849 MRoPE)
    from types import SimpleNamespace

    from vllm_pq_tpu.models.qwen2_vl import (Qwen2VLConfig, Qwen2VLModel,
                                             Qwen2VLVisionCfg)

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None)) or hf_config
    from vllm_pq_tpu.models.llama import LlamaConfig
    base = LlamaConfig.from_hf_config(tc)
    mc = Qwen2VLConfig(**base.__dict__)
    mc.attention_bias = True
    rs = getattr(tc, "rope_scaling", None) or {}
    mc.rope_scaling = None  # mrope is not a table transform
    mc.mrope_section = tuple(rs.get("mrope_section", (16, 24, 24)))
    mc.image_token_id = getattr(hf_config, "image_token_id", 151655)
    vc = ns(getattr(hf_config, "vision_config", None))
    if vc is not None:
        mc.vision = Qwen2VLVisionCfg(
            depth=getattr(vc, "depth", 32),
            embed_dim=getattr(vc, "embed_dim", 1280),
            num_heads=getattr(vc, "num_heads", 16),
            mlp_ratio=getattr(vc, "mlp_ratio", 4.0),
            in_channels=getattr(vc, "in_channels", 3),
            patch_size=getattr(vc, "patch_size", 14),
            temporal_patch_size=getattr(vc, "temporal_patch_size", 2),
            spatial_merge_size=getattr(vc, "spatial_merge_size", 2),
            hidden_act=getattr(vc, "hidden_act", "quick_gelu"))
    mc.hf_family = "qwen2_vl"
    mc.dtype = config.model.jax_dtype
    return Qwen2VLModel(mc, linear_method)


@register_model("Qwen2_5_VLForConditionalGeneration")
def _build_qwen2_5_vl(hf_config, config: EngineConfig, linear_method):
    # Qwen2.5-VL (reference models/qwen2_5_vl.py): Qwen2-VL with a
    # windowed RMSNorm/SwiGLU ViT
    from types import SimpleNamespace

    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.models.qwen2_5_vl import (Qwen25VLModel,
                                               Qwen25VLVisionCfg)
    from vllm_pq_tpu.models.qwen2_vl import Qwen2VLConfig

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None)) or hf_config
    base = LlamaConfig.from_hf_config(tc)
    mc = Qwen2VLConfig(**base.__dict__)
    mc.attention_bias = True
    rs = getattr(tc, "rope_scaling", None) or {}
    mc.rope_scaling = None
    mc.mrope_section = tuple(rs.get("mrope_section", (16, 24, 24)))
    mc.image_token_id = getattr(hf_config, "image_token_id", 151655)
    vc = ns(getattr(hf_config, "vision_config", None))
    if vc is not None:
        e = getattr(vc, "hidden_size", getattr(vc, "embed_dim", 1280))
        mc.vision = Qwen25VLVisionCfg(
            depth=getattr(vc, "depth", 32),
            embed_dim=e,
            num_heads=getattr(vc, "num_heads", 16),
            in_channels=getattr(vc, "in_channels",
                                getattr(vc, "in_chans", 3)),
            patch_size=getattr(vc, "patch_size", 14),
            temporal_patch_size=getattr(vc, "temporal_patch_size", 2),
            spatial_merge_size=getattr(vc, "spatial_merge_size", 2),
            intermediate_size=getattr(vc, "intermediate_size", 3420),
            window_size=getattr(vc, "window_size", 112),
            fullatt_block_indexes=tuple(
                getattr(vc, "fullatt_block_indexes", None)
                or (7, 15, 23, 31)),
            hidden_act=getattr(vc, "hidden_act", "silu"))
    mc.hf_family = "qwen2_vl"
    mc.dtype = config.model.jax_dtype
    return Qwen25VLModel(mc, linear_method)


@register_model("MllamaForConditionalGeneration")
def _build_mllama(hf_config, config: EngineConfig, linear_method):
    # Llama-3.2-Vision (reference models/mllama.py): llama decoder with
    # tanh-gated cross-attention layers over a two-stage tiled vision
    # encoder; encoder states cached per request (whisper-style)
    from types import SimpleNamespace

    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.models.mllama import (MllamaConfig, MllamaModel,
                                           MllamaVisionCfg)

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None)) or hf_config
    vc = ns(getattr(hf_config, "vision_config", None))
    base = LlamaConfig.from_hf_config(tc)
    mc = MllamaConfig(**base.__dict__)
    mc.cross_attention_layers = tuple(
        getattr(tc, "cross_attention_layers", ()) or ())
    if vc is not None:
        ili = getattr(vc, "intermediate_layers_indices",
                      (3, 7, 15, 23, 30))
        mc.vision = MllamaVisionCfg(
            hidden_size=getattr(vc, "hidden_size", 1280),
            intermediate_size=getattr(vc, "intermediate_size", 5120),
            num_hidden_layers=getattr(vc, "num_hidden_layers", 32),
            num_global_layers=getattr(vc, "num_global_layers", 8),
            attention_heads=getattr(vc, "attention_heads", 16),
            image_size=getattr(vc, "image_size", 448),
            patch_size=getattr(vc, "patch_size", 14),
            max_num_tiles=getattr(vc, "max_num_tiles", 4),
            max_aspect_ratio_id=getattr(vc, "max_aspect_ratio_id", 8),
            intermediate_layers_indices=tuple(ili),
            norm_eps=getattr(vc, "norm_eps", 1e-5))
    mc.hf_family = "mllama"
    mc.dtype = config.model.jax_dtype
    if config.scheduler.num_scheduler_steps > 1:
        logger.warning("multi-step windows unsupported for enc-dec "
                       "cross-attention; forcing num_scheduler_steps=1")
        config.scheduler.num_scheduler_steps = 1
    return MllamaModel(mc, linear_method)


@register_model("Glm4ForCausalLM")
def _build_glm4(hf_config, config: EngineConfig, linear_method):
    # GLM-4-0414: glm attention + sandwich norms (post_self_attn /
    # post_mlp norms on the branch outputs; reference models/glm4.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.rope_style = "gptj"
    mc.partial_rotary_factor = getattr(hf_config,
                                       "partial_rotary_factor", 0.5)
    mc.attention_bias = getattr(hf_config, "attention_bias", True)
    mc.use_post_norms = True
    mc.hf_family = "glm4"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("NemotronForCausalLM")
def _build_nemotron(hf_config, config: EngineConfig, linear_method):
    # Nemotron: layernorm1p (w+1, bias), relu^2 two-linear MLP, partial
    # rotary (reference models/nemotron.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.norm_type = "layernorm"
    mc.norm_plus_one = True
    mc.rms_norm_eps = getattr(hf_config, "norm_eps", 1e-5)
    mc.mlp_style = "mlp"
    mc.hidden_act = getattr(hf_config, "hidden_act", "relu2")
    mc.partial_rotary_factor = getattr(hf_config,
                                       "partial_rotary_factor", 0.5)
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("SmolLM3ForCausalLM")
def _build_smollm3(hf_config, config: EngineConfig, linear_method):
    # SmolLM3: llama + NoPE layers (no_rope_layers[li] == 0 skips rope;
    # reference models/smollm3.py via transformers backend)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    nrl = getattr(hf_config, "no_rope_layers", None)
    if nrl:
        mc.rope_layers = tuple(nrl)
    # SmolLM3 ties embeddings by default (its config.json omits the
    # default-valued field)
    mc.tie_word_embeddings = getattr(hf_config, "tie_word_embeddings",
                                     True)
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("PersimmonForCausalLM")
def _build_persimmon(hf_config, config: EngineConfig, linear_method):
    # sequential-residual layernorm decoder, fused per-head qkv, shared
    # per-head qk layernorm WITH bias, partial rotary, relu^2 two-linear
    # MLP (reference models/persimmon.py)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.norm_type = "layernorm"
    mc.rms_norm_eps = getattr(hf_config, "layer_norm_eps", 1e-5)
    mc.partial_rotary_factor = getattr(hf_config,
                                       "partial_rotary_factor", 0.5)
    mc.rope_theta = getattr(hf_config, "rope_theta", 25000.0)
    mc.mlp_style = "mlp"
    mc.hidden_act = getattr(hf_config, "hidden_act", "relu2")
    mc.attention_bias = True
    mc.o_proj_bias = True
    mc.mlp_bias = True
    # Persimmon is MHA-only: the fused qkv carries a full k/v per head
    mc.num_key_value_heads = mc.num_attention_heads
    if getattr(hf_config, "qk_layernorm", True):
        mc.qk_norm = "head_ln_bias"
    mc.tie_word_embeddings = getattr(hf_config, "tie_word_embeddings",
                                     False)
    mc.hf_family = "persimmon"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("FuyuForCausalLM")
def _build_fuyu(hf_config, config: EngineConfig, linear_method):
    # Persimmon decoder (see _build_persimmon) + raw-patch linear
    # vision embedding (reference models/fuyu.py)
    from types import SimpleNamespace

    from vllm_pq_tpu.models.fuyu import FuyuModel
    from vllm_pq_tpu.models.llama import LlamaConfig
    hf = getattr(hf_config, "text_config", None) or hf_config
    if isinstance(hf, dict):
        hf = SimpleNamespace(**hf)
    mc = LlamaConfig.from_hf_config(hf)
    mc.norm_type = "layernorm"
    mc.rms_norm_eps = getattr(hf, "layer_norm_eps", 1e-5)
    mc.partial_rotary_factor = getattr(hf, "partial_rotary_factor", 0.5)
    mc.rope_theta = getattr(hf, "rope_theta", 25000.0)
    mc.mlp_style = "mlp"
    mc.hidden_act = getattr(hf, "hidden_act", "relu2")
    mc.attention_bias = True
    mc.o_proj_bias = True
    mc.mlp_bias = True
    mc.num_key_value_heads = mc.num_attention_heads
    if getattr(hf, "qk_layernorm", True):
        mc.qk_norm = "head_ln_bias"
    mc.tie_word_embeddings = getattr(hf, "tie_word_embeddings", False)
    mc.hf_family = "persimmon"
    mc.dtype = config.model.jax_dtype
    return FuyuModel(
        mc, linear_method,
        patch_size=getattr(hf_config, "patch_size", 30),
        num_channels=getattr(hf_config, "num_channels", 3),
        image_size=getattr(hf_config, "image_size", 300) or 300,
        image_token_index=getattr(hf_config, "image_token_id", 71011))


@register_model("FalconMambaForCausalLM")
def _build_falcon_mamba(hf_config, config: EngineConfig, linear_method):
    # FalconMamba = mamba + weightless RMS on the (dt, B, C) selections
    # (reference models/falcon_mamba role via mamba)
    from vllm_pq_tpu.models.mamba import MambaConfig, MambaModel
    mc = MambaConfig.from_hf_config(hf_config)
    mc.rms_bcdt = True
    mc.mixer_rms_eps = getattr(hf_config, "mixer_rms_eps", 1e-6)
    mc.dtype = config.model.jax_dtype
    if config.cache.enable_prefix_caching:
        config.cache.enable_prefix_caching = False
    return MambaModel(mc)


@register_model("MambaForCausalLM")
def _build_mamba(hf_config, config: EngineConfig, linear_method):
    # Mamba-1 SSM (reference models/mamba.py + layers/mamba/): paged KV
    # machinery is bypassed for per-row recurrent states; prefix caching
    # has no meaning for a recurrent cache
    from vllm_pq_tpu.models.mamba import MambaConfig, MambaModel
    mc = (MambaConfig.from_hf_config(hf_config)
          if hf_config is not None else MambaConfig())
    mc.dtype = config.model.jax_dtype
    if config.cache.enable_prefix_caching:
        logger.warning("prefix caching is meaningless for SSM models; "
                       "disabling")
        config.cache.enable_prefix_caching = False
    return MambaModel(mc)


@register_model("JambaForCausalLM")
def _build_jamba(hf_config, config: EngineConfig, linear_method):
    # Jamba hybrid attention/mamba + interleaved MoE (reference
    # models/jamba.py, registry.py:71): per-layer cache kinds exercise
    # the runner's hybrid allocation
    from vllm_pq_tpu.models.jamba import JambaConfig, JambaModel
    mc = (JambaConfig.from_hf_config(hf_config)
          if hf_config is not None else JambaConfig())
    mc.dtype = config.model.jax_dtype
    if config.cache.enable_prefix_caching:
        logger.warning("prefix caching is incompatible with hybrid "
                       "recurrent layers; disabling")
        config.cache.enable_prefix_caching = False
    if config.scheduler.num_scheduler_steps > 1:
        logger.warning("multi-step windows unsupported for hybrid "
                       "models; forcing num_scheduler_steps=1")
        config.scheduler.num_scheduler_steps = 1
    ep = (config.parallel.enable_expert_parallel
          if hasattr(config.parallel, "enable_expert_parallel") else False)
    return JambaModel(mc, linear_method, expert_parallel=ep)


@register_model("JambaForSequenceClassification")
def _build_jamba_classifier(hf_config, config: EngineConfig,
                            linear_method):
    # Jamba + pooled classification head (reference registry.py row ->
    # models/jamba.py as_seqcls; served via LLM.classify)
    from vllm_pq_tpu.models.jamba import JambaConfig, JambaModel
    mc = (JambaConfig.from_hf_config(hf_config)
          if hf_config is not None else JambaConfig())
    mc.num_labels = getattr(hf_config, "num_labels", None) or len(
        getattr(hf_config, "id2label", None) or {0: 0})
    mc.dtype = config.model.jax_dtype
    if config.cache.enable_prefix_caching:
        config.cache.enable_prefix_caching = False
    if config.scheduler.num_scheduler_steps > 1:
        config.scheduler.num_scheduler_steps = 1
    ep = (config.parallel.enable_expert_parallel
          if hasattr(config.parallel, "enable_expert_parallel") else False)
    return JambaModel(mc, linear_method, expert_parallel=ep)


@register_model("BambaForCausalLM")
def _build_bamba(hf_config, config: EngineConfig, linear_method):
    # IBM Bamba: hybrid Mamba-2 / attention (reference models/bamba.py
    # role) — the Jamba hybrid skeleton with SSD mixers and
    # partial-rotary GQA on the sparse attention layers
    from vllm_pq_tpu.models.bamba import BambaConfig, BambaModel
    mc = (BambaConfig.from_hf_config(hf_config)
          if hf_config is not None else BambaConfig())
    mc.dtype = config.model.jax_dtype
    if config.cache.enable_prefix_caching:
        logger.warning("prefix caching is incompatible with hybrid "
                       "recurrent layers; disabling")
        config.cache.enable_prefix_caching = False
    if config.scheduler.num_scheduler_steps > 1:
        logger.warning("multi-step windows unsupported for hybrid "
                       "models; forcing num_scheduler_steps=1")
        config.scheduler.num_scheduler_steps = 1
    return BambaModel(mc, linear_method)


@register_model("Mamba2ForCausalLM")
def _build_mamba2(hf_config, config: EngineConfig, linear_method):
    # Mamba-2 / SSD (reference models/mamba2.py role): scalar-per-head
    # A, grouped B/C, gated RMSNorm
    from vllm_pq_tpu.models.mamba import Mamba2Config, Mamba2Model
    mc = (Mamba2Config.from_hf_config(hf_config)
          if hf_config is not None else Mamba2Config())
    mc.dtype = config.model.jax_dtype
    if config.cache.enable_prefix_caching:
        config.cache.enable_prefix_caching = False
    return Mamba2Model(mc)


@register_model("WhisperForConditionalGeneration")
def _build_whisper(hf_config, config: EngineConfig, linear_method):
    # Whisper enc-dec (reference models/whisper.py): audio encoder run
    # once per request, decoder with paged self-attn + cross-attn
    from vllm_pq_tpu.models.whisper import WhisperConfig, WhisperModel
    mc = (WhisperConfig.from_hf_config(hf_config)
          if hf_config is not None else WhisperConfig())
    mc.dtype = config.model.jax_dtype
    return WhisperModel(mc)


@register_model("DbrxForCausalLM")
def _build_dbrx(hf_config, config: EngineConfig, linear_method):
    # DBRX: 16-expert MoE, bias-free layernorm, fused clipped Wqkv, GQA
    # (reference models/dbrx.py)
    from vllm_pq_tpu.models.mixtral import MixtralConfig, MixtralModel
    attn = getattr(hf_config, "attn_config", {}) or {}
    ffn = getattr(hf_config, "ffn_config", {}) or {}
    if not isinstance(attn, dict):
        attn = attn.__dict__
    if not isinstance(ffn, dict):
        ffn = ffn.__dict__
    h = getattr(hf_config, "d_model", 2048)
    heads = getattr(hf_config, "n_heads", 16)
    mc = MixtralConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=h,
        intermediate_size=ffn.get("ffn_hidden_size", 4 * h),
        num_hidden_layers=getattr(hf_config, "n_layers", 24),
        num_attention_heads=heads,
        num_key_value_heads=attn.get("kv_n_heads", heads),
        rope_theta=attn.get("rope_theta", 10000.0),
        max_position_embeddings=getattr(hf_config, "max_seq_len", 2048),
        num_local_experts=ffn.get("moe_num_experts", 16),
        num_experts_per_tok=ffn.get("moe_top_k", 4),
    )
    mc.norm_type = "layernorm"
    mc.norm_bias = False
    mc.rms_norm_eps = 1e-5
    mc.clip_qkv = attn.get("clip_qkv", None)
    mc.hf_family = "dbrx"
    mc.dtype = config.model.jax_dtype
    ep = config.parallel.enable_expert_parallel
    return MixtralModel(mc, linear_method, expert_parallel=ep)


@register_model("PhiMoEForCausalLM", "PhimoeForCausalLM")
def _build_phimoe(hf_config, config: EngineConfig, linear_method):
    # Phi-3.5-MoE: mixtral structure + biased layernorms, qkv bias and
    # biased lm_head (reference models/phimoe.py)
    from vllm_pq_tpu.models.mixtral import MixtralConfig, MixtralModel
    mc = MixtralConfig.from_hf_config(hf_config)
    mc.norm_type = "layernorm"
    mc.rms_norm_eps = getattr(hf_config, "rms_norm_eps", 1e-5)
    mc.attention_bias = getattr(hf_config, "attention_bias", True)
    mc.o_proj_bias = mc.attention_bias
    mc.lm_head_bias = getattr(hf_config, "lm_head_bias", True)
    mc.dtype = config.model.jax_dtype
    ep = config.parallel.enable_expert_parallel
    model = MixtralModel(mc, linear_method, expert_parallel=ep)
    model.moe.scoring_func = "sparsemixer"
    model.moe.router_jitter = getattr(hf_config, "router_jitter_noise",
                                      0.01)
    return model


@register_model("BertModel", "BertForMaskedLM",
                "BertEmbeddingModel")  # ref registry.py pooling row
def _build_bert(hf_config, config: EngineConfig, linear_method):
    # Encoder-only embedding model (reference models/bert.py
    # BertEmbeddingModel — the /v1/embeddings serving family)
    from vllm_pq_tpu.models.bert import BertConfig, BertModel
    mc = (BertConfig.from_hf_config(hf_config) if hf_config is not None
          else BertConfig())
    mc.dtype = config.model.jax_dtype
    return BertModel(mc)


@register_model("BertForSequenceClassification",
                "RobertaForSequenceClassification",
                "XLMRobertaForSequenceClassification")
def _build_bert_classifier(hf_config, config: EngineConfig,
                           linear_method):
    # Cross-encoder (reference models/bert.py + roberta.py
    # *ForSequenceClassification — the /score and /rerank family)
    from vllm_pq_tpu.models.bert import BertConfig, BertModel
    mc = BertConfig.from_hf_config(hf_config)
    mc.num_labels = getattr(hf_config, "num_labels", None) or len(
        getattr(hf_config, "id2label", None) or {0: 0})
    arch = (getattr(hf_config, "architectures", None) or [""])[0]
    if "Roberta" in arch:
        # HF create_position_ids_from_input_ids: padding_idx + 1
        mc.position_offset = (getattr(hf_config, "pad_token_id", 1)
                              or 1) + 1
    mc.dtype = config.model.jax_dtype
    return BertModel(mc)


@register_model("LlavaNextForConditionalGeneration")
def _build_llava_next(hf_config, config: EngineConfig, linear_method):
    # LLaVA-NeXT anyres (reference models/llava_next.py): LLaVA + base
    # crop, anyres crop grid, unpad + image_newline reassembly
    from types import SimpleNamespace

    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.models.llava_next import LlavaNextModel
    from vllm_pq_tpu.multimodal.clip import CLIPVisionConfig

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None))
    vc = ns(getattr(hf_config, "vision_config", None))
    mc = (LlamaConfig.from_hf_config(tc) if tc is not None
          else LlamaConfig())
    mc.dtype = config.model.jax_dtype
    vcfg = (CLIPVisionConfig.from_hf(vc) if vc is not None
            else CLIPVisionConfig())
    return LlavaNextModel(
        mc, vcfg, linear_method,
        image_token_index=getattr(hf_config, "image_token_index", 32000),
        vision_feature_layer=getattr(hf_config, "vision_feature_layer",
                                     -2),
        vision_feature_select_strategy=getattr(
            hf_config, "vision_feature_select_strategy", "default"),
        projector_act=getattr(hf_config, "projector_hidden_act", "gelu"),
        image_grid_pinpoints=getattr(hf_config, "image_grid_pinpoints",
                                     None))


@register_model("ChatGLMModel", "ChatGLMForCausalLM",
                "ChatGLMForConditionalGeneration")
def _build_chatglm(hf_config, config: EngineConfig, linear_method):
    # ChatGLM2/3 + legacy GLM-4 (reference models/chatglm.py): the same
    # math transformers later shipped as GlmForCausalLM — RMSNorm, MQA,
    # interleaved rope on the first half of each head, swiglu — but
    # with the THUDM config keys and the fused transformer.encoder.*
    # checkpoint naming (handled by hf_family="chatglm" in the loader).
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    h = hf_config

    def g(k, d=None):
        return getattr(h, k, d)

    heads = g("num_attention_heads", 32)
    mc = LlamaConfig(
        vocab_size=g("padded_vocab_size", g("vocab_size", 65024)),
        hidden_size=g("hidden_size", 4096),
        intermediate_size=g("ffn_hidden_size", 13696),
        num_hidden_layers=g("num_layers", 28),
        num_attention_heads=heads,
        num_key_value_heads=(g("multi_query_group_num", 2)
                             if g("multi_query_attention", False)
                             else heads),
        head_dim=g("kv_channels", None),
        rms_norm_eps=g("layernorm_epsilon", 1e-5),
        rope_theta=10000.0 * g("rope_ratio", 1.0),
        max_position_embeddings=g("seq_length", 8192),
        tie_word_embeddings=bool(g("tie_word_embeddings", False)),
        attention_bias=bool(g("add_qkv_bias", True)
                            or g("add_bias_linear", False)),
    )
    mc.o_proj_bias = bool(g("add_bias_linear", False))
    mc.mlp_bias = bool(g("add_bias_linear", False))
    mc.rope_style = "gptj"
    mc.partial_rotary_factor = 0.5
    mc.hf_family = "chatglm"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("RobertaModel", "RobertaEmbeddingModel",
                "XLMRobertaModel",
                # MLM-headed checkpoints served as embedding models:
                # the reference registry maps RobertaForMaskedLM to the
                # same roberta encoder (models/roberta.py) — the MLM
                # head is unused at serving time
                "RobertaForMaskedLM", "XLMRobertaForMaskedLM")
def _build_roberta_embedding(hf_config, config: EngineConfig,
                             linear_method):
    # Encoder-only embedding rows (reference models/roberta.py
    # RobertaEmbeddingModel; registry.py pooling rows). Roberta = BERT
    # with position ids offset by padding_idx + 1
    # (HF create_position_ids_from_input_ids).
    from vllm_pq_tpu.models.bert import BertConfig, BertModel
    mc = (BertConfig.from_hf_config(hf_config) if hf_config is not None
          else BertConfig())
    mc.position_offset = (getattr(hf_config, "pad_token_id", 1) or 1) + 1
    mc.dtype = config.model.jax_dtype
    return BertModel(mc)


@register_model("InternLM2ForRewardModel")
def _build_internlm2_rm(hf_config, config: EngineConfig, linear_method):
    # InternLM2 + scalar v_head (reference models/internlm2_reward.py:
    # pooled 1-label linear head over the final hidden state)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.attention_bias = getattr(hf_config, "bias", False)
    mc.hf_family = "internlm2"
    mc.num_labels = 1
    mc.tie_word_embeddings = True  # no lm_head in RM checkpoints
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


_SPEC_DRAFT_ARCHS = {
    "MedusaModel": "medusa",
    "EAGLEModel": "eagle",
    "MLPSpeculatorPreTrainedModel": "mlp_speculator",
    "DeepSeekMTPModel": "mtp",
}


@register_model(*_SPEC_DRAFT_ARCHS)
def _build_spec_draft(hf_config, config: EngineConfig, linear_method):
    # Speculative draft architectures (reference registry.py
    # _SPECULATIVE_DECODING_MODELS: medusa.py, eagle.py,
    # mlp_speculator.py, deepseek_mtp.py). These checkpoints condition
    # on a TARGET model's hidden states and are loaded by the spec
    # proposers (spec_decode/{medusa,eagle,mlp_speculator}.py), not as
    # standalone targets.
    arch = (getattr(hf_config, "architectures", None) or ["?"])[0]
    raise ValueError(
        f"{arch} is a speculative draft architecture; pass it via "
        "--speculative-config (method="
        f"'{_SPEC_DRAFT_ARCHS.get(arch, 'draft')}', model=<path>) so it "
        "runs as a proposer conditioned on the target model")


def _num_labels(hf_config, default=2):
    nl = getattr(hf_config, "num_labels", None)
    if nl:
        return nl
    id2label = getattr(hf_config, "id2label", None)
    return len(id2label) if id2label else default


@register_model("Qwen2ForSequenceClassification",
                "LlamaForSequenceClassification",
                "MistralForSequenceClassification",
                "GemmaForSequenceClassification")
def _build_decoder_seqcls(hf_config, config: EngineConfig, linear_method):
    # Decoder LM + last-token-pooled linear score head (role of
    # reference as_seqcls_model, registry.py:142 Qwen2ForSequence-
    # Classification -> qwen2 + score)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    arch = (getattr(hf_config, "architectures", None) or [""])[0]
    if arch.startswith("Qwen2"):
        mc.attention_bias = True
    mc.num_labels = _num_labels(hf_config)
    # classification checkpoints carry no lm_head; reuse the embedding
    mc.tie_word_embeddings = True
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("Qwen2ForRewardModel")
def _build_qwen2_rm(hf_config, config: EngineConfig, linear_method):
    # Qwen2 + Linear->ReLU->Linear reward head, 1 label (reference
    # models/qwen2_rm.py:105)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.attention_bias = True
    mc.num_labels = _num_labels(hf_config, default=1)
    mc.score_style = "mlp"
    mc.tie_word_embeddings = True
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("Qwen2ForProcessRewardModel")
def _build_qwen2_prm(hf_config, config: EngineConfig, linear_method):
    # Process RM: 2-label MLP head (reference models/qwen2_rm.py:118)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    mc.attention_bias = True
    mc.num_labels = _num_labels(hf_config, default=2)
    mc.score_style = "mlp"
    mc.tie_word_embeddings = True
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("Qwen2MoeForCausalLM")
def _build_qwen2_moe(hf_config, config: EngineConfig, linear_method):
    from vllm_pq_tpu.models.qwen2_moe import Qwen2MoeConfig, Qwen2MoeModel
    mc = (Qwen2MoeConfig.from_hf_config(hf_config)
          if hf_config is not None else Qwen2MoeConfig())
    mc.attention_bias = True  # qkv bias, like dense Qwen2
    mc.dtype = config.model.jax_dtype
    ep = config.parallel.enable_expert_parallel
    return Qwen2MoeModel(mc, linear_method, expert_parallel=ep)


@register_model("GLM4VForCausalLM")
def _build_glm4v(hf_config, config: EngineConfig, linear_method):
    # GLM-4V (reference models/glm4v.py): EVA2-CLIP tower + 2x2 conv
    # downsample + GLU projector + boi/eoi tokens on the ChatGLM decoder
    from vllm_pq_tpu.models.glm4v import GLM4VModel
    from vllm_pq_tpu.models.llama import LlamaConfig
    h = hf_config

    def g(k, d=None):
        return getattr(h, k, d)
    heads = g("num_attention_heads", 32)
    mc = LlamaConfig(
        vocab_size=g("padded_vocab_size", g("vocab_size", 151552)),
        hidden_size=g("hidden_size", 4096),
        intermediate_size=g("ffn_hidden_size", 13696),
        num_hidden_layers=g("num_layers", 40),
        num_attention_heads=heads,
        num_key_value_heads=(g("multi_query_group_num", 2)
                             if g("multi_query_attention", False)
                             else heads),
        head_dim=g("kv_channels", None),
        rms_norm_eps=g("layernorm_epsilon", 1e-5),
        rope_theta=10000.0 * g("rope_ratio", 1.0),
        max_position_embeddings=g("seq_length", 8192),
        tie_word_embeddings=bool(g("tie_word_embeddings", False)),
        attention_bias=bool(g("add_qkv_bias", True)
                            or g("add_bias_linear", False)),
    )
    mc.o_proj_bias = bool(g("add_bias_linear", False))
    mc.mlp_bias = bool(g("add_bias_linear", False))
    mc.partial_rotary_factor = 0.5  # chatglm half-rope
    mc.rope_style = "gptj"
    mc.hf_family = "chatglm"
    mc.dtype = config.model.jax_dtype
    vc = g("vision_config") or {}
    vcfg = {"hidden_size": vc.get("hidden_size", 1792),
            "intermediate_size": vc.get("intermediate_size", 15360),
            "num_hidden_layers": vc.get("num_hidden_layers", 63),
            "num_attention_heads": vc.get("num_heads", 16),
            "image_size": vc.get("image_size", 1120),
            "patch_size": vc.get("patch_size", 14),
            "in_channels": vc.get("in_channels", 3),
            "hidden_act": vc.get("hidden_act", "gelu")}
    return GLM4VModel(
        mc, vcfg, linear_method,
        image_token_index=g("boi_token_id", 151339),
        scaling_factor=vc.get("scaling_factor", 8.0))


@register_model("DeepseekVLV2ForCausalLM")
def _build_deepseek_vl2(hf_config, config: EngineConfig, linear_method):
    # DeepSeek-VL2 (reference models/deepseek_vl2.py): timm-SigLIP
    # tower + downsample_mlp_gelu projector + newline/separator tokens
    # on the DeepSeek-V2 MLA decoder
    from types import SimpleNamespace

    from vllm_pq_tpu.models.deepseek import DeepseekConfig
    from vllm_pq_tpu.models.deepseek_vl2 import DeepseekVL2Model
    from vllm_pq_tpu.multimodal.siglip import SiglipVisionConfig

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    lc = ns(getattr(hf_config, "language_config", None)
            or getattr(hf_config, "text_config", None))
    vc = ns(getattr(hf_config, "vision_config", None))
    pc = ns(getattr(hf_config, "projector_config", None))
    dc = (DeepseekConfig.from_hf_config(lc) if lc is not None
          else DeepseekConfig())
    dc.dtype = config.model.jax_dtype
    import vllm_pq_tpu.envs as envs
    dc.mla_latent = not envs.VPQ_MLA_DISABLE
    vcfg = SiglipVisionConfig(
        hidden_size=getattr(vc, "width", None)
        or getattr(vc, "hidden_size", 1152),
        intermediate_size=getattr(vc, "intermediate_size", None)
        or 4 * (getattr(vc, "width", None) or 1152),
        num_hidden_layers=getattr(vc, "layers", None)
        or getattr(vc, "num_hidden_layers", 27),
        num_attention_heads=getattr(vc, "heads", None)
        or getattr(vc, "num_attention_heads", 16),
        image_size=getattr(vc, "image_size", 384),
        patch_size=getattr(vc, "patch_size", 14)) \
        if vc is not None else SiglipVisionConfig()
    return DeepseekVL2Model(
        dc, vcfg,
        image_token_index=getattr(hf_config, "image_token_id", 100015),
        downsample_ratio=getattr(pc, "downsample_ratio", 2)
        if pc is not None else 2,
        projector_depth=getattr(pc, "depth", 2) if pc is not None else 2,
        mlp_ratio=getattr(pc, "mlp_ratio", 1) if pc is not None else 1,
        global_view_pos=getattr(hf_config, "global_view_pos", "head"))


@register_model("DeciLMForCausalLM")
def _build_decilm(hf_config, config: EngineConfig, linear_method):
    # DeciLM variable GQA (reference models/decilm.py): normalized to
    # uniform max-kv-head GQA at load exactly like the reference
    # (repeat_interleaved k/v head blocks)
    from vllm_pq_tpu.models.llama import LlamaConfig, LlamaModel
    mc = LlamaConfig.from_hf_config(hf_config)
    per_layer = getattr(hf_config, "num_key_value_heads_per_layer", None)
    if per_layer:
        mc.num_key_value_heads = max(per_layer)
    mc.hf_family = "decilm"
    mc.dtype = config.model.jax_dtype
    return LlamaModel(mc, linear_method)


@register_model("MiniCPMV", "MiniCPMO")
def _build_minicpmv(hf_config, config: EngineConfig, linear_method):
    # MiniCPM-V (reference models/minicpmv.py): SigLIP tower +
    # Resampler2_5 perceiver + version-dependent LM (2.0 MiniCPM
    # scalings / 2.5 Llama-3 / >=2.6 Qwen2). MiniCPM-O shares the image
    # path (reference minicpmo.py).
    import math
    from types import SimpleNamespace

    from vllm_pq_tpu.models.llama import LlamaConfig
    from vllm_pq_tpu.models.minicpmv import MiniCPMVModel
    from vllm_pq_tpu.multimodal.siglip import SiglipVisionConfig

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    hf = hf_config
    mc = LlamaConfig.from_hf_config(hf)
    ver = getattr(hf, "version", 2.6)
    if isinstance(ver, (list, tuple)):
        ver = float(f"{ver[0]}.{ver[1]}")
    ver = float(ver)
    if ver >= 2.6:
        mc.attention_bias = True  # qwen2 text stack
    elif ver < 2.5:
        # MiniCPM muP scalings (registry _build_minicpm)
        mc.embed_scale = getattr(hf, "scale_emb", 1.0) or None
        sd = getattr(hf, "scale_depth", 1.0)
        mc.residual_multiplier = sd / math.sqrt(mc.num_hidden_layers)
        dmb = getattr(hf, "dim_model_base", None)
        if dmb:
            mc.logit_scale = dmb / mc.hidden_size
    mc.dtype = config.model.jax_dtype
    vc = ns(getattr(hf, "vision_config", None))
    vcfg = (SiglipVisionConfig.from_hf(vc) if vc is not None
            else SiglipVisionConfig())
    return MiniCPMVModel(
        mc, vcfg, linear_method,
        image_token_index=getattr(hf, "image_token_id", None)
        or getattr(hf, "unk_token_id", 128244),
        query_num=getattr(hf, "query_num", 64))


@register_model("AriaForConditionalGeneration")
def _build_aria(hf_config, config: EngineConfig, linear_method):
    # Aria (reference models/aria.py): idefics3 tower + learned-query
    # cross-attn projector + grouped-expert MoE llama decoder
    from types import SimpleNamespace

    from vllm_pq_tpu.models.aria import AriaModel
    from vllm_pq_tpu.models.qwen2_moe import Qwen2MoeConfig
    from vllm_pq_tpu.multimodal.siglip import SiglipVisionConfig

    def ns(v):
        return SimpleNamespace(**v) if isinstance(v, dict) else v
    tc = ns(getattr(hf_config, "text_config", None))
    vc = ns(getattr(hf_config, "vision_config", None))
    mc = Qwen2MoeConfig.from_hf_config(tc)
    mc.num_experts = getattr(tc, "moe_num_experts", 8)
    mc.num_experts_per_tok = getattr(tc, "moe_topk", 2)
    mc.moe_intermediate_size = tc.intermediate_size
    mc.shared_expert_intermediate_size = tc.intermediate_size * getattr(
        tc, "moe_num_shared_experts", 2)
    mc.shared_expert_gate = False
    mc.norm_topk_prob = True  # topk-then-softmax == renormalized
    mc.decoder_sparse_step = 1
    mc.mlp_only_layers = []
    mc.hf_family = "aria"
    mc.dtype = config.model.jax_dtype
    vcfg = (SiglipVisionConfig.from_hf(vc) if vc is not None
            else SiglipVisionConfig())
    p2q = {int(k): int(v) for k, v in (getattr(
        hf_config, "projector_patch_to_query_dict", None)
        or {1225: 128, 4900: 256}).items()}
    return AriaModel(
        mc, vcfg, linear_method,
        image_token_index=getattr(hf_config, "image_token_index", 9),
        patch_to_query=p2q,
        max_query=getattr(hf_config,
                          "max_value_projector_patch_to_query_dict",
                          None) or max(p2q.values()))


@register_model("ArcticForCausalLM")
def _build_arctic(hf_config, config: EngineConfig, linear_method):
    # Snowflake Arctic (reference models/arctic.py): dense-MoE hybrid —
    # MoE layers add a parallel dense residual_mlp branch over the
    # post-attention state while the MoE routes the pre-attention input
    from vllm_pq_tpu.models.arctic import ArcticConfig, ArcticModel
    hf = hf_config
    mc = ArcticConfig.from_hf_config(hf)
    mc.num_local_experts = getattr(hf, "num_local_experts", 128)
    mc.num_experts_per_tok = getattr(hf, "num_experts_per_tok", 2)
    mc.hf_family = "arctic"
    mc.dtype = config.model.jax_dtype
    ep = config.parallel.enable_expert_parallel
    return ArcticModel(
        mc, linear_method,
        moe_layer_frequency=getattr(hf, "moe_layer_frequency", 2),
        use_residual=getattr(hf, "use_residual", True),
        expert_parallel=ep)


@register_model("MiniCPM3ForCausalLM")
def _build_minicpm3(hf_config, config: EngineConfig, linear_method):
    # MiniCPM3 (reference models/minicpm3.py): DeepSeek-V2-style MLA
    # attention (q/kv LoRA projections, nope|rope head split) with
    # all-dense MLPs and the MiniCPM muP scalings
    import math

    from vllm_pq_tpu.models.deepseek import DeepseekConfig, DeepseekV2Model
    hf = hf_config
    dc = DeepseekConfig(
        vocab_size=hf.vocab_size,
        hidden_size=hf.hidden_size,
        intermediate_size=hf.intermediate_size,
        num_hidden_layers=hf.num_hidden_layers,
        num_attention_heads=hf.num_attention_heads,
        q_lora_rank=getattr(hf, "q_lora_rank", None),
        kv_lora_rank=getattr(hf, "kv_lora_rank", 256),
        qk_nope_head_dim=getattr(hf, "qk_nope_head_dim", 64),
        qk_rope_head_dim=getattr(hf, "qk_rope_head_dim", 32),
        v_head_dim=getattr(hf, "v_head_dim", None)
        or hf.hidden_size // hf.num_attention_heads,
        n_routed_experts=0, n_shared_experts=0,
        first_k_dense_replace=hf.num_hidden_layers,  # all layers dense
        rms_norm_eps=getattr(hf, "rms_norm_eps", 1e-5),
        rope_theta=getattr(hf, "rope_theta", 10000.0),
        rope_scaling=getattr(hf, "rope_scaling", None),
        max_position_embeddings=getattr(hf, "max_position_embeddings",
                                        32768),
        tie_word_embeddings=getattr(hf, "tie_word_embeddings", False),
    )
    dc.embed_scale = getattr(hf, "scale_emb", 1.0) or None
    sd = getattr(hf, "scale_depth", 1.0)
    dc.residual_multiplier = sd / math.sqrt(dc.num_hidden_layers)
    dmb = getattr(hf, "dim_model_base", None)
    if dmb:
        dc.logit_scale = dmb / dc.hidden_size
    dc.dtype = config.model.jax_dtype
    import vllm_pq_tpu.envs as envs
    dc.mla_latent = not envs.VPQ_MLA_DISABLE
    return DeepseekV2Model(dc)


@register_model("Grok1ModelForCausalLM")
def _build_grok1(hf_config, config: EngineConfig, linear_method):
    # xAI Grok-1 (reference models/grok1.py): Mixtral-style MoE with
    # gelu experts, 30*tanh(x/30) router and attention logit caps,
    # Gemma2-style pre/post norms on both branches, and muP-style
    # embedding/attention-output/logit multipliers
    from vllm_pq_tpu.models.mixtral import MixtralConfig, MixtralModel
    hf = hf_config
    mc = MixtralConfig.from_hf_config(hf)
    mc.num_local_experts = getattr(hf, "num_experts",
                                   getattr(hf, "num_local_experts", 8))
    mc.num_experts_per_tok = getattr(hf, "num_experts_per_tok", 2)
    mc.moe_act = "gelu"
    mc.router_logit_cap = 30.0
    mc.attn_logit_softcap = max(
        getattr(hf, "attn_logit_softcapping", None) or 30.0, 0.0)
    mc.use_post_norms = True
    mc.embed_scale = getattr(hf, "embedding_multiplier_scale", 78.38)
    mc.attn_output_multiplier = getattr(hf, "attn_output_multiplier",
                                        0.08838834764831845)
    mc.logit_scale = getattr(hf, "output_multiplier_scale",
                             0.5773502691896257)
    mc.tie_word_embeddings = getattr(hf, "tie_word_embeddings", True)
    mc.hf_family = "grok1"
    mc.dtype = config.model.jax_dtype
    ep = config.parallel.enable_expert_parallel
    return MixtralModel(mc, linear_method, expert_parallel=ep)


@register_model("DeepseekForCausalLM")
def _build_deepseek_v1(hf_config, config: EngineConfig, linear_method):
    # DeepSeek v1 MoE (reference models/deepseek.py, pre-MLA): standard
    # GQA attention + softmax top-k routing, first_k_dense_replace
    # dense layers, n_shared_experts added UNGATED — the qwen2-moe grid
    # with deepseek field names (mlp.shared_experts.* plural handled by
    # the loader)
    from vllm_pq_tpu.models.qwen2_moe import Qwen2MoeConfig, Qwen2MoeModel
    hf = hf_config
    mc = Qwen2MoeConfig.from_hf_config(hf)
    mc.num_experts = getattr(hf, "n_routed_experts", 64)
    mc.num_experts_per_tok = getattr(hf, "num_experts_per_tok", 6)
    mc.moe_intermediate_size = getattr(hf, "moe_intermediate_size", 1408)
    n_shared = getattr(hf, "n_shared_experts", None) or 0
    mc.shared_expert_intermediate_size = \
        n_shared * mc.moe_intermediate_size
    mc.shared_expert_gate = False  # added ungated (deepseek.py:132)
    first_dense = getattr(hf, "first_k_dense_replace", 0)
    freq = getattr(hf, "moe_layer_freq", 1)
    # deepseek rule: MoE when li >= first_k_dense_replace and
    # li % moe_layer_freq == 0 — encode it via mlp_only_layers
    mc.decoder_sparse_step = 1
    mc.mlp_only_layers = [li for li in range(mc.num_hidden_layers)
                          if li < first_dense or li % freq != 0]
    mc.norm_topk_prob = getattr(hf, "norm_topk_prob", False)
    mc.attention_bias = getattr(hf, "attention_bias", False)
    mc.dtype = config.model.jax_dtype
    ep = config.parallel.enable_expert_parallel
    return Qwen2MoeModel(mc, linear_method, expert_parallel=ep)


@register_model("Qwen3MoeForCausalLM")
def _build_qwen3_moe(hf_config, config: EngineConfig, linear_method):
    # Qwen3-MoE: qwen2-moe grid minus the shared expert, plus Qwen3's
    # per-head q/k RMS norms, no qkv bias (reference models/qwen3_moe.py)
    from vllm_pq_tpu.models.qwen2_moe import Qwen2MoeConfig, Qwen2MoeModel
    mc = Qwen2MoeConfig.from_hf_config(hf_config)
    mc.shared_expert_intermediate_size = 0
    mc.qk_norm = "head"
    mc.attention_bias = False
    mc.norm_topk_prob = getattr(hf_config, "norm_topk_prob", True)
    mc.dtype = config.model.jax_dtype
    ep = config.parallel.enable_expert_parallel
    return Qwen2MoeModel(mc, linear_method, expert_parallel=ep)


@register_model("OlmoeForCausalLM")
def _build_olmoe(hf_config, config: EngineConfig, linear_method):
    # OLMoE: llama attention + FULL-width q/k RMS norms (q over
    # hidden_size, k over kvh*d — HF modeling_olmoe), MoE every layer,
    # softmax-then-topk routing, no shared expert (reference
    # models/olmoe.py)
    from vllm_pq_tpu.models.qwen2_moe import Qwen2MoeConfig, Qwen2MoeModel
    mc = Qwen2MoeConfig.from_hf_config(hf_config)
    mc.num_experts = getattr(hf_config, "num_experts", 64)
    mc.num_experts_per_tok = getattr(hf_config, "num_experts_per_tok", 8)
    mc.moe_intermediate_size = getattr(hf_config, "intermediate_size",
                                       1024)
    mc.shared_expert_intermediate_size = 0
    mc.norm_topk_prob = getattr(hf_config, "norm_topk_prob", False)
    mc.qk_norm = "full"
    mc.attention_bias = False
    mc.dtype = config.model.jax_dtype
    ep = config.parallel.enable_expert_parallel
    return Qwen2MoeModel(mc, linear_method, expert_parallel=ep)


@register_model("GraniteMoeForCausalLM", "GraniteMoeSharedForCausalLM")
def _build_granite_moe(hf_config, config: EngineConfig, linear_method):
    # IBM GraniteMoe: granite mu-param multipliers + MoE with fused
    # input_linear/output_linear expert stacks; the Shared variant adds
    # an UNGATED always-on shared SwiGLU (reference
    # models/granitemoe.py, granitemoeshared.py)
    from vllm_pq_tpu.models.qwen2_moe import Qwen2MoeConfig, Qwen2MoeModel
    mc = Qwen2MoeConfig.from_hf_config(hf_config)
    mc.num_experts = getattr(hf_config, "num_local_experts", 8)
    mc.num_experts_per_tok = getattr(hf_config, "num_experts_per_tok", 2)
    mc.moe_intermediate_size = getattr(hf_config, "intermediate_size",
                                       mc.intermediate_size)
    mc.shared_expert_intermediate_size = getattr(
        hf_config, "shared_intermediate_size", 0) or 0
    mc.shared_expert_gate = False
    # HF GraniteMoeTopKGating softmaxes the top-k logits == our
    # softmax-then-topk with renormalization
    mc.norm_topk_prob = True
    mc.embed_scale = getattr(hf_config, "embedding_multiplier", 1.0)
    if mc.embed_scale == 1.0:
        mc.embed_scale = None
    mc.residual_multiplier = getattr(hf_config, "residual_multiplier",
                                     1.0)
    mc.attention_multiplier = getattr(hf_config, "attention_multiplier",
                                      None)
    ls = getattr(hf_config, "logits_scaling", 1.0)
    mc.logit_scale = (1.0 / ls) if ls and ls != 1.0 else None
    mc.hf_family = "granitemoe"
    mc.dtype = config.model.jax_dtype
    ep = config.parallel.enable_expert_parallel
    return Qwen2MoeModel(mc, linear_method, expert_parallel=ep)


@register_model("DeepseekV2ForCausalLM", "DeepseekV3ForCausalLM")
def _build_deepseek(hf_config, config: EngineConfig, linear_method):
    from vllm_pq_tpu.models.deepseek import (DeepseekConfig,
                                             DeepseekV2Model)
    if hf_config is not None:
        dc = DeepseekConfig.from_hf_config(hf_config)
    else:
        dc = DeepseekConfig()
    dc.dtype = config.model.jax_dtype
    import vllm_pq_tpu.envs as envs
    dc.mla_latent = not envs.VPQ_MLA_DISABLE
    if config.model.quantization:
        logger.warning("quantized DeepSeek linears are follow-up work; "
                       "running MLA projections unquantized")
    return DeepseekV2Model(dc)


def resolve_architecture(hf) -> str:
    """HF ``architectures[0]``, robust to newer transformers layouts.

    Recent transformers versions (>=4.52) save composite-model configs
    with ``architectures`` nested under ``text_config`` and ``null`` at
    the top level — falling through to the llama default silently built
    the WRONG model (round-4 Qwen2.5-VL breakage). Resolution order:
    top-level ``architectures`` -> ``text_config.architectures`` ->
    ``model_type`` mapping -> llama default.
    """
    _MODEL_TYPE_ARCH = {
        "qwen2_vl": "Qwen2VLForConditionalGeneration",
        "qwen2_5_vl": "Qwen2_5_VLForConditionalGeneration",
        "llava": "LlavaForConditionalGeneration",
        "llava_next": "LlavaNextForConditionalGeneration",
        "bert": "BertModel",
        "mllama": "MllamaForConditionalGeneration",
        "paligemma": "PaliGemmaForConditionalGeneration",
        "whisper": "WhisperForConditionalGeneration",
        "idefics3": "Idefics3ForConditionalGeneration",
        "fuyu": "FuyuForCausalLM",
        "blip-2": "Blip2ForConditionalGeneration",
        "qwen2_audio": "Qwen2AudioForConditionalGeneration",
        "chatglm": "ChatGLMModel",
        "internvl_chat": "InternVLChatModel",
    }
    archs = getattr(hf, "architectures", None)
    if not archs:
        tc = getattr(hf, "text_config", None)
        if isinstance(tc, dict):
            archs = tc.get("architectures")
        elif tc is not None:
            archs = getattr(tc, "architectures", None)
    if not archs:
        archs = [_MODEL_TYPE_ARCH.get(getattr(hf, "model_type", ""),
                                      "LlamaForCausalLM")]
    return archs[0]


def build_model(config: EngineConfig, linear_method) -> Tuple:
    """Returns (model, linear_method). Quantization overrides declared in
    the checkpoint's quantization_config take precedence."""
    hf = _load_hf_config(config.model.model, config)
    arch = "LlamaForCausalLM"
    if hf is not None:
        arch = resolve_architecture(hf)
        qcfg = getattr(hf, "quantization_config", None)
        if qcfg and qcfg.get("quant_method") == "aqlm":
            from vllm_pq_tpu.quantization import get_linear_method
            linear_method = get_linear_method("pq", {
                "in_group_size": qcfg.get("in_group_size", 8),
                "nbits_per_codebook": qcfg.get("nbits_per_codebook", 16),
                "num_codebooks": qcfg.get("num_codebooks", 1),
            })
    builder = _REGISTRY.get(arch)
    if builder is None:
        import vllm_pq_tpu.envs as envs
        if envs.VPQ_TRANSFORMERS_FALLBACK and hf is not None \
                and hasattr(hf, "num_hidden_layers"):
            # reference models/transformers.py TransformersModel role:
            # a catch-all that runs any unknown decoder via standard
            # transformer semantics. Here: the generic llama-
            # architecture builder, driven entirely by config fields
            # (covers near-llama archs; weight names must follow the
            # standard HF decoder layout).
            logger.warning(
                "architecture %r is not registered; falling back to "
                "the generic llama-architecture builder "
                "(TransformersModel role). Set "
                "VPQ_TRANSFORMERS_FALLBACK=0 to make this an error.",
                arch)
            builder = _REGISTRY["TransformersModel"]
        else:
            raise ValueError(
                f"Unsupported architecture {arch!r}; supported: "
                f"{sorted(_REGISTRY)}")
    model = builder(hf, config, linear_method)
    if hf is not None and getattr(hf, "_mistral_format", False):
        # consolidated.safetensors carries Mistral-native weight names
        model.cfg.hf_family = "mistral_native"
    return model, linear_method


def list_supported_archs():
    return sorted(_REGISTRY)
