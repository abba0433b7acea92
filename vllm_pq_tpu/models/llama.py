"""Llama-family decoder (functional JAX).

Covers LlamaForCausalLM and close relatives (TinyLlama, Llama-2/3,
Mistral incl. sliding window, Qwen2 via attention bias) — role of the
reference's ``model_executor/models/llama.py`` + parallel layers
(``layers/linear.py``), redesigned as pure functions over a param pytree
executed per-shard under ``shard_map``:

- q/k/v/o and gate/up/down projections are each a LinearMethod apply
  (PQ / int8 / bf16) with column- or row-parallel partition specs;
- row-parallel outputs are psum-ed over the "model" mesh axis;
- the KV cache is a per-layer paged tensor sharded on the kv-head axis;
- embeddings are vocab-parallel; lm_head logits are all-gathered.
"""

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.activation import silu_and_mul
from vllm_pq_tpu.layers.norm import rms_norm
from vllm_pq_tpu.layers.rotary import apply_rope, build_rope_cache
from vllm_pq_tpu.ops.attention import ragged_paged_attention, write_kv_cache
from vllm_pq_tpu.quantization.methods import LinearMethod, TP_AXIS


@dataclass
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    sliding_window: Optional[int] = None
    dtype: Any = jnp.bfloat16
    # family knobs (Gemma/Gemma2 variants of the decoder; reference
    # models/gemma.py, gemma2.py)
    hidden_act: str = "silu"
    embed_scale: Optional[float] = None       # Gemma: sqrt(hidden_size)
    gemma_norm: bool = False                  # RMSNorm scales by (1 + w)
    use_post_norms: bool = False              # Gemma2 post-attn/ffw norms
    final_logit_softcap: Optional[float] = None
    attn_logit_softcap: Optional[float] = None
    query_pre_attn_scalar: Optional[float] = None
    # Gemma3: local (sliding) layers use their own rope base frequency,
    # and rope_scaling applies only to the global table
    rope_local_theta: Optional[float] = None
    # explicit per-layer window flags (True = sliding); overrides the
    # pattern below when set (Gemma3 layer_types)
    sliding_window_layers: Optional[tuple] = None
    # Gemma2: sliding window on every 2nd layer (pattern=2); None = all
    # layers follow `sliding_window` uniformly
    sliding_window_pattern: Optional[int] = None
    # generalized-decoder knobs (GPT-NeoX / Phi / StableLM / Starcoder2
    # variants of the block; reference models/{gpt_neox,phi,stablelm,
    # starcoder2}.py):
    norm_type: str = "rmsnorm"        # "layernorm" adds a bias leaf
    partial_rotary_factor: float = 1.0  # rope on first d*factor dims
    parallel_residual: bool = False   # x + attn(ln1 x) + mlp(ln2 x)
    shared_input_norm: bool = False   # Phi: mlp reads ln1(x); no ln2
    mlp_style: str = "swiglu"         # "mlp" = up_proj -> act -> down
    mlp_bias: bool = False            # biases on the mlp linears
    o_proj_bias: bool = False         # bias on o_proj (after TP psum)
    lm_head_bias: bool = False        # Phi-style biased lm_head
    # round-2 breadth knobs (reference models/{qwen3,olmo,olmo2,cohere,
    # granite,bloom,mpt,baichuan,gpt_j}.py):
    qk_norm: Optional[str] = None     # "head" (Qwen3, RMS) | "full"
    #                                   (OLMo2) | "head_ln" (Cohere
    #                                   per-head bias-free layernorm)
    block_style: str = "pre"          # "olmo2": norm AFTER each branch,
    #                                   no input norms
    hf_family: str = "llama"          # loader name-mapping family
    alibi: bool = False               # ALiBi biases instead of rope
    rope_style: str = "neox"          # "gptj" = interleaved lane pairs
    clip_qkv: Optional[float] = None  # OLMo/MPT/DBRX qkv clamp
    norm_bias: bool = True            # layernorm bias (Cohere/MPT: no)
    norm_plus_one: bool = False       # Nemotron layernorm1p: w+1
    rope_layers: Optional[tuple] = None  # SmolLM3 NoPE: 0 = no rope
    norm_affine: bool = True          # OLMo-1: non-parametric layernorm
    embed_norm: bool = False          # Bloom word_embeddings_layernorm
    # extra learned embedding rows beyond vocab_size (Molmo's 128
    # ADDITIONAL_VOCAB_SIZE image-special tokens): inputs may carry ids
    # in [vocab, vocab+extra); logits stay at vocab_size
    embed_extra_rows: int = 0
    # Phi-3-Small gegelu: up_proj emits 2*ffn INTERLEAVED lanes,
    # act = quick_gelu(clamp(a)) * (clamp(b) + 1)
    gegelu_limit: Optional[float] = None
    # Phi-3-Small blocksparse attention (reference
    # attention/ops/blocksparse_attention): (block_size, local_blocks,
    # vert_stride, head_step); dense layers every
    # blocksparse_dense_every_n
    blocksparse: Optional[tuple] = None
    blocksparse_dense_every_n: Optional[int] = None
    residual_multiplier: float = 1.0  # Granite
    attention_multiplier: Optional[float] = None  # Granite sm_scale
    logit_scale: Optional[float] = None  # Cohere x, Granite 1/scaling
    attn_output_multiplier: Optional[float] = None  # Grok1: scale o_proj out
    # sequence-classification / reward heads on a decoder LM (role of
    # reference as_seqcls_model + models/qwen2_rm.py:63 score stack)
    num_labels: int = 0               # >0: pooled classification head
    score_style: str = "linear"       # "mlp": Linear->ReLU->Linear (RM)
    # Solar depth-up-scaled skip connections (reference models/solar.py
    # bskcn_1/2 stash the pre-layer state, bskcn_3/4 blend it back with
    # the inference tv weight)
    bskcn_1: Optional[tuple] = None
    bskcn_2: Optional[tuple] = None
    bskcn_3: Optional[tuple] = None
    bskcn_4: Optional[tuple] = None
    bskcn_tv: float = 0.0             # inference blend (bskcn_tv[1])

    def __post_init__(self):
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf_config(cls, hf) -> "LlamaConfig":
        return cls(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            intermediate_size=hf.intermediate_size,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            num_key_value_heads=getattr(hf, "num_key_value_heads",
                                        hf.num_attention_heads),
            head_dim=getattr(hf, "head_dim", None),
            rms_norm_eps=getattr(hf, "rms_norm_eps", 1e-5),
            rope_theta=getattr(hf, "rope_theta", 10000.0),
            rope_scaling=getattr(hf, "rope_scaling", None),
            max_position_embeddings=getattr(hf, "max_position_embeddings",
                                            4096),
            tie_word_embeddings=getattr(hf, "tie_word_embeddings", False),
            attention_bias=getattr(hf, "attention_bias", False),
            sliding_window=getattr(hf, "sliding_window", None),
            hidden_act=getattr(hf, "hidden_act", "silu") or "silu",
        )


def alibi_slopes(n_heads: int) -> np.ndarray:
    """ALiBi head slopes (reference utils get_alibi_slopes / the ALiBi
    paper's geometric construction)."""
    import math
    cp = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-8.0 / cp)
    slopes = [base ** (i + 1) for i in range(cp)]
    if cp != n_heads:
        extra_base = 2.0 ** (-4.0 / cp)
        extra = [extra_base ** (i + 1)
                 for i in range(2 * (n_heads - cp))][0::2]
        slopes += extra
    return np.asarray(slopes, np.float32)


def _full_rms(x: jax.Array, weight: jax.Array, eps: float,
              tp_axis) -> jax.Array:
    """RMSNorm over a TP-sharded full vector: the mean square reduces
    across shards."""
    x32 = x.astype(jnp.float32)
    ss = jnp.sum(x32 * x32, axis=-1, keepdims=True)
    n = x.shape[-1]
    if tp_axis:
        ss = jax.lax.psum(ss, tp_axis)
        n = n * jax.lax.psum(1, tp_axis)
    x32 = x32 * jax.lax.rsqrt(ss / n + eps)
    return (x32 * weight.astype(jnp.float32)).astype(x.dtype)


# The linear sublayers of one decoder block: (name, in_dim_fn, out_dim_fn,
# shard kind). Quantizable.
def _linear_defs(cfg: LlamaConfig):
    d = cfg.head_dim
    defs = [
        ("q_proj", cfg.hidden_size, cfg.num_attention_heads * d, "column"),
        ("k_proj", cfg.hidden_size, cfg.num_key_value_heads * d, "column"),
        ("v_proj", cfg.hidden_size, cfg.num_key_value_heads * d, "column"),
        ("o_proj", cfg.num_attention_heads * d, cfg.hidden_size, "row"),
    ]
    if cfg.mlp_style == "swiglu":
        defs.append(("gate_proj", cfg.hidden_size, cfg.intermediate_size,
                     "column"))
    # gegelu (Phi-3-Small): up emits both interleaved halves
    up_out = (2 * cfg.intermediate_size if cfg.hidden_act == "gegelu"
              else cfg.intermediate_size)
    defs += [
        ("up_proj", cfg.hidden_size, up_out, "column"),
        ("down_proj", cfg.intermediate_size, cfg.hidden_size, "row"),
    ]
    return defs


class LlamaModel:
    """Stateless model definition: param templates, specs, forward."""

    # layers whose input_layernorm is bypassed (EAGLE draft layer 0,
    # models/eagle_draft.py; reference eagle.py DummyInputLayerNorm)
    identity_input_norm_layers: frozenset = frozenset()

    def __init__(self, cfg: LlamaConfig, linear_method: LinearMethod,
                 lm_head_method: Optional[LinearMethod] = None):
        from vllm_pq_tpu.quantization.methods import UnquantizedLinearMethod
        self.cfg = cfg
        self.linear_method = linear_method
        # embeddings / lm_head stay unquantized (reference AQLM leaves
        # them fp16 as well)
        self.embed_method = UnquantizedLinearMethod()
        self.lm_head_method = lm_head_method or UnquantizedLinearMethod()

    # -- parameter templates ------------------------------------------------

    def _biased_linears(self):
        """Linear sublayer names that carry a bias param."""
        cfg = self.cfg
        names = []
        if cfg.attention_bias:
            names += ["q_proj", "k_proj", "v_proj"]
        if cfg.o_proj_bias:
            names.append("o_proj")
        if cfg.mlp_bias == "down":
            # TeleChat2: only the row-parallel down_proj carries a bias
            names.append("down_proj")
        elif cfg.mlp_bias:
            names += (["gate_proj"] if cfg.mlp_style == "swiglu" else [])
            names += ["up_proj", "down_proj"]
        return names

    def _norm_names(self):
        cfg = self.cfg
        if cfg.block_style == "olmo2":
            # OLMo2: only branch-output norms, no input norms
            return ["post_attention_layernorm",
                    "post_feedforward_layernorm"]
        names = ["input_layernorm"]
        if not (cfg.parallel_residual and cfg.shared_input_norm):
            names.append("post_attention_layernorm")
        if cfg.use_post_norms:
            names += ["pre_feedforward_layernorm",
                      "post_feedforward_layernorm"]
        return names

    def _norm_shape(self, dim: Optional[int] = None):
        cfg = self.cfg
        if not cfg.norm_affine:
            return {}
        n = dim or cfg.hidden_size
        d = {"weight": ((n,), cfg.dtype)}
        if cfg.norm_type == "layernorm" and cfg.norm_bias:
            d["bias"] = ((n,), cfg.dtype)
        return d

    def param_shapes(self) -> Dict:
        cfg = self.cfg
        biased = self._biased_linears()
        layer = {}
        for name, i, o, _kind in _linear_defs(cfg):
            layer[name] = self.linear_method.param_shapes(i, o, cfg.dtype)
            if name in biased:
                layer[name + "_bias"] = {"bias": ((o,), cfg.dtype)}
        for n in self._norm_names():
            layer[n] = self._norm_shape()
        if cfg.qk_norm in ("head", "head_gemma"):
            layer["q_norm"] = {"weight": ((cfg.head_dim,), cfg.dtype)}
            layer["k_norm"] = {"weight": ((cfg.head_dim,), cfg.dtype)}
        elif cfg.qk_norm == "head_ln":
            d = cfg.head_dim
            layer["q_norm"] = {"weight": ((cfg.num_attention_heads, d),
                                          cfg.dtype)}
            layer["k_norm"] = {"weight": ((cfg.num_key_value_heads, d),
                                          cfg.dtype)}
        elif cfg.qk_norm == "head_ln_bias":
            # Persimmon: one LayerNorm(head_dim) with affine+bias,
            # shared across heads
            d = cfg.head_dim
            layer["q_norm"] = {"weight": ((d,), cfg.dtype),
                               "bias": ((d,), cfg.dtype)}
            layer["k_norm"] = {"weight": ((d,), cfg.dtype),
                               "bias": ((d,), cfg.dtype)}
        elif cfg.qk_norm == "head_ln_chameleon":
            # Chameleon: non-affine LayerNorm(head_dim) then a PER-HEAD
            # weight+bias [heads, d] (reference chameleon.py:173)
            d = cfg.head_dim
            layer["q_norm"] = {
                "weight": ((cfg.num_attention_heads, d), cfg.dtype),
                "bias": ((cfg.num_attention_heads, d), cfg.dtype)}
            layer["k_norm"] = {
                "weight": ((cfg.num_key_value_heads, d), cfg.dtype),
                "bias": ((cfg.num_key_value_heads, d), cfg.dtype)}
        elif cfg.qk_norm == "full":
            d = cfg.head_dim
            layer["q_norm"] = {"weight": ((cfg.num_attention_heads * d,),
                                          cfg.dtype)}
            layer["k_norm"] = {"weight": ((cfg.num_key_value_heads * d,),
                                          cfg.dtype)}
        shapes = {
            "embed_tokens": {"weight": ((cfg.vocab_size
                                         + cfg.embed_extra_rows,
                                         cfg.hidden_size), cfg.dtype)},
            "layers": [dict(layer) for _ in range(cfg.num_hidden_layers)],
            "norm": self._norm_shape(),
        }
        if cfg.embed_norm:
            shapes["embed_norm"] = self._norm_shape()
        if not cfg.tie_word_embeddings:
            shapes["lm_head"] = self.lm_head_method.param_shapes(
                cfg.hidden_size, cfg.vocab_size, cfg.dtype)
            if cfg.lm_head_bias:
                shapes["lm_head_bias"] = {"bias": ((cfg.vocab_size,),
                                                   cfg.dtype)}
        if cfg.num_labels:
            h = cfg.hidden_size
            if cfg.score_style == "mlp":
                shapes["score_fc1"] = {"weight": ((h, h), cfg.dtype),
                                       "bias": ((h,), cfg.dtype)}
                shapes["score_fc2"] = {
                    "weight": ((h, cfg.num_labels), cfg.dtype),
                    "bias": ((cfg.num_labels,), cfg.dtype)}
            else:
                shapes["score"] = {
                    "weight": ((h, cfg.num_labels), cfg.dtype)}
        return shapes

    def param_specs(self) -> Dict:
        cfg = self.cfg
        biased = self._biased_linears()
        norm_spec = {k: P(None) for k in self._norm_shape()}
        layer = {}
        for name, _i, _o, kind in _linear_defs(cfg):
            layer[name] = self.linear_method.partition_specs(kind)
            if name in biased:
                # row-parallel outputs are full-width after psum: the
                # bias is replicated and added once (see decoder_layer)
                layer[name + "_bias"] = {
                    "bias": P(None) if kind == "row" else P(TP_AXIS)}
        for n in self._norm_names():
            layer[n] = dict(norm_spec)
        if cfg.qk_norm in ("head", "head_gemma"):
            layer["q_norm"] = {"weight": P(None)}
            layer["k_norm"] = {"weight": P(None)}
        elif cfg.qk_norm == "head_ln":
            layer["q_norm"] = {"weight": P(TP_AXIS, None)}
            layer["k_norm"] = {"weight": P(TP_AXIS, None)}
        elif cfg.qk_norm == "head_ln_bias":
            layer["q_norm"] = {"weight": P(None), "bias": P(None)}
            layer["k_norm"] = {"weight": P(None), "bias": P(None)}
        elif cfg.qk_norm == "head_ln_chameleon":
            layer["q_norm"] = {"weight": P(TP_AXIS, None),
                               "bias": P(TP_AXIS, None)}
            layer["k_norm"] = {"weight": P(TP_AXIS, None),
                               "bias": P(TP_AXIS, None)}
        elif cfg.qk_norm == "full":
            # full-width qk norm: weight shards with the heads
            layer["q_norm"] = {"weight": P(TP_AXIS)}
            layer["k_norm"] = {"weight": P(TP_AXIS)}
        specs = {
            "embed_tokens": {"weight": P(TP_AXIS, None)},  # vocab-parallel
            "layers": [dict(layer) for _ in range(cfg.num_hidden_layers)],
            "norm": dict(norm_spec),
        }
        if cfg.embed_norm:
            specs["embed_norm"] = dict(norm_spec)
        if not cfg.tie_word_embeddings:
            specs["lm_head"] = self.lm_head_method.partition_specs("column")
            if cfg.lm_head_bias:
                specs["lm_head_bias"] = {"bias": P(None)}
        if cfg.num_labels:
            # tiny head: replicate rather than shard
            if cfg.score_style == "mlp":
                specs["score_fc1"] = {"weight": P(None, None),
                                      "bias": P(None)}
                specs["score_fc2"] = {"weight": P(None, None),
                                      "bias": P(None)}
            else:
                specs["score"] = {"weight": P(None, None)}
        return specs

    def lora_linear_defs(self):
        """Linear sublayers eligible for LoRA: (name, in, out, kind)."""
        return _linear_defs(self.cfg)

    def kv_cache_shape(self, num_pages: int, page_size: int,
                       tp_size: int = 1) -> Tuple:
        cfg = self.cfg
        kvh = max(cfg.num_key_value_heads // tp_size, 1)
        return (num_pages, page_size, 2 * kvh, cfg.head_dim)

    def kv_cache_spec(self) -> P:
        return P(None, None, TP_AXIS, None)

    def rope_cache(self, dtype=jnp.float32) -> jax.Array:
        cfg = self.cfg
        rd = int(cfg.head_dim * cfg.partial_rotary_factor)
        glob = build_rope_cache(cfg.max_position_embeddings, rd,
                                cfg.rope_theta, cfg.rope_scaling, dtype)
        if cfg.rope_local_theta is not None:
            # Gemma3: [2, max_pos, rd] — row 0 global (scaled), row 1
            # local (unscaled, its own base frequency)
            local = build_rope_cache(cfg.max_position_embeddings, rd,
                                     cfg.rope_local_theta, None, dtype)
            return jnp.stack([glob, local])
        return glob

    # -- forward (per-shard code under shard_map) ---------------------------

    def __call__(
        self,
        params: Dict,
        input_ids: jax.Array,        # i32[T]
        positions: jax.Array,        # i32[T]
        kv_caches: List[jax.Array],  # per layer [P, ps, 2*KVH_l, D]
        attn_md: Dict[str, jax.Array],
        rope_cache: jax.Array,
        *,
        tp_axis: Optional[str] = TP_AXIS,
        lora: Optional[Dict] = None,
        decode_mode: bool = False,
        decode_pages: Optional[int] = None,
        mm: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> Tuple[jax.Array, List[jax.Array]]:
        """Returns (hidden [T, H], updated kv_caches).

        ``mm``: optional (mask i32[T], embeds f32[T, H]) — flat tokens
        with mask!=0 take their embedding from ``embeds`` instead of the
        vocab table (multimodal placeholder splice, the role of the
        reference's inputs_embeds merge in models/llava.py)."""
        cfg = self.cfg
        tp = jax.lax.psum(1, tp_axis) if tp_axis else 1
        if cfg.num_attention_heads % tp or cfg.num_key_value_heads % tp:
            raise ValueError(
                f"tp={tp} must divide num_attention_heads="
                f"{cfg.num_attention_heads} and num_key_value_heads="
                f"{cfg.num_key_value_heads} (kv-head replication is not "
                "implemented yet)")
        heads = cfg.num_attention_heads // tp
        kv_heads = cfg.num_key_value_heads // tp
        d = cfg.head_dim
        sm_scale = (cfg.attention_multiplier
                    if cfg.attention_multiplier is not None
                    else 1.0 / ((cfg.query_pre_attn_scalar or d)**0.5))
        norm = self.make_norm()

        x = self._embed(params["embed_tokens"], input_ids, tp_axis)
        if cfg.embed_scale is not None:
            # Gemma scales embeddings by sqrt(hidden) in the input dtype
            x = x * jnp.asarray(cfg.embed_scale, x.dtype)
        if cfg.embed_norm:
            x = norm(x, params["embed_norm"])
        if mm is not None:
            mm_mask, mm_embeds = mm
            x = jnp.where(mm_mask[:, None] != 0,
                          mm_embeds.astype(x.dtype), x)
        new_caches = []
        bskcn_h1 = bskcn_h2 = None
        tv = cfg.bskcn_tv
        for li in range(cfg.num_hidden_layers):
            # Solar depth-up-scaling skip connections (reference
            # models/solar.py:333-346): stash at bskcn_1/2, blend back
            # with the inference tv at bskcn_3/4. Static per-layer
            # branches — each jits into a fixed graph.
            if cfg.bskcn_1 is not None and li in cfg.bskcn_1:
                bskcn_h1 = x
            if cfg.bskcn_2 is not None and li in cfg.bskcn_2:
                bskcn_h2 = x
            if cfg.bskcn_3 is not None and li in cfg.bskcn_3 \
                    and bskcn_h1 is not None:
                x = bskcn_h1 * tv + x * (1.0 - tv)
            if cfg.bskcn_4 is not None and li in cfg.bskcn_4 \
                    and bskcn_h2 is not None:
                x = bskcn_h2 * tv + x * (1.0 - tv)
            lp = params["layers"][li]
            lora_layer = lora["layers"][li] if lora is not None else None
            lora_md = ({"sorted_tok": lora["sorted_tok"],
                        "group_sizes": lora["group_sizes"]}
                       if lora is not None else None)
            x, cache = self.decoder_layer(
                lp, li, x, positions, kv_caches[li], attn_md, rope_cache,
                tp_axis=tp_axis, lora_layer=lora_layer, lora_md=lora_md,
                decode_mode=decode_mode, decode_pages=decode_pages,
                norm=norm, heads=heads, kv_heads=kv_heads,
                sm_scale=sm_scale)
            new_caches.append(cache)

        x = norm(x, params["norm"])
        return x, new_caches

    def layer_window(self, li: int):
        """Per-layer attention window (Gemma2/Gemma3 alternate
        sliding-window and global layers)."""
        cfg = self.cfg
        if cfg.sliding_window_layers is not None:
            return (cfg.sliding_window
                    if cfg.sliding_window_layers[li] else None)
        if cfg.sliding_window_pattern:
            return (cfg.sliding_window
                    if (li % cfg.sliding_window_pattern
                        != cfg.sliding_window_pattern - 1) else None)
        return cfg.sliding_window

    def decoder_layer(self, lp: Dict, li: int, x: jax.Array,
                      positions: jax.Array, kv_cache: jax.Array,
                      attn_md: Dict, rope_cache: jax.Array, *,
                      tp_axis: Optional[str], lora_layer: Optional[Dict],
                      lora_md: Optional[Dict], decode_mode: bool,
                      norm, heads: int, kv_heads: int, sm_scale: float,
                      decode_pages: Optional[int] = None,
                      ) -> Tuple[jax.Array, jax.Array]:
        """One decoder block: returns (x', updated kv cache). Shared by
        the dense forward above and the pipeline-parallel forward
        (parallel/pipeline.py)."""
        cfg = self.cfg
        d = cfg.head_dim
        if cfg.rope_local_theta is not None:
            # Gemma3 dual tables: local (sliding) layers use row 1
            rope_cache = rope_cache[
                1 if self.layer_window(li) is not None else 0]
        # self-attention (OLMo2 block_style norms branch OUTPUTS only;
        # EAGLE draft layers skip the input norm entirely — reference
        # eagle.py DummyInputLayerNorm on layer 0)
        h = (x if (cfg.block_style == "olmo2"
                   or li in self.identity_input_norm_layers)
             else norm(x, lp["input_layernorm"]))
        q = self._lin(lp, "q_proj", h, lora_layer, lora_md)
        k = self._lin(lp, "k_proj", h, lora_layer, lora_md)
        v = self._lin(lp, "v_proj", h, lora_layer, lora_md)
        if cfg.attention_bias:
            q = q + lp["q_proj_bias"]["bias"]
            k = k + lp["k_proj_bias"]["bias"]
            v = v + lp["v_proj_bias"]["bias"]
        if cfg.clip_qkv is not None:
            q = jnp.clip(q, -cfg.clip_qkv, cfg.clip_qkv)
            k = jnp.clip(k, -cfg.clip_qkv, cfg.clip_qkv)
            v = jnp.clip(v, -cfg.clip_qkv, cfg.clip_qkv)
        t = q.shape[0]
        if cfg.qk_norm == "full":
            # OLMo2: RMSNorm over the FULL projected q/k vector; under
            # TP the mean-square reduces across shards (psum)
            q = _full_rms(q, lp["q_norm"]["weight"], cfg.rms_norm_eps,
                          tp_axis)
            k = _full_rms(k, lp["k_norm"]["weight"], cfg.rms_norm_eps,
                          tp_axis)
        q = q.reshape(t, heads, d)
        k = k.reshape(t, kv_heads, d)
        v = v.reshape(t, kv_heads, d)
        if cfg.qk_norm == "head":
            # Qwen3: per-head RMSNorm on head_dim before rope
            q = rms_norm(q, lp["q_norm"]["weight"], cfg.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"]["weight"], cfg.rms_norm_eps)
        elif cfg.qk_norm == "head_gemma":
            # Gemma3: per-head RMSNorm with the (1 + w) gemma scaling
            q = rms_norm(q, lp["q_norm"]["weight"].astype(jnp.float32)
                         + 1.0, cfg.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"]["weight"].astype(jnp.float32)
                         + 1.0, cfg.rms_norm_eps)
        elif cfg.qk_norm == "head_ln":
            # Cohere: per-head bias-free layernorm (weight [heads, d])
            def _hln(u, w):
                u32 = u.astype(jnp.float32)
                mu = jnp.mean(u32, axis=-1, keepdims=True)
                var = jnp.var(u32, axis=-1, keepdims=True)
                y = (u32 - mu) * jax.lax.rsqrt(var + cfg.rms_norm_eps)
                return (y * w[None].astype(jnp.float32)).astype(u.dtype)
            q = _hln(q, lp["q_norm"]["weight"])
            k = _hln(k, lp["k_norm"]["weight"])
        elif cfg.qk_norm == "head_ln_chameleon":
            # Chameleon: non-affine per-head LN, then per-head w*x + b
            def _hlnc(u, w, b):
                u32 = u.astype(jnp.float32)
                mu = jnp.mean(u32, axis=-1, keepdims=True)
                var = jnp.var(u32, axis=-1, keepdims=True)
                y = (u32 - mu) * jax.lax.rsqrt(var + 1e-5)
                return (y * w[None].astype(jnp.float32)
                        + b[None].astype(jnp.float32)).astype(u.dtype)
            q = _hlnc(q, lp["q_norm"]["weight"], lp["q_norm"]["bias"])
            k = _hlnc(k, lp["k_norm"]["weight"], lp["k_norm"]["bias"])
        elif cfg.qk_norm == "head_ln_bias":
            # Persimmon: shared per-head layernorm with weight+bias
            def _hlnb(u, w, b):
                u32 = u.astype(jnp.float32)
                mu = jnp.mean(u32, axis=-1, keepdims=True)
                var = jnp.var(u32, axis=-1, keepdims=True)
                y = (u32 - mu) * jax.lax.rsqrt(var + cfg.rms_norm_eps)
                return (y * w.astype(jnp.float32)
                        + b.astype(jnp.float32)).astype(u.dtype)
            q = _hlnb(q, lp["q_norm"]["weight"], lp["q_norm"]["bias"])
            k = _hlnb(k, lp["k_norm"]["weight"], lp["k_norm"]["bias"])
        alibi = None
        mrope = getattr(cfg, "mrope_section", None)
        if cfg.alibi:
            alibi = self._alibi_local(heads, tp_axis)
        elif mrope and "mrope_pos" in attn_md:
            # Qwen2-VL 3D rotary: per-token (t, h, w) position plan
            # shipped by the runner (models/qwen2_vl.py)
            from vllm_pq_tpu.models.qwen2_vl import apply_mrope
            pos3 = attn_md["mrope_pos"].reshape(3, -1)
            q, k = apply_mrope(q, k, pos3, rope_cache, mrope)
        elif cfg.rope_layers is not None and not cfg.rope_layers[li]:
            pass  # SmolLM3-style NoPE layer: positions unencoded
        else:
            # partial rotary folds into apply_rope (pass-through dims
            # see cos=1/sin=0): no per-layer slice + concat
            q, k = apply_rope(q, k, positions, rope_cache, cfg.rope_style)

        spec_win = attn_md.get("spec_window")
        cache = write_kv_cache(
            kv_cache, k, v, attn_md["slot_mapping"],
            q_per_row=(spec_win["q_pos"].shape[1] if spec_win else 1))
        bs_spec = cfg.blocksparse
        if bs_spec is not None and cfg.blocksparse_dense_every_n and \
                (li + 1) % cfg.blocksparse_dense_every_n == 0:
            bs_spec = None  # Phi-3-Small: every n-th layer is dense
        attn = ragged_paged_attention(
            q, cache, attn_md["kv_lens"], attn_md["page_indices"],
            attn_md["cu_q_lens"], attn_md["num_seqs"],
            sm_scale=sm_scale, sliding_window=self.layer_window(li),
            soft_cap=cfg.attn_logit_softcap, decode_mode=decode_mode,
            decode_pages=decode_pages, alibi_slopes=alibi,
            spec_md=attn_md.get("spec_window"), blocksparse=bs_spec)
        attn = attn.reshape(t, heads * d)
        o = self._lin(lp, "o_proj", attn, lora_layer, lora_md)
        if tp_axis:
            o = jax.lax.psum(o, tp_axis)
        if cfg.o_proj_bias:  # replicated bias, added once after psum
            o = o + lp["o_proj_bias"]["bias"]
        if cfg.attn_output_multiplier is not None:
            # Grok1 (reference grok1.py:200): scale the attention
            # branch output after o_proj
            o = o * jnp.asarray(cfg.attn_output_multiplier, o.dtype)
        if cfg.use_post_norms:  # Gemma2: norm the branch pre-residual
            o = norm(o, lp["post_attention_layernorm"])

        rm = cfg.residual_multiplier
        if cfg.block_style == "olmo2":
            # OLMo2: x += norm(attn(x)); x += norm(mlp(x))
            o = norm(o, lp["post_attention_layernorm"])
            x = x + rm * o
            mlp = norm(self._mlp(lp, x, tp_axis, lora_layer, lora_md),
                       lp["post_feedforward_layernorm"])
            return x + rm * mlp, cache
        if cfg.parallel_residual:
            # GPT-NeoX / Phi / Cohere: attn and mlp both branch off x;
            # shared_input_norm feeds the SAME ln1(x) to the mlp
            h2 = (h if cfg.shared_input_norm
                  else norm(x, lp["post_attention_layernorm"]))
            return x + rm * (o + self._mlp(lp, h2, tp_axis, lora_layer,
                                           lora_md)), cache
        x = x + rm * o

        # mlp (overridable: Mixtral swaps in a routed MoE block)
        if cfg.use_post_norms:
            h = norm(x, lp["pre_feedforward_layernorm"])
            mlp = self._mlp(lp, h, tp_axis, lora_layer, lora_md)
            mlp = norm(mlp, lp["post_feedforward_layernorm"])
        else:
            h = norm(x, lp["post_attention_layernorm"])
            mlp = self._mlp(lp, h, tp_axis, lora_layer, lora_md)
        x = x + rm * mlp
        return x, cache

    def _alibi_local(self, heads_local: int, tp_axis) -> jax.Array:
        """This shard's ALiBi slopes [heads_local]."""
        full = jnp.asarray(alibi_slopes(self.cfg.num_attention_heads))
        if not tp_axis:
            return full
        rank = jax.lax.axis_index(tp_axis)
        return jax.lax.dynamic_slice(full, (rank * heads_local,),
                                     (heads_local,))

    def make_norm(self):
        """The norm closure used by forward: ``norm(x, norm_params)``
        where norm_params is the {weight[, bias]} dict (Gemma adds 1 to
        the weight; layernorm families mean-center and add bias)."""
        cfg = self.cfg
        if cfg.norm_type == "layernorm":
            from vllm_pq_tpu.layers.norm import layer_norm

            def ln(x, nd):
                one = jnp.ones((x.shape[-1],), jnp.float32)
                w = nd.get("weight", one) if cfg.norm_affine else one
                if cfg.norm_plus_one:  # Nemotron layernorm1p
                    w = w.astype(jnp.float32) + 1.0
                b = nd.get("bias", jnp.zeros_like(one))
                return layer_norm(x, w, b, cfg.rms_norm_eps)
            return ln
        if cfg.gemma_norm:
            return lambda x, nd: rms_norm(
                x, nd["weight"].astype(jnp.float32) + 1.0, cfg.rms_norm_eps)
        return lambda x, nd: rms_norm(x, nd["weight"], cfg.rms_norm_eps)

    def _lin(self, lp: Dict, name: str, h: jax.Array,
             lora_layer: Optional[Dict],
             lora_md: Optional[Dict]) -> jax.Array:
        """Base linear + optional batched-LoRA delta. Row-parallel
        deltas are partial sums added before the caller's psum (the
        fully-sharded-LoRA layout, reference fully_sharded_layers.py)."""
        y = self.linear_method.apply(lp[name], h)
        if lora_layer is not None and name in lora_layer:
            from vllm_pq_tpu.lora.models import lora_apply
            d = lora_layer[name]
            y = y + lora_apply(h, d["a"], d["b"], lora_md["sorted_tok"],
                               lora_md["group_sizes"])
        return y

    def _mlp(self, lp: Dict, h: jax.Array, tp_axis: Optional[str],
             lora_layer: Optional[Dict] = None,
             lora_md: Optional[Dict] = None) -> jax.Array:
        from vllm_pq_tpu.layers.activation import ACT2FN
        cfg = self.cfg
        act_fn = (None if cfg.hidden_act == "gegelu"
                  else ACT2FN[cfg.hidden_act])
        gate_up_bias = cfg.mlp_bias and cfg.mlp_bias != "down"
        if cfg.mlp_style == "mlp":
            # two-linear MLP (GPT-NeoX dense_h_to_4h/4h_to_h, Phi
            # fc1/fc2, Starcoder2 c_fc/c_proj)
            up = self._lin(lp, "up_proj", h, lora_layer, lora_md)
            if gate_up_bias:
                up = up + lp["up_proj_bias"]["bias"]
            if cfg.hidden_act == "gegelu":
                # Phi-3-Small (reference phi3_small.py::gegelu):
                # interleaved halves, clamped at gegelu_limit
                a = up[..., 0::2].astype(jnp.float32)
                b = up[..., 1::2].astype(jnp.float32)
                lim = cfg.gegelu_limit
                if lim is not None:
                    a = jnp.minimum(a, lim)
                    b = jnp.clip(b, -lim, lim)
                act = ((a * jax.nn.sigmoid(1.702 * a))
                       * (b + 1.0)).astype(up.dtype)
            else:
                act = act_fn(up)
        else:
            gate = self._lin(lp, "gate_proj", h, lora_layer, lora_md)
            up = self._lin(lp, "up_proj", h, lora_layer, lora_md)
            if gate_up_bias:
                gate = gate + lp["gate_proj_bias"]["bias"]
                up = up + lp["up_proj_bias"]["bias"]
            act = act_fn(gate) * up
        down = self._lin(lp, "down_proj", act, lora_layer, lora_md)
        if tp_axis:
            down = jax.lax.psum(down, tp_axis)
        if cfg.mlp_bias:  # replicated, added once after psum
            down = down + lp["down_proj_bias"]["bias"]
        return down

    def _embed(self, ep: Dict, input_ids: jax.Array,
               tp_axis: Optional[str]) -> jax.Array:
        """Vocab-parallel embedding lookup (reference
        VocabParallelEmbedding:159)."""
        w = ep["weight"]
        if not tp_axis:
            return w[input_ids]
        tp = jax.lax.psum(1, tp_axis)
        rank = jax.lax.axis_index(tp_axis)
        vocab_local = w.shape[0]
        start = rank * vocab_local
        local_ids = input_ids - start
        in_range = (local_ids >= 0) & (local_ids < vocab_local)
        local_ids = jnp.clip(local_ids, 0, vocab_local - 1)
        emb = w[local_ids]
        emb = jnp.where(in_range[:, None], emb, 0)
        return jax.lax.psum(emb, tp_axis)

    def compute_logits(self, params: Dict, hidden: jax.Array,
                       tp_axis: Optional[str] = TP_AXIS) -> jax.Array:
        """hidden [S, H] -> logits [S, vocab] (f32, gathered)."""
        cfg = self.cfg
        if cfg.tie_word_embeddings:
            w = params["embed_tokens"]["weight"]  # [V_local, H]
            if cfg.embed_extra_rows:
                w = w[:cfg.vocab_size]
            logits = jnp.dot(hidden, w.T,
                             preferred_element_type=jnp.float32)
        else:
            logits = self.lm_head_method.apply(
                params["lm_head"], hidden).astype(jnp.float32)
        if tp_axis:
            logits = jax.lax.all_gather(logits, tp_axis, axis=1,
                                        tiled=True)
        logits = logits.astype(jnp.float32)
        if cfg.lm_head_bias and not cfg.tie_word_embeddings:
            logits = logits + params["lm_head_bias"]["bias"].astype(
                jnp.float32)
        if cfg.logit_scale is not None:
            logits = logits * cfg.logit_scale
        if self.cfg.final_logit_softcap:
            c = self.cfg.final_logit_softcap
            logits = jnp.tanh(logits / c) * c
        return logits

    def classify_pooled(self, params: Dict, pooled: jax.Array) -> jax.Array:
        """Pooled hidden [H] -> classification/reward logits [num_labels]
        (role of reference as_seqcls_model score head / qwen2_rm.py:63
        Linear->ReLU->Linear stack)."""
        cfg = self.cfg
        p32 = pooled.astype(jnp.float32)
        if cfg.score_style == "mlp":
            fc1, fc2 = params["score_fc1"], params["score_fc2"]
            h = jnp.dot(p32, fc1["weight"].astype(jnp.float32))
            h = jax.nn.relu(h + fc1["bias"].astype(jnp.float32))
            return (jnp.dot(h, fc2["weight"].astype(jnp.float32))
                    + fc2["bias"].astype(jnp.float32))
        return jnp.dot(p32, params["score"]["weight"].astype(jnp.float32))
