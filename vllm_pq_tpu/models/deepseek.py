"""DeepSeek-V2/V3 decoder with MLA (multi-head latent attention) and
DeepSeekMoE (role of reference ``models/deepseek_v2.py`` +
``attention/backends/triton_mla.py``).

Two MLA executions, selected by ``DeepseekConfig.mla_latent``
(env ``VPQ_MLA_DISABLE=1`` forces the decompressed path, mirroring the
reference's ``VLLM_MLA_DISABLE``):

- **latent (default)**: the paged cache stores ONE row per token — the
  normalized ``c_kv`` latent concatenated with the roped ``k_pe``
  (``kv_lora_rank + qk_rope_head_dim`` dims, e.g. 576 for V2/V3 vs
  ``2*H*192`` decompressed: ~10.7x smaller). Queries are *absorbed*
  (``q_nope @ W_UK``) so attention runs as multi-query over the latent
  stream; outputs are up-projected with ``W_UV``. This is the role of
  the reference's triton_mla/flashmla backends + concat_and_cache_mla.
- **decompressed** (``mla_latent=False``): k/v are materialized per
  head from the latent projections and cached paged like any MHA (the
  reference's VLLM_MLA_DISABLE fallback). Exact same numerics; used as
  the test oracle.

DeepSeekMoE = grouped-top-k
routed experts (FusedMoE with n_group/topk_group) + always-on shared
experts. RoPE is DeepSeek's INTERLEAVED complex rotation over the
qk_rope dims only, with the YaRN mscale-ratio attention factor folded
into the table (layers/rotary.py).
"""

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.moe import FusedMoE
from vllm_pq_tpu.layers.norm import rms_norm
from vllm_pq_tpu.layers.rotary import build_rope_cache
from vllm_pq_tpu.ops.attention import (mla_ragged_paged_attention,
                                       ragged_paged_attention,
                                       write_kv_cache, write_latent_cache)
from vllm_pq_tpu.quantization.methods import TP_AXIS


@dataclass
class DeepseekConfig:
    vocab_size: int = 102400
    hidden_size: int = 2048
    intermediate_size: int = 10944
    moe_intermediate_size: int = 1408
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    q_lora_rank: Optional[int] = None
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    n_routed_experts: int = 64
    n_shared_experts: int = 2
    num_experts_per_tok: int = 6
    n_group: int = 1
    topk_group: int = 1
    topk_method: str = "greedy"
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = False
    scoring_func: str = "softmax"
    first_k_dense_replace: int = 1
    moe_layer_freq: int = 1
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    dtype: Any = jnp.bfloat16
    # absorbed-weights MLA over the paged LATENT cache (the reference's
    # MLA backends, triton_mla.py/flashmla.py); False = decompressed
    # per-head K/V caching (the VLLM_MLA_DISABLE path)
    mla_latent: bool = True
    # MiniCPM3 muP scalings (reference models/minicpm3.py + minicpm.py):
    # embeddings * scale_emb, each residual branch * scale_depth/sqrt(L),
    # logits * dim_model_base/hidden
    embed_scale: Optional[float] = None
    residual_multiplier: float = 1.0
    logit_scale: Optional[float] = None

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    # generic engine-facing aliases (worker memory probe etc.): the
    # decompressed-MLA cache is MHA-shaped at the qk head dim
    @property
    def head_dim(self) -> int:
        return self.qk_head_dim

    @property
    def num_key_value_heads(self) -> int:
        return self.num_attention_heads

    @classmethod
    def from_hf_config(cls, hf) -> "DeepseekConfig":
        return cls(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            intermediate_size=hf.intermediate_size,
            moe_intermediate_size=getattr(hf, "moe_intermediate_size",
                                          hf.intermediate_size),
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            q_lora_rank=getattr(hf, "q_lora_rank", None),
            kv_lora_rank=getattr(hf, "kv_lora_rank", 512),
            qk_nope_head_dim=getattr(hf, "qk_nope_head_dim", 128),
            qk_rope_head_dim=getattr(hf, "qk_rope_head_dim", 64),
            v_head_dim=getattr(hf, "v_head_dim", 128),
            n_routed_experts=getattr(hf, "n_routed_experts", 64),
            n_shared_experts=getattr(hf, "n_shared_experts", 0) or 0,
            num_experts_per_tok=getattr(hf, "num_experts_per_tok", 6),
            n_group=getattr(hf, "n_group", 1) or 1,
            topk_group=getattr(hf, "topk_group", 1) or 1,
            topk_method=getattr(hf, "topk_method", "greedy"),
            routed_scaling_factor=getattr(hf, "routed_scaling_factor",
                                          1.0),
            norm_topk_prob=getattr(hf, "norm_topk_prob", False),
            scoring_func=getattr(hf, "scoring_func", "softmax"),
            first_k_dense_replace=getattr(hf, "first_k_dense_replace", 0),
            moe_layer_freq=getattr(hf, "moe_layer_freq", 1),
            rms_norm_eps=getattr(hf, "rms_norm_eps", 1e-6),
            rope_theta=getattr(hf, "rope_theta", 10000.0),
            rope_scaling=getattr(hf, "rope_scaling", None),
            max_position_embeddings=getattr(hf, "max_position_embeddings",
                                            4096),
            tie_word_embeddings=getattr(hf, "tie_word_embeddings", False),
        )


def apply_rope_interleaved(q: jax.Array, k: jax.Array,
                           positions: jax.Array, rope_cache: jax.Array):
    """DeepSeek rope: complex rotation over (even, odd) PAIRS (HF
    apply_rotary_emb via view_as_complex) — not the llama half-rotation.
    q [T, Hq, rd], k [T, Hk, rd]; rope_cache [L, rd] (cos | sin halves,
    attention factor folded in)."""
    rd = q.shape[-1]
    cs = rope_cache[positions]
    cos = cs[:, :rd // 2][:, None, :]
    sin = cs[:, rd // 2:][:, None, :]

    def rot(x):
        x0 = x[..., 0::2]
        x1 = x[..., 1::2]
        o0 = x0 * cos - x1 * sin
        o1 = x0 * sin + x1 * cos
        return jnp.stack([o0, o1], axis=-1).reshape(x.shape).astype(x.dtype)

    return rot(q), rot(k)


class DeepseekV2Model:
    """Stateless functional DeepSeek-V2/V3 (MLA decompressed-KV)."""

    def __init__(self, cfg: DeepseekConfig):
        self.cfg = cfg

    def _is_moe(self, li: int) -> bool:
        cfg = self.cfg
        return (cfg.n_routed_experts > 0
                and li >= cfg.first_k_dense_replace
                and li % cfg.moe_layer_freq == 0)

    def _moe_layer(self) -> FusedMoE:
        cfg = self.cfg
        grouped = cfg.topk_method in ("group_limited_greedy",
                                      "noaux_tc") and cfg.n_group > 1
        return FusedMoE(
            cfg.hidden_size, cfg.moe_intermediate_size,
            cfg.n_routed_experts, cfg.num_experts_per_tok,
            renormalize=cfg.norm_topk_prob,
            n_group=cfg.n_group if grouped else 1,
            topk_group=cfg.topk_group if grouped else 1,
            routed_scaling_factor=cfg.routed_scaling_factor,
            scoring_func=cfg.scoring_func)

    # -- parameter templates -------------------------------------------------

    def param_shapes(self) -> Dict:
        cfg = self.cfg
        h, hq = cfg.hidden_size, cfg.num_attention_heads
        dt = cfg.dtype
        layers = []
        for li in range(cfg.num_hidden_layers):
            lp: Dict[str, Any] = {}
            if cfg.q_lora_rank:
                lp["q_a_proj"] = {"weight": ((h, cfg.q_lora_rank), dt)}
                lp["q_a_layernorm"] = {"weight": ((cfg.q_lora_rank,), dt)}
                lp["q_b_proj"] = {"weight": ((cfg.q_lora_rank,
                                              hq * cfg.qk_head_dim), dt)}
            else:
                lp["q_proj"] = {"weight": ((h, hq * cfg.qk_head_dim), dt)}
            lp["kv_a_proj"] = {"weight": (
                (h, cfg.kv_lora_rank + cfg.qk_rope_head_dim), dt)}
            lp["kv_a_layernorm"] = {"weight": ((cfg.kv_lora_rank,), dt)}
            lp["kv_b_proj"] = {"weight": (
                (cfg.kv_lora_rank,
                 hq * (cfg.qk_nope_head_dim + cfg.v_head_dim)), dt)}
            lp["o_proj"] = {"weight": ((hq * cfg.v_head_dim, h), dt)}
            lp["input_layernorm"] = {"weight": ((h,), dt)}
            lp["post_attention_layernorm"] = {"weight": ((h,), dt)}
            if self._is_moe(li):
                lp["moe"] = self._moe_layer().param_shapes(dt)
                if cfg.n_shared_experts:
                    si = cfg.moe_intermediate_size * cfg.n_shared_experts
                    lp["shared_gate_proj"] = {"weight": ((h, si), dt)}
                    lp["shared_up_proj"] = {"weight": ((h, si), dt)}
                    lp["shared_down_proj"] = {"weight": ((si, h), dt)}
            else:
                i = cfg.intermediate_size
                lp["gate_proj"] = {"weight": ((h, i), dt)}
                lp["up_proj"] = {"weight": ((h, i), dt)}
                lp["down_proj"] = {"weight": ((i, h), dt)}
            layers.append(lp)
        shapes = {
            "embed_tokens": {"weight": ((cfg.vocab_size, h), dt)},
            "layers": layers,
            "norm": {"weight": ((h,), dt)},
        }
        if not cfg.tie_word_embeddings:
            shapes["lm_head"] = {"weight": ((h, cfg.vocab_size), dt)}
        return shapes

    def param_specs(self) -> Dict:
        cfg = self.cfg
        layers = []
        for li in range(cfg.num_hidden_layers):
            lp: Dict[str, Any] = {}
            if cfg.q_lora_rank:
                lp["q_a_proj"] = {"weight": P(None, None)}
                lp["q_a_layernorm"] = {"weight": P(None)}
                lp["q_b_proj"] = {"weight": P(None, TP_AXIS)}
            else:
                lp["q_proj"] = {"weight": P(None, TP_AXIS)}
            lp["kv_a_proj"] = {"weight": P(None, None)}     # replicated
            lp["kv_a_layernorm"] = {"weight": P(None)}
            lp["kv_b_proj"] = {"weight": P(None, TP_AXIS)}  # head-sharded
            lp["o_proj"] = {"weight": P(TP_AXIS, None)}     # row-parallel
            lp["input_layernorm"] = {"weight": P(None)}
            lp["post_attention_layernorm"] = {"weight": P(None)}
            if self._is_moe(li):
                lp["moe"] = self._moe_layer().partition_specs()
                if cfg.n_shared_experts:
                    lp["shared_gate_proj"] = {"weight": P(None, TP_AXIS)}
                    lp["shared_up_proj"] = {"weight": P(None, TP_AXIS)}
                    lp["shared_down_proj"] = {"weight": P(TP_AXIS, None)}
            else:
                lp["gate_proj"] = {"weight": P(None, TP_AXIS)}
                lp["up_proj"] = {"weight": P(None, TP_AXIS)}
                lp["down_proj"] = {"weight": P(TP_AXIS, None)}
            layers.append(lp)
        specs = {
            "embed_tokens": {"weight": P(TP_AXIS, None)},
            "layers": layers,
            "norm": {"weight": P(None)},
        }
        if not cfg.tie_word_embeddings:
            specs["lm_head"] = {"weight": P(None, TP_AXIS)}
        return specs

    def lora_linear_defs(self):
        return []

    def kv_cache_shape(self, num_pages: int, page_size: int,
                       tp_size: int = 1) -> Tuple:
        cfg = self.cfg
        if cfg.mla_latent:
            # ONE latent row per token: (c_kv | roped k_pe), shared by
            # all heads and all TP ranks — 2*H*qk_head_dim/(kv_lora+dr)
            # smaller than the decompressed cache (~10.7x for V2)
            return (num_pages, page_size,
                    cfg.kv_lora_rank + cfg.qk_rope_head_dim)
        h = max(cfg.num_attention_heads // tp_size, 1)
        # decompressed MHA cache: v padded to the qk head dim
        return (num_pages, page_size, 2 * h, cfg.qk_head_dim)

    def kv_cache_spec(self) -> P:
        if self.cfg.mla_latent:
            return P(None, None, None)  # replicated across TP ranks
        return P(None, None, TP_AXIS, None)

    def rope_cache(self, dtype=jnp.float32) -> jax.Array:
        cfg = self.cfg
        return build_rope_cache(cfg.max_position_embeddings,
                                cfg.qk_rope_head_dim, cfg.rope_theta,
                                cfg.rope_scaling, dtype)

    # -- forward -------------------------------------------------------------

    def __call__(self, params, input_ids, positions, kv_caches, attn_md,
                 rope_cache, *, tp_axis: Optional[str] = TP_AXIS,
                 lora: Optional[Dict] = None, decode_mode: bool = False,
                 decode_pages: Optional[int] = None, mm=None):
        cfg = self.cfg
        tp = jax.lax.psum(1, tp_axis) if tp_axis else 1
        hq = cfg.num_attention_heads // tp
        dn, dr, dv = (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                      cfg.v_head_dim)
        dqk = cfg.qk_head_dim
        sm_scale = dqk**-0.5
        norm = lambda x, w: rms_norm(x, w, cfg.rms_norm_eps)  # noqa: E731
        lin = lambda lp, n, x: jnp.dot(  # noqa: E731
            x, lp[n]["weight"],
            preferred_element_type=jnp.float32).astype(x.dtype)

        rm = jnp.asarray(cfg.residual_multiplier, jnp.float32).astype(
            cfg.dtype)
        x = self._embed(params["embed_tokens"], input_ids, tp_axis)
        if cfg.embed_scale is not None:
            x = x * jnp.asarray(cfg.embed_scale, x.dtype)
        if mm is not None:  # multimodal splice (DeepseekVL2)
            mm_mask, mm_embeds = mm
            x = jnp.where(mm_mask[:, None] != 0,
                          mm_embeds.astype(x.dtype), x)
        t = x.shape[0]
        new_caches = []
        for li in range(cfg.num_hidden_layers):
            lp = params["layers"][li]
            h_in = norm(x, lp["input_layernorm"]["weight"])

            # -- MLA (decompressed) --------------------------------------
            if cfg.q_lora_rank:
                qc = lin(lp, "q_a_proj", h_in)
                q = lin(lp, "q_b_proj",
                        norm(qc, lp["q_a_layernorm"]["weight"]))
            else:
                q = lin(lp, "q_proj", h_in)
            q = q.reshape(t, hq, dqk)
            q_nope, q_pe = q[..., :dn], q[..., dn:]

            ckv = lin(lp, "kv_a_proj", h_in)  # [T, kv_lora + dr]
            c_kv, k_pe = ckv[:, :cfg.kv_lora_rank], ckv[:, cfg.kv_lora_rank:]
            c_kv = norm(c_kv, lp["kv_a_layernorm"]["weight"])

            if cfg.mla_latent:
                # absorbed-weights execution: score q against the latent
                # stream directly — q_nope @ W_UK replaces decompressing
                # k_nope per cached token (reference MLA backends)
                q_pe, k_pe = apply_rope_interleaved(
                    q_pe, k_pe[:, None, :], positions, rope_cache)
                wkv = lp["kv_b_proj"]["weight"].reshape(
                    cfg.kv_lora_rank, hq, dn + dv)
                w_uk, w_uv = wkv[..., :dn], wkv[..., dn:]
                q_lat = jnp.einsum(
                    "thd,rhd->thr", q_nope, w_uk,
                    preferred_element_type=jnp.float32).astype(x.dtype)
                q_eff = jnp.concatenate([q_lat, q_pe], axis=-1)
                c_row = jnp.concatenate([c_kv, k_pe[:, 0, :]], axis=-1)
                cache = write_latent_cache(kv_caches[li], c_row,
                                           attn_md["slot_mapping"])
                new_caches.append(cache)
                attn_lat = mla_ragged_paged_attention(
                    q_eff, cache, attn_md["kv_lens"],
                    attn_md["page_indices"], attn_md["cu_q_lens"],
                    attn_md["num_seqs"], v_dim=cfg.kv_lora_rank,
                    sm_scale=sm_scale, decode_mode=decode_mode,
                    decode_pages=decode_pages)
                attn = jnp.einsum(
                    "thr,rhv->thv", attn_lat, w_uv,
                    preferred_element_type=jnp.float32).astype(x.dtype)
                attn = attn.reshape(t, hq * dv)
                o = lin(lp, "o_proj", attn)
                if tp_axis:
                    o = jax.lax.psum(o, tp_axis)
                x = x + rm * o
                h_in = norm(x, lp["post_attention_layernorm"]["weight"])
                x = x + rm * self._mlp(lp, h_in, li, lin, tp_axis)
                continue

            kv = lin(lp, "kv_b_proj", c_kv)
            kv = kv.reshape(t, hq, dn + dv)
            k_nope, v = kv[..., :dn], kv[..., dn:]

            q_pe, k_pe = apply_rope_interleaved(
                q_pe, k_pe[:, None, :], positions, rope_cache)
            k = jnp.concatenate(
                [k_nope, jnp.broadcast_to(k_pe, (t, hq, dr))], axis=-1)
            qf = jnp.concatenate([q_nope, q_pe], axis=-1)
            v_pad = jnp.pad(v, ((0, 0), (0, 0), (0, dqk - dv)))

            cache = write_kv_cache(kv_caches[li], k, v_pad,
                                   attn_md["slot_mapping"])
            new_caches.append(cache)
            attn = ragged_paged_attention(
                qf, cache, attn_md["kv_lens"], attn_md["page_indices"],
                attn_md["cu_q_lens"], attn_md["num_seqs"],
                sm_scale=sm_scale, decode_mode=decode_mode,
                decode_pages=decode_pages)
            attn = attn[..., :dv].reshape(t, hq * dv)
            o = lin(lp, "o_proj", attn)
            if tp_axis:
                o = jax.lax.psum(o, tp_axis)
            x = x + rm * o

            # -- MLP / MoE -------------------------------------------------
            h_in = norm(x, lp["post_attention_layernorm"]["weight"])
            x = x + rm * self._mlp(lp, h_in, li, lin, tp_axis)

        x = norm(x, params["norm"]["weight"])
        return x, new_caches

    def _mlp(self, lp, h_in, li, lin, tp_axis):
        cfg = self.cfg
        if self._is_moe(li):
            mlp = self._moe_layer()(lp["moe"], h_in, tp_axis)
            if cfg.n_shared_experts:
                gate = lin(lp, "shared_gate_proj", h_in)
                up = lin(lp, "shared_up_proj", h_in)
                sh = lin(lp, "shared_down_proj", jax.nn.silu(gate) * up)
                if tp_axis:
                    sh = jax.lax.psum(sh, tp_axis)
                mlp = mlp + sh
        else:
            gate = lin(lp, "gate_proj", h_in)
            up = lin(lp, "up_proj", h_in)
            mlp = lin(lp, "down_proj", jax.nn.silu(gate) * up)
            if tp_axis:
                mlp = jax.lax.psum(mlp, tp_axis)
        return mlp

    def _embed(self, ep, input_ids, tp_axis):
        w = ep["weight"]
        if not tp_axis:
            return w[input_ids]
        tp = jax.lax.psum(1, tp_axis)
        shard = w.shape[0]
        lo = jax.lax.axis_index(tp_axis) * shard
        ids = input_ids - lo
        ok = (ids >= 0) & (ids < shard)
        emb = w[jnp.clip(ids, 0, shard - 1)]
        emb = jnp.where(ok[:, None], emb, 0)
        return jax.lax.psum(emb, tp_axis)

    def compute_logits(self, params, hidden,
                       tp_axis: Optional[str] = TP_AXIS):
        cfg = self.cfg
        if cfg.tie_word_embeddings:
            w = params["embed_tokens"]["weight"]
            logits = jnp.dot(hidden, w.T,
                             preferred_element_type=jnp.float32)
            if tp_axis:
                logits = jax.lax.all_gather(logits, tp_axis, axis=1,
                                            tiled=True)
            if cfg.logit_scale is not None:
                logits = logits * cfg.logit_scale
            return logits
        logits = jnp.dot(hidden, params["lm_head"]["weight"],
                         preferred_element_type=jnp.float32)
        if tp_axis:
            logits = jax.lax.all_gather(logits, tp_axis, axis=1,
                                        tiled=True)
        if cfg.logit_scale is not None:
            logits = logits * cfg.logit_scale
        return logits
