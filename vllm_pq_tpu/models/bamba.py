"""Bamba (IBM): hybrid Mamba-2 / attention decoder — role of reference
``models/bamba.py`` (registry hybrid rows). Composition of two existing
pieces: the Jamba hybrid skeleton (per-layer "kv" / "ssm" cache kinds,
runner hybrid allocation) with Mamba-2 SSD mixers (scalar-per-head A,
grouped B/C, gated RMSNorm — models/mamba.py::Mamba2Model) and
partial-rotary GQA attention on the sparse attention layers. Every
layer carries a dense SwiGLU MLP (no MoE)."""

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from vllm_pq_tpu.layers.rotary import apply_rope, build_rope_cache
from vllm_pq_tpu.models.jamba import JambaConfig, JambaModel
from vllm_pq_tpu.ops.attention import ragged_paged_attention, write_kv_cache


@dataclass
class BambaConfig(JambaConfig):
    attn_layer_indices: tuple = ()
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 0.5
    max_position_embeddings: int = 262144
    # mamba-2 mixer geometry (HF BambaConfig mamba_* fields)
    mamba_n_heads: int = 128
    mamba_d_head: int = 64
    mamba_n_groups: int = 1
    attention_bias: bool = False

    @property
    def mamba_d_inner(self):
        return self.mamba_n_heads * self.mamba_d_head

    @property
    def mamba_conv_dim(self):
        return (self.mamba_d_inner
                + 2 * self.mamba_n_groups * self.mamba_d_state)

    def is_attn(self, li: int) -> bool:
        return li in self.attn_layer_indices

    def is_expert(self, li: int) -> bool:
        return False

    @classmethod
    def from_hf_config(cls, hf) -> "BambaConfig":
        h = getattr(hf, "hidden_size", 512)
        expand = getattr(hf, "mamba_expand", 2)
        nh = getattr(hf, "mamba_n_heads", 128)
        return cls(
            vocab_size=hf.vocab_size,
            hidden_size=h,
            intermediate_size=getattr(hf, "intermediate_size", 4 * h),
            num_hidden_layers=getattr(hf, "num_hidden_layers", 8),
            num_attention_heads=getattr(hf, "num_attention_heads", 8),
            num_key_value_heads=getattr(hf, "num_key_value_heads", 2),
            rms_norm_eps=getattr(hf, "rms_norm_eps", 1e-5),
            num_experts=1, num_experts_per_tok=1,
            mamba_d_state=getattr(hf, "mamba_d_state", 128),
            mamba_d_conv=getattr(hf, "mamba_d_conv", 4),
            mamba_expand=expand,
            mamba_conv_bias=getattr(hf, "mamba_conv_bias", True),
            mamba_proj_bias=getattr(hf, "mamba_proj_bias", False),
            tie_word_embeddings=getattr(hf, "tie_word_embeddings", False),
            attn_layer_indices=tuple(
                getattr(hf, "attn_layer_indices", None) or ()),
            rope_theta=getattr(hf, "rope_theta", 10000.0),
            partial_rotary_factor=getattr(hf, "partial_rotary_factor",
                                          0.5),
            max_position_embeddings=getattr(hf,
                                            "max_position_embeddings",
                                            262144),
            mamba_n_heads=nh,
            mamba_d_head=getattr(hf, "mamba_d_head",
                                 expand * h // max(nh, 1)),
            mamba_n_groups=getattr(hf, "mamba_n_groups", 1),
            attention_bias=getattr(hf, "attention_bias", False),
        )


class BambaModel(JambaModel):

    # -- mamba-2 mixer templates ------------------------------------------

    def _mamba_shapes(self) -> Dict:
        cfg = self.cfg
        dt = cfg.dtype
        h = cfg.hidden_size
        i = cfg.mamba_d_inner
        nh, k = cfg.mamba_n_heads, cfg.mamba_d_conv
        cdim = cfg.mamba_conv_dim
        m = {
            # z | xBC | dt
            "in_proj": {"weight": ((h, i + cdim + nh), dt)},
            "conv1d": {"weight": ((cdim, k), dt)},
            "dt_bias": {"weight": ((nh,), dt)},
            "A_log": {"weight": ((nh,), dt)},
            "D": {"weight": ((nh,), dt)},
            "norm": {"weight": ((i,), dt)},     # gated RMSNorm
            "out_proj": {"weight": ((i, h), dt)},
        }
        if cfg.mamba_conv_bias:
            m["conv1d"]["bias"] = ((cdim,), dt)
        if cfg.mamba_proj_bias:
            m["in_proj"]["bias"] = ((i + cdim + nh,), dt)
            m["out_proj"]["bias"] = ((h,), dt)
        return m

    def state_shape(self, max_num_reqs: int) -> Tuple:
        cfg = self.cfg
        flat = (cfg.mamba_n_heads * cfg.mamba_d_head * cfg.mamba_d_state
                + cfg.mamba_conv_dim * cfg.mamba_d_conv)
        return (max_num_reqs, 1, flat)

    def rope_cache(self, dtype=jnp.float32) -> jax.Array:
        cfg = self.cfg
        rd = int(cfg.head_dim * cfg.partial_rotary_factor)
        return build_rope_cache(cfg.max_position_embeddings, rd,
                                cfg.rope_theta, None, dtype)

    # -- mamba-2 SSD mixer (single token per row; see
    #    models/mamba.py::Mamba2Model._mixer_step) -------------------------

    def _mixer_step(self, mp: Dict, x: jax.Array, state: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        nh, p, n = cfg.mamba_n_heads, cfg.mamba_d_head, cfg.mamba_d_state
        g, k = cfg.mamba_n_groups, cfg.mamba_d_conv
        i = cfg.mamba_d_inner
        cdim = cfg.mamba_conv_dim
        bsz = x.shape[0]
        flat = state[:, 0, :]
        ssm = flat[:, :nh * p * n].astype(jnp.float32).reshape(
            bsz, nh, p, n)
        conv = flat[:, nh * p * n:].reshape(bsz, cdim, k)

        proj = jnp.dot(x, mp["in_proj"]["weight"],
                       preferred_element_type=jnp.float32)
        if "bias" in mp["in_proj"]:
            proj = proj + mp["in_proj"]["bias"].astype(jnp.float32)
        z = proj[:, :i]
        xbc = proj[:, i:i + cdim]
        dt_in = proj[:, i + cdim:]                        # [B, H]

        conv = jnp.concatenate(
            [conv[:, :, 1:], xbc.astype(conv.dtype)[:, :, None]], axis=-1)
        u = jnp.sum(conv.astype(jnp.float32)
                    * mp["conv1d"]["weight"].astype(jnp.float32)[None],
                    axis=-1)
        if "bias" in mp["conv1d"]:
            u = u + mp["conv1d"]["bias"].astype(jnp.float32)
        u = jax.nn.silu(u)

        xh = u[:, :i].reshape(bsz, nh, p)
        b = u[:, i:i + g * n].reshape(bsz, g, n)
        c = u[:, i + g * n:].reshape(bsz, g, n)
        rep = nh // g
        bh = jnp.repeat(b, rep, axis=1)
        ch = jnp.repeat(c, rep, axis=1)

        dt = jax.nn.softplus(
            dt_in + mp["dt_bias"]["weight"].astype(jnp.float32)[None])
        a = -jnp.exp(mp["A_log"]["weight"].astype(jnp.float32))
        da = jnp.exp(dt * a[None])
        ssm = (ssm * da[:, :, None, None]
               + (dt[:, :, None] * xh)[..., None] * bh[:, :, None, :])
        y = jnp.einsum("bhpn,bhn->bhp", ssm, ch)
        y = y + mp["D"]["weight"].astype(jnp.float32)[None, :, None] * xh
        y = y.reshape(bsz, i)
        # gated RMSNorm: normalize AFTER gating
        y = y * jax.nn.silu(z)
        var = jnp.mean(y * y, axis=-1, keepdims=True)
        y = y * jax.lax.rsqrt(var + cfg.rms_norm_eps)
        y = y * mp["norm"]["weight"].astype(jnp.float32)[None]
        out = jnp.dot(y.astype(x.dtype), mp["out_proj"]["weight"],
                      preferred_element_type=jnp.float32)
        if "bias" in mp["out_proj"]:
            out = out + mp["out_proj"]["bias"].astype(jnp.float32)
        new_flat = jnp.concatenate(
            [ssm.reshape(bsz, nh * p * n),
             conv.reshape(bsz, cdim * k)], axis=-1).astype(state.dtype)
        return out.astype(x.dtype), new_flat[:, None, :]

    # -- attention with partial rotary -------------------------------------

    def _attn_layer(self, lp, x, cache, attn_md, decode_mode,
                    decode_pages, tp_axis, positions=None,
                    rope_cache=None):
        cfg = self.cfg
        t = x.shape[0]
        d = cfg.head_dim
        hq, kvh = cfg.num_attention_heads, cfg.num_key_value_heads
        if tp_axis:
            tp = jax.lax.psum(1, tp_axis)
            hq, kvh = hq // tp, kvh // tp
        lm = self.linear_method
        q = lm.apply(lp["q_proj"], x).reshape(t, hq, d)
        k = lm.apply(lp["k_proj"], x).reshape(t, kvh, d)
        v = lm.apply(lp["v_proj"], x).reshape(t, kvh, d)
        rd = rope_cache.shape[-1]
        qr, kr = apply_rope(q[..., :rd], k[..., :rd], positions,
                            rope_cache, "neox")
        q = jnp.concatenate([qr, q[..., rd:]], axis=-1)
        k = jnp.concatenate([kr, k[..., rd:]], axis=-1)
        cache = write_kv_cache(cache, k, v, attn_md["slot_mapping"])
        attn = ragged_paged_attention(
            q, cache, attn_md["kv_lens"], attn_md["page_indices"],
            attn_md["cu_q_lens"], attn_md["num_seqs"],
            sm_scale=1.0 / (d ** 0.5), decode_mode=decode_mode,
            decode_pages=decode_pages)
        o = lm.apply(lp["o_proj"], attn.reshape(t, hq * d))
        if tp_axis:
            o = jax.lax.psum(o, tp_axis)
        return o, cache

    def __call__(self, params, input_ids, positions, kv_caches, attn_md,
                 rope_cache, *, tp_axis=None, lora=None,
                 decode_mode: bool = False, decode_pages=None,
                 mm=None) -> Tuple[jax.Array, list]:
        from vllm_pq_tpu.layers.norm import rms_norm
        cfg = self.cfg
        x = params["embed_tokens"]["weight"][input_ids]
        new_caches = []
        for li, lp in enumerate(params["layers"]):
            h = rms_norm(x, lp["input_layernorm"]["weight"],
                         cfg.rms_norm_eps)
            if cfg.is_attn(li):
                y, cache = self._attn_layer(
                    lp["self_attn"], h, kv_caches[li], attn_md,
                    decode_mode, decode_pages, tp_axis,
                    positions=positions, rope_cache=rope_cache)
            else:
                y, cache = self._mamba_layer(
                    lp["mamba"], h, kv_caches[li], positions, attn_md,
                    decode_mode)
            new_caches.append(cache)
            x = x + y
            h = rms_norm(x, lp["pre_ff_layernorm"]["weight"],
                         cfg.rms_norm_eps)
            x = x + self._ff(lp, li, h, tp_axis)
        x = rms_norm(x, params["final_layernorm"]["weight"],
                     cfg.rms_norm_eps)
        return x, new_caches
