"""Mamba-1 selective-state-space model (role of reference
``models/mamba.py`` + ``layers/mamba/`` + ``csrc/mamba/
selective_scan_fwd.cu`` — rebuilt as a JAX scan).

Serving state is RECURRENT, not paged: each batch row carries, per
layer, a packed f32 state [I, N + d_conv] = (ssm state [I, N] | conv
window [I, d_conv]). The runner allocates these per-row arrays instead
of a paged KV pool (``is_ssm``) and mirrors persistent-batch row moves
into them (InputBatch.condense move list). A token at position 0 resets
its row's state, which covers new requests, row reuse and
recompute-preemption without extra bookkeeping.

Prefill runs the exact sequential recurrence as a ``lax.scan`` over the
flat ragged token axis (carry = all rows' states, one row updated per
step); pure decode batches (token i == row i) use one vectorized step.
"""

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.layers.norm import rms_norm


@dataclass
class MambaConfig:
    vocab_size: int = 50280
    hidden_size: int = 768
    state_size: int = 16
    conv_kernel: int = 4
    expand: int = 2
    num_hidden_layers: int = 24
    time_step_rank: int = 48
    layer_norm_epsilon: float = 1e-5
    use_conv_bias: bool = True
    use_bias: bool = False           # in_proj/out_proj bias
    tie_word_embeddings: bool = True
    # FalconMamba: weightless RMS on the split (dt, B, C) selections
    rms_bcdt: bool = False
    mixer_rms_eps: float = 1e-6
    dtype: Any = jnp.float32

    @property
    def intermediate_size(self):
        return self.expand * self.hidden_size

    # engine-compat aliases
    @property
    def num_attention_heads(self):
        return 1

    @property
    def num_key_value_heads(self):
        return 1

    @property
    def head_dim(self):
        return self.hidden_size

    @classmethod
    def from_hf_config(cls, hf) -> "MambaConfig":
        return cls(
            vocab_size=hf.vocab_size,
            hidden_size=getattr(hf, "hidden_size", 768),
            state_size=getattr(hf, "state_size", 16),
            conv_kernel=getattr(hf, "conv_kernel", 4),
            expand=getattr(hf, "expand", 2),
            num_hidden_layers=getattr(hf, "num_hidden_layers", 24),
            time_step_rank=getattr(hf, "time_step_rank",
                                   (getattr(hf, "hidden_size", 768) + 15)
                                   // 16),
            layer_norm_epsilon=getattr(hf, "layer_norm_epsilon", 1e-5),
            use_conv_bias=getattr(hf, "use_conv_bias", True),
            use_bias=getattr(hf, "use_bias", False),
            tie_word_embeddings=getattr(hf, "tie_word_embeddings", True),
        )


class MambaModel:

    is_ssm = True

    def __init__(self, cfg: MambaConfig, linear_method=None):
        self.cfg = cfg

    # -- templates ----------------------------------------------------------

    def param_shapes(self) -> Dict:
        cfg = self.cfg
        dt = cfg.dtype
        h, i, n = cfg.hidden_size, cfg.intermediate_size, cfg.state_size
        r, k = cfg.time_step_rank, cfg.conv_kernel
        mixer = {
            "in_proj": {"weight": ((h, 2 * i), dt)},
            "conv1d": {"weight": ((i, k), dt)},
            "x_proj": {"weight": ((i, r + 2 * n), dt)},
            "dt_proj": {"weight": ((r, i), dt), "bias": ((i,), dt)},
            "A_log": {"weight": ((i, n), dt)},
            "D": {"weight": ((i,), dt)},
            "out_proj": {"weight": ((i, h), dt)},
        }
        if cfg.use_conv_bias:
            mixer["conv1d"]["bias"] = ((i,), dt)
        if cfg.use_bias:
            mixer["in_proj"]["bias"] = ((2 * i,), dt)
            mixer["out_proj"]["bias"] = ((h,), dt)
        layer = {"norm": {"weight": ((h,), dt)}, "mixer": mixer}
        shapes = {
            "embed_tokens": {"weight": ((cfg.vocab_size, h), dt)},
            "layers": [dict(layer) for _ in range(cfg.num_hidden_layers)],
            "norm": {"weight": ((h,), dt)},
        }
        if not cfg.tie_word_embeddings:
            shapes["lm_head"] = {"weight": ((h, cfg.vocab_size), dt)}
        return shapes

    def param_specs(self) -> Dict:
        return jax.tree.map(
            lambda _: P(), self.param_shapes(),
            is_leaf=lambda v: isinstance(v, tuple) and len(v) == 2
            and isinstance(v[0], tuple))

    # recurrent state instead of a paged KV pool
    def state_shape(self, max_num_reqs: int) -> Tuple:
        cfg = self.cfg
        return (max_num_reqs, cfg.intermediate_size,
                cfg.state_size + cfg.conv_kernel)

    def kv_cache_spec(self) -> P:
        return P(None, None, None)

    def rope_cache(self, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((1, 2), dtype)

    def lora_linear_defs(self):
        return []

    # -- mixer step ---------------------------------------------------------

    def _mixer_step(self, mp: Dict, x: jax.Array, state: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
        """One token for a batch of rows: x [B, H], state
        [B, I, N + k] -> (y [B, H], new state)."""
        cfg = self.cfg
        n, k = cfg.state_size, cfg.conv_kernel
        ssm = state[:, :, :n].astype(jnp.float32)        # [B, I, N]
        conv = state[:, :, n:]                           # [B, I, k]

        proj = jnp.dot(x, mp["in_proj"]["weight"],
                       preferred_element_type=jnp.float32)
        if "bias" in mp["in_proj"]:
            proj = proj + mp["in_proj"]["bias"].astype(jnp.float32)
        hs, gate = jnp.split(proj.astype(x.dtype), 2, axis=-1)  # [B, I]

        # rolling causal conv window
        conv = jnp.concatenate(
            [conv[:, :, 1:], hs.astype(conv.dtype)[:, :, None]], axis=-1)
        u = jnp.sum(conv.astype(jnp.float32)
                    * mp["conv1d"]["weight"].astype(jnp.float32)[None],
                    axis=-1)
        if "bias" in mp["conv1d"]:
            u = u + mp["conv1d"]["bias"].astype(jnp.float32)
        u = jax.nn.silu(u)                               # [B, I] f32

        sp = jnp.dot(u.astype(x.dtype), mp["x_proj"]["weight"],
                     preferred_element_type=jnp.float32)  # [B, r+2N]
        r = cfg.time_step_rank
        dt_in, b, c = sp[:, :r], sp[:, r:r + n], sp[:, r + n:]
        if cfg.rms_bcdt:
            # FalconMamba: weightless RMS over each selection
            # (reference falcon_mamba rms_forward)
            def _rms(v):
                var = jnp.mean(v * v, axis=-1, keepdims=True)
                return v * jax.lax.rsqrt(var + cfg.mixer_rms_eps)
            dt_in, b, c = _rms(dt_in), _rms(b), _rms(c)
        dt = jnp.dot(dt_in.astype(x.dtype), mp["dt_proj"]["weight"],
                     preferred_element_type=jnp.float32) \
            + mp["dt_proj"]["bias"].astype(jnp.float32)
        dt = jax.nn.softplus(dt)                         # [B, I]
        a = -jnp.exp(mp["A_log"]["weight"].astype(jnp.float32))  # [I, N]
        da = jnp.exp(a[None] * dt[:, :, None])           # [B, I, N]
        db_u = (dt[:, :, None] * b[:, None, :]) * u[:, :, None]
        ssm = ssm * da + db_u
        y = jnp.einsum("bin,bn->bi", ssm, c)             # [B, I]
        y = y + mp["D"]["weight"].astype(jnp.float32)[None] * u
        y = y * jax.nn.silu(gate.astype(jnp.float32))
        out = jnp.dot(y.astype(x.dtype), mp["out_proj"]["weight"],
                      preferred_element_type=jnp.float32)
        if "bias" in mp["out_proj"]:
            out = out + mp["out_proj"]["bias"].astype(jnp.float32)
        new_state = jnp.concatenate(
            [ssm.astype(state.dtype), conv.astype(state.dtype)], axis=-1)
        return out.astype(x.dtype), new_state

    # -- forward ------------------------------------------------------------

    def __call__(self, params, input_ids, positions, kv_caches, attn_md,
                 rope_cache, *, tp_axis=None, lora=None,
                 decode_mode: bool = False, decode_pages=None,
                 mm=None) -> Tuple[jax.Array, List[jax.Array]]:
        cfg = self.cfg
        t = input_ids.shape[0]
        s = kv_caches[0].shape[0]
        x = params["embed_tokens"]["weight"][input_ids]  # [T, H]

        if decode_mode:
            # token i == row i: one vectorized recurrent step
            xs = x[:s] if t >= s else jnp.pad(x, ((0, s - t), (0, 0)))
            reset = (positions[:s] if t >= s
                     else jnp.pad(positions, (0, s - t))) == 0
            new_caches = []
            h = xs
            outs = h
            for li, lp in enumerate(params["layers"]):
                st = jnp.where(reset[:, None, None], 0.0, kv_caches[li])
                hn = rms_norm(outs, lp["norm"]["weight"],
                              cfg.layer_norm_epsilon)
                y, st = self._mixer_step(lp["mixer"], hn, st)
                outs = outs + y
                new_caches.append(st)
            outs = rms_norm(outs, params["norm"]["weight"],
                            cfg.layer_norm_epsilon)
            if t > s:
                outs = jnp.pad(outs, ((0, t - s), (0, 0)))
            elif t < s:
                outs = outs[:t]
            return outs, new_caches

        # ragged prefill: exact sequential scan over the flat tokens;
        # carry = every row's state for every layer (stacked)
        cu = attn_md["cu_q_lens"]
        tok = jnp.arange(t, dtype=jnp.int32)
        seq_of_tok = jnp.sum((tok[None, :] >= cu[1:][:, None])
                             .astype(jnp.int32), axis=0)
        seq_of_tok = jnp.minimum(seq_of_tok, s - 1)
        states0 = jnp.stack(kv_caches)                  # [L, S, I, N+k]

        def step(states, inp):
            xt, row, pos = inp
            reset = pos == 0
            h = xt[None]                                 # [1, H]
            out = h
            new_rows = []
            for li, lp in enumerate(params["layers"]):
                st = states[li, row][None]               # [1, I, N+k]
                st = jnp.where(reset, jnp.zeros_like(st), st)
                hn = rms_norm(out, lp["norm"]["weight"],
                              cfg.layer_norm_epsilon)
                y, st = self._mixer_step(lp["mixer"], hn, st)
                out = out + y
                new_rows.append(st[0])
            states = states.at[:, row].set(jnp.stack(new_rows))
            return states, out[0]

        states, hidden = jax.lax.scan(
            step, states0, (x, seq_of_tok, positions))
        hidden = rms_norm(hidden, params["norm"]["weight"],
                          cfg.layer_norm_epsilon)
        return hidden, [states[li]
                        for li in range(cfg.num_hidden_layers)]

    def compute_logits(self, params, hidden, tp_axis=None) -> jax.Array:
        if self.cfg.tie_word_embeddings or "lm_head" not in params:
            w = params["embed_tokens"]["weight"]
            return jnp.dot(hidden, w.T,
                           preferred_element_type=jnp.float32)
        return jnp.dot(hidden, params["lm_head"]["weight"],
                       preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Mamba-2 (SSD): scalar-per-head A, grouped B/C, gated RMSNorm
# (role of reference models/mamba2.py + mamba_ssm v2 kernels)
# ---------------------------------------------------------------------------


@dataclass
class Mamba2Config(MambaConfig):
    num_heads: int = 8
    head_dim: int = 64          # P
    n_groups: int = 1           # G
    norm_eps: float = 1e-5

    @property
    def intermediate_size(self):
        return self.num_heads * self.head_dim

    @property
    def conv_dim(self):
        return (self.intermediate_size
                + 2 * self.n_groups * self.state_size)

    @classmethod
    def from_hf_config(cls, hf) -> "Mamba2Config":
        return cls(
            vocab_size=hf.vocab_size,
            hidden_size=getattr(hf, "hidden_size", 768),
            state_size=getattr(hf, "state_size", 128),
            conv_kernel=getattr(hf, "conv_kernel", 4),
            num_hidden_layers=getattr(hf, "num_hidden_layers", 24),
            layer_norm_epsilon=getattr(hf, "layer_norm_epsilon", 1e-5),
            use_conv_bias=getattr(hf, "use_conv_bias", True),
            use_bias=getattr(hf, "use_bias", False),
            tie_word_embeddings=getattr(hf, "tie_word_embeddings", False),
            num_heads=getattr(hf, "num_heads", 8),
            head_dim=getattr(hf, "head_dim", 64),
            n_groups=getattr(hf, "n_groups", 1),
        )


class Mamba2Model(MambaModel):

    def __init__(self, cfg: Mamba2Config, linear_method=None):
        self.cfg = cfg

    def param_shapes(self) -> Dict:
        cfg = self.cfg
        dt = cfg.dtype
        h, i = cfg.hidden_size, cfg.intermediate_size
        nh, k = cfg.num_heads, cfg.conv_kernel
        cdim = cfg.conv_dim
        mixer = {
            # z | xBC | dt
            "in_proj": {"weight": ((h, i + cdim + nh), dt)},
            "conv1d": {"weight": ((cdim, k), dt)},
            "dt_bias": {"weight": ((nh,), dt)},
            "A_log": {"weight": ((nh,), dt)},
            "D": {"weight": ((nh,), dt)},
            "norm": {"weight": ((i,), dt)},     # gated RMSNorm
            "out_proj": {"weight": ((i, h), dt)},
        }
        if cfg.use_conv_bias:
            mixer["conv1d"]["bias"] = ((cdim,), dt)
        if cfg.use_bias:
            mixer["in_proj"]["bias"] = ((i + cdim + nh,), dt)
            mixer["out_proj"]["bias"] = ((h,), dt)
        layer = {"norm": {"weight": ((h,), dt)}, "mixer": mixer}
        shapes = {
            "embed_tokens": {"weight": ((cfg.vocab_size, h), dt)},
            "layers": [dict(layer) for _ in range(cfg.num_hidden_layers)],
            "norm": {"weight": ((h,), dt)},
        }
        if not cfg.tie_word_embeddings:
            shapes["lm_head"] = {"weight": ((h, cfg.vocab_size), dt)}
        return shapes

    def state_shape(self, max_num_reqs: int) -> Tuple:
        # flat per-row state: ssm [H, P, N] | conv window [conv_dim, k]
        cfg = self.cfg
        flat = (cfg.num_heads * cfg.head_dim * cfg.state_size
                + cfg.conv_dim * cfg.conv_kernel)
        return (max_num_reqs, 1, flat)

    def kv_cache_spec(self) -> P:
        return P(None, None, None)

    def _mixer_step(self, mp: Dict, x: jax.Array, state: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
        """One token for a batch of rows: x [B, H], state
        [B, 1, flat] -> (y [B, H], new state)."""
        cfg = self.cfg
        nh, p, n = cfg.num_heads, cfg.head_dim, cfg.state_size
        g, k = cfg.n_groups, cfg.conv_kernel
        i = cfg.intermediate_size
        cdim = cfg.conv_dim
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
        u = jax.nn.silu(u)                                # [B, conv_dim]

        xh = u[:, :i].reshape(bsz, nh, p)                 # [B, H, P]
        b = u[:, i:i + g * n].reshape(bsz, g, n)
        c = u[:, i + g * n:].reshape(bsz, g, n)
        rep = nh // g
        bh = jnp.repeat(b, rep, axis=1)                   # [B, H, N]
        ch = jnp.repeat(c, rep, axis=1)

        dt = jax.nn.softplus(
            dt_in + mp["dt_bias"]["weight"].astype(jnp.float32)[None])
        a = -jnp.exp(mp["A_log"]["weight"].astype(jnp.float32))  # [H]
        da = jnp.exp(dt * a[None])                        # [B, H]
        ssm = (ssm * da[:, :, None, None]
               + (dt[:, :, None] * xh)[..., None] * bh[:, :, None, :])
        y = jnp.einsum("bhpn,bhn->bhp", ssm, ch)
        y = y + mp["D"]["weight"].astype(jnp.float32)[None, :, None] * xh
        y = y.reshape(bsz, i)
        # gated RMSNorm (MambaRMSNormGated): normalize AFTER gating
        y = y * jax.nn.silu(z)
        var = jnp.mean(y * y, axis=-1, keepdims=True)
        y = y * jax.lax.rsqrt(var + cfg.norm_eps)
        y = y * mp["norm"]["weight"].astype(jnp.float32)[None]
        out = jnp.dot(y.astype(x.dtype), mp["out_proj"]["weight"],
                      preferred_element_type=jnp.float32)
        if "bias" in mp["out_proj"]:
            out = out + mp["out_proj"]["bias"].astype(jnp.float32)
        new_flat = jnp.concatenate(
            [ssm.reshape(bsz, nh * p * n),
             conv.reshape(bsz, cdim * k)], axis=-1).astype(state.dtype)
        return out.astype(x.dtype), new_flat[:, None, :]
