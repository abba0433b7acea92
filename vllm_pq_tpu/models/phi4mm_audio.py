"""Phi-4-multimodal audio encoder — role of reference
``model_executor/models/phi4mm_audio.py`` + ``phi4mm_utils.py``.

Composition (the branch set Phi-4-MM's ``audio_processor.config``
exercises): MeanVarianceNorm → NeMo dw-striding conv subsampling
(time_reduction 8) → N conformer blocks (half-step GLU feed-forwards,
multi-head attention with a T5 relative-position logit bias, GLU
pointwise + depthwise-separable conv module, all-swish) → LayerNorm →
2-layer GELU projector to the decoder width. Long inputs unfold into
``max_seq_len``-frame chunks exactly like the reference (attention
never crosses a 500-frame chunk).

Everything is implemented against the reference MATH (shapes, padding
and trim conventions read from the module code); the tests golden it
against an independently composed torch replica.
"""

import math
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _swish(x):
    return x * jax.nn.sigmoid(x)


_ACT = {"relu": jax.nn.relu, "swish": _swish,
        "sigmoid": jax.nn.sigmoid,
        "gelu": lambda x: jax.nn.gelu(x, approximate=False)}


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)
            * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _linp(p, u):
    y = jnp.dot(u, p["weight"], preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(u.dtype)


def _conv1d(x, w, b, *, stride=1, pad=(0, 0), groups=1):
    """x [B, C, T]; w [kT, Cin/groups, Cout] (HWIO-1d)."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32)[:, :, :, None],
        w.astype(jnp.float32)[:, None],        # [kT, 1, Cin/g, Cout]
        window_strides=(stride, 1), padding=(pad, (0, 0)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=groups)[:, :, :, 0]
    if b is not None:
        out = out + b.astype(jnp.float32)[None, :, None]
    return out.astype(x.dtype)


def _conv2d(x, w, b, *, stride, pad, groups=1):
    """x [B, C, T, F]; w [kT, kF, Cin/groups, Cout]."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(stride, stride), padding=(pad, pad),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=groups)
    if b is not None:
        out = out + b.astype(jnp.float32)[None, :, None, None]
    return out.astype(x.dtype)


@dataclass
class ConformerConfig:
    """Mirrors the fields Phi-4-MM ships in
    ``config.audio_processor["config"]`` (reference ConformerEncoder
    kwargs)."""
    input_size: int = 80
    attention_dim: int = 1024
    attention_heads: int = 16
    linear_units: int = 1536
    num_blocks: int = 24
    kernel_size: int = 3
    ext_pw_out_channel: int = 1024
    ext_pw_kernel_size: int = 2
    depthwise_seperable_out_channel: int = 1024
    depthwise_multiplier: int = 1
    causal: bool = True
    batch_norm: bool = False
    activation: str = "swish"
    conv_activation: str = "swish"
    conv_glu_type: str = "swish"
    bias_in_glu: bool = True
    time_reduction: int = 8
    chunk_size: int = -1
    left_chunk: int = 18
    nemo_conv_channels: int = 1024
    nemo_is_causal: bool = False
    nemo_activation: str = "relu"
    t5_max_distance: int = 500
    t5_symmetric: bool = False
    t5_skip_bucketing: bool = True
    max_seq_len: int = 500       # unfold window (reference: 500)

    @classmethod
    def from_hf(cls, raw: Dict) -> "ConformerConfig":
        nemo = raw.get("nemo_conv_settings", {}) or {}
        rab = raw.get("relative_attention_bias_args", {}) or {}
        ec = raw.get("encoder_embedding_config", {}) or {}
        return cls(
            input_size=ec.get("input_size", raw.get("input_size", 80)),
            attention_dim=raw.get("attention_dim", 1024),
            attention_heads=raw.get("attention_heads", 16),
            linear_units=raw.get("linear_units", 1536),
            num_blocks=raw.get("num_blocks", 24),
            kernel_size=raw.get("kernel_size", 3),
            ext_pw_out_channel=raw.get("ext_pw_out_channel", 1024),
            ext_pw_kernel_size=raw.get("ext_pw_kernel_size", 2),
            depthwise_seperable_out_channel=raw.get(
                "depthwise_seperable_out_channel", 1024),
            depthwise_multiplier=raw.get("depthwise_multiplier", 1),
            causal=raw.get("causal", True),
            batch_norm=raw.get("batch_norm", False),
            activation=raw.get("activation", "swish"),
            conv_activation=raw.get("conv_activation", "swish"),
            conv_glu_type=raw.get("conv_glu_type", "swish"),
            bias_in_glu=raw.get("bias_in_glu", True),
            time_reduction=raw.get("time_reduction", 8),
            chunk_size=raw.get("chunk_size", -1),
            left_chunk=raw.get("left_chunk", 18),
            nemo_conv_channels=nemo.get("conv_channels", 1024),
            nemo_is_causal=nemo.get("is_causal", False),
            nemo_activation=nemo.get("activation", "relu"),
            t5_max_distance=rab.get("t5_bias_max_distance", 500),
            t5_symmetric=rab.get("t5_bias_symmetric", False),
            t5_skip_bucketing=rab.get("t5_skip_bucketing", True),
        )


class Phi4MMAudioEncoder:
    """Pure-function conformer encoder: params in, features out."""

    def __init__(self, cfg: ConformerConfig, text_hidden: int):
        self.cfg = cfg
        self.text_hidden = text_hidden
        self.n_sub = int(math.log2(cfg.time_reduction))

    # -- parameter templates -------------------------------------------------

    def param_shapes(self, dt="float32") -> Dict:
        c = self.cfg
        d = c.attention_dim
        ch = c.nemo_conv_channels
        k = 3  # nemo subsampling kernel

        def lin(i, o, bias=True):
            p = {"weight": ((i, o), dt)}
            if bias:
                p["bias"] = ((o,), dt)
            return p

        def ln(n):
            return {"weight": ((n,), dt), "bias": ((n,), dt)}

        # NeMo dw_striding: conv2d (1->ch, k3 s2) then (n_sub-1) x
        # [depthwise ch k3 s2, pointwise ch 1x1], then Linear out
        nemo_layers = [{"weight": ((k, k, 1, ch), dt),
                        "bias": ((ch,), dt)}]
        for _ in range(self.n_sub - 1):
            nemo_layers.append({"weight": ((k, k, 1, ch), dt),
                                "bias": ((ch,), dt)})    # depthwise
            nemo_layers.append({"weight": ((1, 1, ch, ch), dt),
                                "bias": ((ch,), dt)})    # pointwise
        f_out = c.input_size
        for _ in range(self.n_sub):
            f_out = (f_out + 2 * ((k - 1) // 2) - k) // 2 + 1
        nemo = {"layers": nemo_layers,
                "out": lin(ch * f_out, d)}

        dwm = c.depthwise_multiplier
        ds_out = c.depthwise_seperable_out_channel
        block = {
            "ff_in": {"ln": ln(d), "glu": lin(d, 2 * c.linear_units),
                      "out": lin(c.linear_units, d)},
            "ln_att": ln(d),
            "attn": {"q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
                     "out": lin(d, d)},
            "conv": {
                "ln": ln(d),
                # GLUPointWiseConv: conv1d d -> 2*ext_pw, k=ext_k
                "glu_w": {"weight": ((c.ext_pw_kernel_size, d,
                                      2 * c.ext_pw_out_channel), dt),
                          "bias": ((2 * c.ext_pw_out_channel,), dt)},
                "glu_b1": {"weight": ((c.ext_pw_out_channel,), dt)},
                "glu_b2": {"weight": ((c.ext_pw_out_channel,), dt)},
                "dw": {"weight": ((c.kernel_size, 1, d * dwm), dt),
                       "bias": ((d * dwm,), dt)},
                "pw": {"weight": ((1, d * dwm, ds_out), dt),
                       "bias": ((ds_out,), dt)},
                "ext_pw": {"weight": ((c.ext_pw_kernel_size, d,
                                       c.ext_pw_out_channel), dt),
                           "bias": ((c.ext_pw_out_channel,), dt)},
            },
            "ff_out": {"ln": ln(d), "glu": lin(d, 2 * c.linear_units),
                       "out": lin(c.linear_units, d)},
            "ln": ln(d),
        }
        n_bias = (c.t5_max_distance if c.t5_skip_bucketing else 320)
        if not c.t5_symmetric:
            n_bias *= 2
        return {
            "mean": {"weight": ((c.input_size,), dt)},
            "invstd": {"weight": ((c.input_size,), dt)},
            "nemo": nemo,
            "blocks": [jax.tree.map(lambda v: v, block,
                                    is_leaf=lambda v: isinstance(
                                        v, tuple))
                       for _ in range(c.num_blocks)],
            "t5_bias": {"weight": ((n_bias, c.attention_heads), dt)},
            "proj": {
                "linear_1": lin(d, self.text_hidden),
                "linear_2": lin(self.text_hidden, self.text_hidden),
            },
        }

    # -- forward -------------------------------------------------------------

    def _nemo_subsample(self, p, x):
        """x [B, T, F] -> [B, ceil(T / reduction), d]."""
        c = self.cfg
        act = _ACT[c.nemo_activation]
        k = 3
        pad = (k - 1) // 2
        h = x[:, None]                        # [B, 1, T, F]
        li = 0
        h = act(_conv2d(h, p["layers"][li]["weight"],
                        p["layers"][li]["bias"], stride=2,
                        pad=(pad, pad)))
        li += 1
        ch = c.nemo_conv_channels
        for _ in range(self.n_sub - 1):
            h = _conv2d(h, p["layers"][li]["weight"],
                        p["layers"][li]["bias"], stride=2,
                        pad=(pad, pad), groups=ch)
            li += 1
            h = act(_conv2d(h, p["layers"][li]["weight"],
                            p["layers"][li]["bias"], stride=1,
                            pad=(0, 0)))
            li += 1
        b, cc, t, f = h.shape
        h = h.transpose(0, 2, 1, 3).reshape(b, t, cc * f)
        return _linp(p["out"], h)

    def _t5_bias(self, p, t: int) -> jax.Array:
        c = self.cfg
        ctx = np.arange(t)[:, None]
        mem = np.arange(t)[None, :]
        rel = np.clip(mem - ctx, -c.t5_max_distance,
                      c.t5_max_distance - 1)
        n_buckets = (c.t5_max_distance if c.t5_skip_bucketing else 320)
        if c.t5_symmetric:
            idx = np.abs(rel)
        else:
            idx = rel + n_buckets
        bias = p["weight"][jnp.asarray(idx)]        # [t, t, H]
        return bias.transpose(2, 0, 1)[None]        # [1, H, t, t]

    def _glu(self, u, act_name):
        half = u.shape[-1] // 2
        a, b = u[..., :half], u[..., half:]
        return a * _ACT[act_name](b.astype(jnp.float32)).astype(b.dtype)

    def _feed_forward(self, p, x, act_name):
        h = _ln(x, p["ln"])
        h = self._glu(_linp(p["glu"], h), act_name)
        return _linp(p["out"], h)

    def _attention(self, p, x, bias, mask):
        c = self.cfg
        b, t, d = x.shape
        h = c.attention_heads
        dk = d // h
        q = _linp(p["q"], x).reshape(b, t, h, dk) * (dk ** -0.5)
        k = _linp(p["k"], x).reshape(b, t, h, dk)
        v = _linp(p["v"], x).reshape(b, t, h, dk)
        sc = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32))
        sc = sc + bias.astype(jnp.float32)
        if mask is not None:
            sc = jnp.where(mask[:, None], sc, -1e30)
        pr = jax.nn.softmax(sc, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", pr.astype(v.dtype), v)
        return _linp(p["out"], ctx.reshape(b, t, d))

    def _conv_module(self, p, x):
        c = self.cfg
        xn = _ln(x, p["ln"])                       # [B, T, D]
        xc = xn.transpose(0, 2, 1)                 # [B, D, T]
        # torch pads symmetrically (nn.Conv1d padding=k-1) and the
        # causal path trims the RIGHT overhang after the conv
        ek = c.ext_pw_kernel_size
        pad = ((ek - 1, ek - 1) if c.causal
               else ((ek - 1) // 2, (ek - 1) // 2))
        g = _conv1d(xc, p["glu_w"]["weight"], p["glu_w"]["bias"],
                    pad=pad)
        g = g.transpose(0, 2, 1)                   # [B, T', 2*ext]
        out_dim = c.ext_pw_out_channel
        a = g[..., :out_dim] + p["glu_b1"]["weight"]
        bb = g[..., out_dim:] + p["glu_b2"]["weight"]
        g = a * _ACT[c.conv_glu_type](bb.astype(jnp.float32)) \
            .astype(bb.dtype)
        if c.causal and ek > 1:
            g = g[:, :-(ek - 1)]
        elif not c.causal and ek > 1:
            pass
        h = g.transpose(0, 2, 1)                   # [B, D, T]
        kk = c.kernel_size
        dpad = ((kk - 1, kk - 1) if c.causal
                else ((kk - 1) // 2, (kk - 1) // 2))
        h = _conv1d(h, p["dw"]["weight"], p["dw"]["bias"], pad=dpad,
                    groups=h.shape[1])
        h = _conv1d(h, p["pw"]["weight"], p["pw"]["bias"])
        if c.causal and kk > 1:
            h = h[:, :, :-(kk - 1)]
        h = _ACT[c.conv_activation](
            h.astype(jnp.float32)).astype(h.dtype)
        h = _conv1d(h, p["ext_pw"]["weight"], p["ext_pw"]["bias"],
                    pad=pad)
        if c.causal and ek > 1:
            h = h[:, :, :-(ek - 1)]
        return h.transpose(0, 2, 1)

    def _streaming_mask(self, t: int) -> Optional[np.ndarray]:
        c = self.cfg
        if c.chunk_size is None or c.chunk_size <= 0:
            return None
        starts = np.arange(0, t, c.chunk_size)
        start_pad = np.concatenate([[0], starts])
        end_pad = np.concatenate([starts, [t]])
        seq = np.arange(t)
        idx = ((seq[:, None] < end_pad[None])
               & (seq[:, None] >= start_pad[None])).argmax(axis=1)
        idx_left = np.maximum(idx - c.left_chunk, 0)
        bound_left = start_pad[idx_left]
        mask_left = seq[None, :] >= bound_left[:, None]
        idx_right = np.minimum(idx, len(starts))
        bound_right = end_pad[idx_right]
        mask_right = seq[None, :] < bound_right[:, None]
        return mask_left & mask_right

    def __call__(self, params: Dict, mel: jax.Array) -> jax.Array:
        """mel [T, n_mels] (one audio) -> projected features
        [ceil(T / time_reduction), text_hidden]."""
        c = self.cfg
        x = (mel - params["mean"]["weight"]) \
            * params["invstd"]["weight"]
        x = self._nemo_subsample(params["nemo"], x[None])  # [1, T', d]
        t = x.shape[1]

        # unfold long sequences into max_seq_len chunks (reference
        # ConformerEncoder.forward)
        msl = c.max_seq_len
        pad_t = (msl - t % msl) % msl if t > msl else 0
        if t > msl:
            x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
            x = x.reshape(-1, msl, x.shape[-1])
        tc = x.shape[1]

        bias = self._t5_bias(params["t5_bias"], tc)
        smask = self._streaming_mask(tc)
        mask = (None if smask is None
                else jnp.asarray(smask)[None])
        for bp in params["blocks"]:
            r = x + 0.5 * self._feed_forward(bp["ff_in"], x,
                                             c.activation)
            r = r + self._attention(bp["attn"],
                                    _ln(r, bp["ln_att"]), bias, mask)
            r = r + self._conv_module(bp["conv"], r)
            r = r + 0.5 * self._feed_forward(bp["ff_out"], r,
                                             c.activation)
            x = _ln(r, bp["ln"])
        if pad_t or x.shape[0] > 1:
            x = x.reshape(1, -1, x.shape[-1])[:, :t]

        pp = params["proj"]
        y = _linp(pp["linear_1"], x[0])
        y = jax.nn.gelu(y.astype(jnp.float32),
                        approximate=False).astype(y.dtype)
        return _linp(pp["linear_2"], y)
