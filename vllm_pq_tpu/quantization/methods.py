"""Linear-layer compute methods (unquantized / PQ / int8).

Each method is stateless and pure:
- ``param_shapes``     : name -> (shape, dtype) for a [in, out] linear
- ``partition_specs``  : name -> PartitionSpec for "column" (shard out)
                         or "row" (shard in) tensor parallelism
- ``apply``            : params, x [T, in] -> y [T, out] (no collectives;
                         the caller psums row-parallel outputs)
- ``quantize``         : dense W [in, out] -> params (loader/converter)

TP sharding of PQ artifacts follows the reference's shard handling for
quantized params (``linear.py:370-417``, pack_factor divisibility
``aqlm.py:240-251``): codes shard with the weight (out on lanes for
column-parallel, input groups for row-parallel), codebooks replicate,
scales shard with out.
"""

from abc import ABC, abstractmethod
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.quantization.pq import (PQConfig, pq_param_shapes,
                                         pq_quantize_weight)

# mesh axis carrying tensor parallelism
TP_AXIS = "model"


class LinearMethod(ABC):

    @abstractmethod
    def param_shapes(self, in_features: int, out_features: int,
                     dtype) -> Dict[str, Tuple]:
        ...

    @abstractmethod
    def partition_specs(self, shard: str) -> Dict[str, P]:
        ...

    @abstractmethod
    def apply(self, params: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
        ...

    @abstractmethod
    def quantize(self, w: np.ndarray, dtype) -> Dict[str, np.ndarray]:
        """w: dense [in, out] numpy array -> method params."""
        ...


class UnquantizedLinearMethod(LinearMethod):

    def param_shapes(self, in_features, out_features, dtype):
        return {"weight": ((in_features, out_features), dtype)}

    def partition_specs(self, shard):
        if shard == "column":
            return {"weight": P(None, TP_AXIS)}
        if shard == "row":
            return {"weight": P(TP_AXIS, None)}
        return {"weight": P(None, None)}

    def apply(self, params, x):
        return jnp.dot(x, params["weight"],
                       preferred_element_type=jnp.float32).astype(x.dtype)

    def quantize(self, w, dtype):
        return {"weight": np.asarray(w, dtype=np.dtype(dtype))}


class Int8LinearMethod(LinearMethod):
    """Weight-only int8 with per-output-channel absmax scales (role of
    reference tpu_int8, ``quantization/tpu_int8.py:78-116``)."""

    def param_shapes(self, in_features, out_features, dtype):
        return {
            "weight": ((in_features, out_features), jnp.int8),
            "scale": ((out_features,), jnp.float32),
        }

    def partition_specs(self, shard):
        if shard == "column":
            return {"weight": P(None, TP_AXIS), "scale": P(TP_AXIS)}
        if shard == "row":
            return {"weight": P(TP_AXIS, None), "scale": P(None)}
        return {"weight": P(None, None), "scale": P(None)}

    def apply(self, params, x):
        import vllm_pq_tpu.envs as envs
        from vllm_pq_tpu.ops.int8_matmul import int8_matmul, supported
        mode = envs.VPQ_INT8_MM
        if (mode != "0" and supported(x.shape[-1])
                and (jax.default_backend() == "tpu" or mode == "1")):
            # Pallas w8a16: weights stream as raw int8 with in-register
            # dequant (XLA's astype+dot materializes the bf16 copy)
            return int8_matmul(x, params["weight"], params["scale"],
                               interpret=jax.default_backend() != "tpu")
        w = params["weight"].astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return (y * params["scale"][None, :]).astype(x.dtype)

    def quantize(self, w, dtype):
        w = np.asarray(w, dtype=np.float32)
        scale = np.abs(w).max(axis=0) / 127.0 + 1e-8
        q = np.clip(np.round(w / scale[None, :]), -128, 127).astype(np.int8)
        return {"weight": q, "scale": scale.astype(np.float32)}


class Int4LinearMethod(LinearMethod):
    """Weight-only 4-bit with per-group scales + zero points (the role of
    the reference's GPTQ/AWQ/Marlin/Machete kernel family,
    ``csrc/quantization/{gptq,awq,marlin,machete}`` — one dequant-matmul
    covers them all on TPU; packed nibbles stream at 0.5 byte/weight).

    Layout: ``qweight [in/2, out] uint8`` (two input-dim nibbles per
    byte: even rows in the low nibble), ``scales [in/g, out]``,
    ``zeros [in/g, out]`` (float zero point, AWQ-style asymmetric).
    """

    def __init__(self, group_size: int = 128):
        self.group_size = group_size

    @classmethod
    def from_config(cls, d: dict) -> "Int4LinearMethod":
        return cls(group_size=d.get("group_size", 128))

    def param_shapes(self, in_features, out_features, dtype):
        g = min(self.group_size, in_features)
        assert in_features % 2 == 0
        assert in_features % g == 0
        return {
            "qweight": ((in_features // 2, out_features), jnp.uint8),
            "scales": ((in_features // g, out_features), jnp.float32),
            "zeros": ((in_features // g, out_features), jnp.float32),
        }

    def partition_specs(self, shard):
        if shard == "column":
            return {"qweight": P(None, TP_AXIS), "scales": P(None, TP_AXIS),
                    "zeros": P(None, TP_AXIS)}
        if shard == "row":
            return {"qweight": P(TP_AXIS, None), "scales": P(TP_AXIS, None),
                    "zeros": P(TP_AXIS, None)}
        return {"qweight": P(None, None), "scales": P(None, None),
                "zeros": P(None, None)}

    def _dequant(self, params, dtype):
        qw = params["qweight"]
        i2, o = qw.shape
        lo = (qw & 0x0F).astype(jnp.int32)
        hi = (qw >> 4).astype(jnp.int32)
        # interleave back to [in, out]
        q = jnp.stack([lo, hi], axis=1).reshape(i2 * 2, o)
        g = (i2 * 2) // params["scales"].shape[0]
        qf = q.astype(jnp.float32).reshape(-1, g, o)
        w = (qf - params["zeros"][:, None, :]) * params["scales"][:, None, :]
        return w.reshape(i2 * 2, o).astype(dtype)

    def apply(self, params, x):
        w = self._dequant(params, x.dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(
            x.dtype)

    def quantize(self, w, dtype):
        w = np.asarray(w, np.float32)
        i, o = w.shape
        g = min(self.group_size, i)
        wg = w.reshape(i // g, g, o)
        wmin = wg.min(axis=1)
        wmax = wg.max(axis=1)
        scale = (wmax - wmin) / 15.0 + 1e-8
        zero = -wmin / scale
        q = np.clip(np.round(wg / scale[:, None, :] + zero[:, None, :]),
                    0, 15).astype(np.uint8).reshape(i, o)
        packed = (q[0::2] | (q[1::2] << 4)).astype(np.uint8)
        return {"qweight": packed, "scales": scale.astype(np.float32),
                "zeros": zero.astype(np.float32)}


class Int8W8A8LinearMethod(LinearMethod):
    """Dynamic per-token int8 activations x per-channel int8 weights
    (role of reference compressed-tensors w8a8,
    ``csrc/quantization/compressed_tensors/int8_quant_kernels.cu`` +
    cutlass w8a8 — on TPU the int8xint8->int32 dot is MXU-native)."""

    def param_shapes(self, in_features, out_features, dtype):
        return {
            "weight": ((in_features, out_features), jnp.int8),
            "scale": ((out_features,), jnp.float32),
        }

    def partition_specs(self, shard):
        if shard == "column":
            return {"weight": P(None, TP_AXIS), "scale": P(TP_AXIS)}
        if shard == "row":
            return {"weight": P(TP_AXIS, None), "scale": P(None)}
        return {"weight": P(None, None), "scale": P(None)}

    def apply(self, params, x):
        # dynamic per-token absmax quantization of activations, fused
        # absmax+round in one Pallas pass on TPU (ops/act_quant.py)
        from vllm_pq_tpu.ops.act_quant import quantize_rows_auto
        xq, sx = quantize_rows_auto(x)
        acc = jax.lax.dot_general(
            xq, params["weight"],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx * params["scale"][None, :]
        return y.astype(x.dtype)

    def quantize(self, w, dtype):
        w = np.asarray(w, np.float32)
        scale = np.abs(w).max(axis=0) / 127.0 + 1e-8
        q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
        return {"weight": q, "scale": scale.astype(np.float32)}


class PQLinearMethod(LinearMethod):
    """Product-quantized linear. Fast paths live in
    ``vllm_pq_tpu.ops.pq_matmul`` (Pallas); this applies them with an XLA
    fallback, mirroring the reference's GEMV/dequant crossover
    (``aqlm.py:344-364``)."""

    def __init__(self, cfg: PQConfig):
        self.cfg = cfg

    @classmethod
    def from_config(cls, d: dict) -> "PQLinearMethod":
        return cls(PQConfig.from_dict(d))

    def param_shapes(self, in_features, out_features, dtype):
        return pq_param_shapes(self.cfg, in_features, out_features)

    def partition_specs(self, shard):
        if shard == "column":
            return {
                "codes": P(None, None, TP_AXIS),
                "codebooks": P(None, None, None),
                "scales": P(TP_AXIS),
            }
        if shard == "row":
            return {
                "codes": P(None, TP_AXIS, None),
                "codebooks": P(None, None, None),
                "scales": P(None),
            }
        return {
            "codes": P(None, None, None),
            "codebooks": P(None, None, None),
            "scales": P(None),
        }

    def apply(self, params, x):
        if "weight" in params:
            # multi-step window dequant replaced the codes with a dense
            # bf16 weight (runner._build_multistep); matmul at MXU speed
            return jnp.dot(x, params["weight"],
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)
        from vllm_pq_tpu.ops.pq_matmul import pq_matmul
        return pq_matmul(x, params["codes"], params["codebooks"],
                         params["scales"])

    def dequantize(self, params, dtype) -> jax.Array:
        """Dense [in, out] weight for the window-dequant cache."""
        from vllm_pq_tpu.ops.pq_matmul import pq_dequantize
        return pq_dequantize(params["codes"], params["codebooks"],
                             params["scales"], out_dtype=dtype)

    def quantize(self, w, dtype):
        return pq_quantize_weight(np.asarray(w, np.float32), self.cfg)
