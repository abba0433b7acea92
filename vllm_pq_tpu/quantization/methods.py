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
        w = params["weight"].astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return (y * params["scale"][None, :]).astype(x.dtype)

    def quantize(self, w, dtype):
        w = np.asarray(w, dtype=np.float32)
        scale = np.abs(w).max(axis=0) / 127.0 + 1e-8
        q = np.clip(np.round(w / scale[None, :]), -128, 127).astype(np.int8)
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
        from vllm_pq_tpu.ops.pq_matmul import pq_matmul
        return pq_matmul(x, params["codes"], params["codebooks"],
                         params["scales"])

    def quantize(self, w, dtype):
        return pq_quantize_weight(np.asarray(w, np.float32), self.cfg)
