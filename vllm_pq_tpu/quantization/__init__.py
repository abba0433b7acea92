"""Quantization method registry.

Role of the reference's ``layers/quantization/__init__.py:8-73`` registry +
``QuantizeMethodBase``/``QuantizationConfig`` ABCs (``base_config.py``),
redesigned functionally: a *linear method* describes param shapes,
partition specs, and a pure ``apply``; there is no weight mutation — the
converter produces final artifacts offline or at load time.
"""

from typing import Callable, Dict, Optional, Type

from vllm_pq_tpu.quantization.methods import (Int4LinearMethod,
                                              Int8LinearMethod,
                                              Int8W8A8LinearMethod,
                                              LinearMethod, PQLinearMethod,
                                              UnquantizedLinearMethod)

_REGISTRY: Dict[str, Callable[[Optional[dict]], LinearMethod]] = {
    "pq": lambda cfg: PQLinearMethod.from_config(cfg or {}),
    "aqlm": lambda cfg: PQLinearMethod.from_config(cfg or {}),
    "int8": lambda cfg: Int8LinearMethod(),
    "tpu_int8": lambda cfg: Int8LinearMethod(),
    # weight-only 4-bit group quant: the TPU equivalent of the
    # gptq/awq/marlin/machete kernel family
    "int4": lambda cfg: Int4LinearMethod.from_config(cfg or {}),
    "gptq": lambda cfg: Int4LinearMethod.from_config(cfg or {}),
    "awq": lambda cfg: Int4LinearMethod.from_config(cfg or {}),
    # int8 activations x int8 weights (compressed-tensors w8a8 role)
    "w8a8": lambda cfg: Int8W8A8LinearMethod(),
}


def register_quantization_method(name: str, factory) -> None:
    """Plugin hook (role of reference register_quantization_config)."""
    _REGISTRY[name] = factory


def get_linear_method(quantization: Optional[str],
                      quant_config: Optional[dict] = None) -> LinearMethod:
    if quantization is None:
        return UnquantizedLinearMethod()
    try:
        return _REGISTRY[quantization](quant_config)
    except KeyError:
        raise ValueError(
            f"Unknown quantization method {quantization!r}; "
            f"available: {sorted(_REGISTRY)}") from None


__all__ = [
    "LinearMethod", "UnquantizedLinearMethod", "PQLinearMethod",
    "Int8LinearMethod", "Int4LinearMethod", "Int8W8A8LinearMethod",
    "get_linear_method", "register_quantization_method",
]
