"""Product-quantization (PQ) core: artifact format + reference semantics.

Semantics match the reference's AQLM path
(``vllm/model_executor/layers/quantization/aqlm.py:165-180,253-316``):
weights are additive codebook quantized over ``in_group_size``-wide input
subvectors; ``num_codebooks`` codebook entries are summed per subvector and
per-output-row scales are applied. AQLM with one codebook per partition is
classic product quantization; 2x8 (two uint8 codebooks) and 1x16 (one
uint16 codebook) are the shipped formats.

TPU-native layout (differs deliberately from the reference's
``codes [out, in/8, nbooks]``):

- ``codes``  : ``[num_codebooks, in/g, out]``  uint8 (nbits=8) or uint16
  — transposed so the output dim lands on TPU *lanes* and each codebook's
  plane is a contiguous 2D stream for the Pallas kernels.
- ``codebooks``: ``[num_codebooks, 2**nbits, g]`` float32.
- ``scales`` : ``[out]`` float32 (per-output-row, reference ``[out,1,1,1]``).

Dequantized weight is ``W[i, o]`` (input-major) so ``y = x @ W``.
"""

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class PQConfig:
    in_group_size: int = 8
    nbits_per_codebook: int = 8
    num_codebooks: int = 2
    out_group_size: int = 1  # only 1 supported, like the TPU-relevant refs

    def __post_init__(self):
        if self.out_group_size != 1:
            raise ValueError("out_group_size != 1 is not supported")
        if self.nbits_per_codebook not in (8, 16):
            raise ValueError("nbits_per_codebook must be 8 or 16")

    @property
    def codebook_size(self) -> int:
        return 1 << self.nbits_per_codebook

    @property
    def code_dtype(self):
        return jnp.uint8 if self.nbits_per_codebook == 8 else jnp.uint16

    @classmethod
    def from_dict(cls, d: Dict) -> "PQConfig":
        return cls(
            in_group_size=d.get("in_group_size", 8),
            nbits_per_codebook=d.get("nbits_per_codebook", 8),
            num_codebooks=d.get("num_codebooks", 2),
        )

    def bits_per_weight(self) -> float:
        return (self.num_codebooks * self.nbits_per_codebook /
                self.in_group_size)


def pq_param_shapes(cfg: PQConfig, in_features: int,
                    out_features: int) -> Dict[str, Tuple]:
    if in_features % cfg.in_group_size:
        raise ValueError(
            f"in_features {in_features} not divisible by group "
            f"{cfg.in_group_size}")
    j = in_features // cfg.in_group_size
    return {
        "codes": ((cfg.num_codebooks, j, out_features), cfg.code_dtype),
        "codebooks": ((cfg.num_codebooks, cfg.codebook_size,
                       cfg.in_group_size), jnp.float32),
        "scales": ((out_features,), jnp.float32),
    }


def _dequant_one(codebook: jax.Array, codes2d: jax.Array) -> jax.Array:
    # codebook [C, g], codes2d [J, O] -> [J, O, g]
    return jnp.take(codebook, codes2d.astype(jnp.int32), axis=0)


def pq_dequantize_ref(codes: jax.Array, codebooks: jax.Array,
                      scales: jax.Array,
                      out_dtype=jnp.float32) -> jax.Array:
    """W [in, out] = sum_k codebooks[k][codes[k, j, o]] * scales[o]."""
    m, j, o = codes.shape
    g = codebooks.shape[-1]
    ent = jax.vmap(_dequant_one)(codebooks, codes)  # [m, J, O, g]
    w = jnp.sum(ent, axis=0)                        # [J, O, g]
    w = jnp.transpose(w, (0, 2, 1)).reshape(j * g, o)
    return (w * scales[None, :]).astype(out_dtype)


def pq_matmul_ref(x: jax.Array, codes: jax.Array, codebooks: jax.Array,
                  scales: jax.Array) -> jax.Array:
    """y = x @ dequant(codes) — the semantics every fast path must match."""
    w = pq_dequantize_ref(codes, codebooks, scales, out_dtype=x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# Quantizer (offline converter path): greedy residual k-means.
# Produces PQ artifacts from a dense weight. This is a pragmatic additive
# quantizer (codebook_k fits the residual after codebooks_{<k}), not the
# reference's beam-search AQLM optimizer; AQLM HF checkpoints are instead
# converted losslessly by model_loader (same codes/codebooks, relayouted).
# ---------------------------------------------------------------------------


def _kmeans(x: np.ndarray, k: int, iters: int = 12,
            seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Plain k-means on rows of x [N, g]. Returns (centroids [k,g],
    assignment [N])."""
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    if n >= k:
        idx = rng.choice(n, size=k, replace=False)
        cent = x[idx].copy()
    else:
        cent = np.concatenate(
            [x, rng.standard_normal((k - n, x.shape[1])).astype(x.dtype)], 0)
    for _ in range(iters):
        # chunked distance computation to bound memory
        assign = np.empty(n, dtype=np.int64)
        chunk = max(1, (1 << 22) // max(k, 1))
        for s in range(0, n, chunk):
            d = ((x[s:s + chunk, None, :] - cent[None, :, :])**2).sum(-1)
            assign[s:s + chunk] = d.argmin(1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                cent[c] = x[mask].mean(0)
    return cent, assign


def pq_quantize_weight(w: np.ndarray, cfg: PQConfig, seed: int = 0,
                       kmeans_iters: int = 12) -> Dict[str, np.ndarray]:
    """Quantize a dense weight W [in, out] into PQ artifacts.

    Per-output-row absmax-ish scale (L2-optimal row norm), then greedy
    residual k-means per codebook over all (j, o) subvectors.
    """
    in_f, out_f = w.shape
    g = cfg.in_group_size
    assert in_f % g == 0
    j = in_f // g
    w = w.astype(np.float32)

    # per-output-column scale (W is [in, out]; reference scales are per
    # output row of its [out, in] weight — same thing)
    scales = np.sqrt((w**2).mean(axis=0)) + 1e-8  # [out]
    wn = w / scales[None, :]

    # subvectors: [J, g, O] -> [J*O, g]
    sub = wn.reshape(j, g, out_f).transpose(0, 2, 1).reshape(j * out_f, g)

    codes = np.zeros((cfg.num_codebooks, j * out_f), dtype=np.int64)
    codebooks = np.zeros((cfg.num_codebooks, cfg.codebook_size, g),
                         dtype=np.float32)
    resid = sub.copy()
    for k in range(cfg.num_codebooks):
        # subsample for k-means fit if huge
        fit = resid
        if fit.shape[0] > 1 << 18:
            sel = np.random.default_rng(seed + k).choice(
                fit.shape[0], 1 << 18, replace=False)
            fit = fit[sel]
        cent, _ = _kmeans(fit, cfg.codebook_size, iters=kmeans_iters,
                          seed=seed + k)
        # assign all points to nearest centroid (chunked)
        n = resid.shape[0]
        assign = np.empty(n, dtype=np.int64)
        chunk = max(1, (1 << 22) // cfg.codebook_size)
        for s in range(0, n, chunk):
            d = ((resid[s:s + chunk, None, :] - cent[None, :, :])**2).sum(-1)
            assign[s:s + chunk] = d.argmin(1)
        codebooks[k] = cent
        codes[k] = assign
        resid = resid - cent[assign]

    code_np_dtype = np.uint8 if cfg.nbits_per_codebook == 8 else np.uint16
    codes = codes.reshape(cfg.num_codebooks, j, out_f).astype(code_np_dtype)
    return {
        "codes": codes,
        "codebooks": codebooks,
        "scales": scales.astype(np.float32),
    }
