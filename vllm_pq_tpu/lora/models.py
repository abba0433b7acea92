"""LoRA adapter weights + the batched-LoRA apply (roles of reference
``vllm/lora/models.py`` LoRAModel/manager and the Punica SGMV/BGMV ops,
``lora/punica_wrapper/punica_base.py:343,364``).

TPU-first design: all live adapters are stacked into
``A [L+1, in, r_max]`` / ``B [L+1, r_max, out]`` device tensors (slot 0
= zeros = "no adapter"); a per-token slot index rides the packed
transfer, and the shrink/expand run as two ``jax.lax.ragged_dot`` calls
over tokens sorted by slot — the same grouped-matmul machinery as the
MoE layer, which is exactly what Punica's SGMV kernels do on GPU.
"""

import json
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)

# target module name -> our layer param key
_TARGET_MAP = {
    "q_proj": "q_proj", "k_proj": "k_proj", "v_proj": "v_proj",
    "o_proj": "o_proj", "gate_proj": "gate_proj", "up_proj": "up_proj",
    "down_proj": "down_proj",
}


class LoRAModel:
    """One adapter's weights: {(layer_idx, proj): (A [in,r], B [r,out])}
    scaled by alpha/r at load time."""

    def __init__(self, name: str, rank: int,
                 weights: Dict[Tuple[int, str], Tuple[np.ndarray,
                                                      np.ndarray]]):
        self.name = name
        self.rank = rank
        self.weights = weights

    @classmethod
    def from_local_checkpoint(cls, path: str,
                              name: Optional[str] = None) -> "LoRAModel":
        """Load a PEFT adapter dir (adapter_config.json +
        adapter_model.safetensors)."""
        with open(os.path.join(path, "adapter_config.json")) as f:
            cfg = json.load(f)
        rank = cfg["r"]
        alpha = cfg.get("lora_alpha", rank)
        scale = alpha / rank

        from safetensors import safe_open
        weights: Dict[Tuple[int, str], dict] = {}
        f = os.path.join(path, "adapter_model.safetensors")
        with safe_open(f, framework="np") as sf:
            for key in sf.keys():
                t = np.asarray(sf.get_tensor(key))
                parts = key.split(".")
                # ...model.layers.<i>.(self_attn|mlp).<proj>.lora_(A|B).weight
                if "layers" not in parts:
                    continue
                li = int(parts[parts.index("layers") + 1])
                proj = next((p for p in parts if p in _TARGET_MAP), None)
                if proj is None:
                    continue
                ab = "A" if "lora_A" in key else "B"
                weights.setdefault((li, proj), {})[ab] = t

        out: Dict[Tuple[int, str], Tuple[np.ndarray, np.ndarray]] = {}
        for k, d in weights.items():
            # PEFT stores A [r, in], B [out, r]; we use [in, r], [r, out]
            a = d["A"].T.astype(np.float32)
            b = (d["B"].T.astype(np.float32)) * scale
            out[k] = (a, b)
        return cls(name or os.path.basename(path), rank, out)

    @classmethod
    def from_arrays(cls, name: str, rank: int, num_layers: int,
                    projs: List[str], dims: Dict[str, Tuple[int, int]],
                    seed: int = 0, scale: float = 1.0) -> "LoRAModel":
        """Synthetic adapter (tests / dummy load format)."""
        rng = np.random.default_rng(seed)
        w = {}
        for li in range(num_layers):
            for p in projs:
                i, o = dims[p]
                a = rng.standard_normal((i, rank)).astype(np.float32)
                a /= np.sqrt(i)
                b = rng.standard_normal((rank, o)).astype(np.float32)
                b *= scale / np.sqrt(rank)
                w[(li, p)] = (a, b)
        return cls(name, rank, w)


class LoRAStacks:
    """Device-resident stacked adapters for the batched apply.

    For each (layer, proj): A [S+1, in, r_max], B [S+1, r_max, out]
    where S = max_loras and slot 0 is the zero adapter.
    """

    def __init__(self, model_cfg, linear_defs, max_loras: int,
                 max_rank: int, dtype):
        self.max_loras = max_loras
        self.max_rank = max_rank
        self.dtype = dtype
        self.defs = {name: (i, o) for name, i, o, _k in linear_defs}
        self.num_layers = model_cfg.num_hidden_layers
        self.slots: List[Optional[str]] = [None] * (max_loras + 1)
        self.a: Dict[Tuple[int, str], jax.Array] = {}
        self.b: Dict[Tuple[int, str], jax.Array] = {}
        for li in range(self.num_layers):
            for name, (i, o) in self.defs.items():
                self.a[(li, name)] = jnp.zeros(
                    (max_loras + 1, i, max_rank), dtype)
                self.b[(li, name)] = jnp.zeros(
                    (max_loras + 1, max_rank, o), dtype)

    def slot_of(self, name: str) -> Optional[int]:
        try:
            return self.slots.index(name)
        except ValueError:
            return None

    def add(self, lora: LoRAModel) -> int:
        """Install an adapter into a free slot (evicts none; raises when
        full — the scheduler-level cap keeps live adapters <= max)."""
        existing = self.slot_of(lora.name)
        if existing is not None:
            return existing
        try:
            slot = self.slots.index(None, 1)
        except ValueError:
            raise RuntimeError(
                f"all {self.max_loras} LoRA slots in use") from None
        if lora.rank > self.max_rank:
            raise ValueError(f"adapter rank {lora.rank} > max_lora_rank "
                             f"{self.max_rank}")
        for (li, proj), (a_np, b_np) in lora.weights.items():
            key = (li, proj)
            if key not in self.a:
                continue
            r = a_np.shape[1]
            a_pad = np.zeros((self.a[key].shape[1], self.max_rank),
                             np.float32)
            a_pad[:, :r] = a_np
            b_pad = np.zeros((self.max_rank, self.b[key].shape[2]),
                             np.float32)
            b_pad[:r, :] = b_np
            self.a[key] = self.a[key].at[slot].set(
                jnp.asarray(a_pad, self.dtype))
            self.b[key] = self.b[key].at[slot].set(
                jnp.asarray(b_pad, self.dtype))
        self.slots[slot] = lora.name
        return slot

    def remove(self, name: str) -> bool:
        slot = self.slot_of(name)
        if slot is None or slot == 0:
            return False
        for key in self.a:
            self.a[key] = self.a[key].at[slot].set(0.0)
            self.b[key] = self.b[key].at[slot].set(0.0)
        self.slots[slot] = None
        return True


def lora_apply(x: jax.Array, a_stack: jax.Array, b_stack: jax.Array,
               sorted_tok: jax.Array, group_sizes: jax.Array) -> jax.Array:
    """Batched LoRA delta: returns [T, out] to add to the base output.

    x [T, in]; a_stack [S+1, in, r]; b_stack [S+1, r, out];
    sorted_tok [T] token ids sorted by adapter slot; group_sizes [S+1]
    token counts per slot (slot 0 rows multiply zeros — free lunch since
    the MXU tile is occupied either way at serving batch sizes).
    """
    xs = x[sorted_tok]
    shrink = jax.lax.ragged_dot(xs, a_stack.astype(x.dtype), group_sizes,
                                preferred_element_type=jnp.float32)
    expand = jax.lax.ragged_dot(shrink.astype(x.dtype),
                                b_stack.astype(x.dtype), group_sizes,
                                preferred_element_type=jnp.float32)
    t, out = x.shape[0], b_stack.shape[2]
    y = jnp.zeros((t, out), jnp.float32).at[sorted_tok].set(expand)
    return y.astype(x.dtype)
