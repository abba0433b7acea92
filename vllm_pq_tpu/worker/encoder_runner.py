"""Runner for encoder-only (pooling) models: BERT-family embeddings and
cross-encoder sequence classification.

Role of the reference's pooling-model runner path
(``worker/pooling_model_runner.py`` + V1 pooling serving): no KV cache,
no sampling — one bucketed bidirectional forward per prompt with CLS /
mean / pooler pooling, and a classification head for score/rerank.
"""

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from vllm_pq_tpu.config import EngineConfig
from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)


class EncoderRunner:

    is_encoder_runner = True

    def __init__(self, config: EngineConfig, mesh: Mesh, model,
                 params: Any):
        self.config = config
        self.mesh = mesh
        self.model = model
        self.params = params
        self.token_buckets = sorted(config.compilation.token_buckets)
        self._fns: Dict[tuple, Any] = {}

    def _pick_bucket(self, t: int) -> int:
        for b in self.token_buckets:
            if t <= b:
                return b
        raise ValueError(f"prompt of {t} tokens exceeds largest bucket "
                         f"{self.token_buckets[-1]}")

    def _get_fn(self, t_bucket: int, mode: str):
        key = (mode, t_bucket)
        fn = self._fns.get(key)
        if fn is not None:
            return fn
        model = self.model

        def fwd(params, ids, type_ids, n):
            mask = jnp.arange(t_bucket) < n[0]
            hidden = model.encode(params, ids, type_ids, mask)
            if mode == "classify":
                return model.classify(params, hidden).astype(jnp.float32)
            if mode == "pooler":
                return model.pool(params, hidden).astype(jnp.float32)
            if mode == "mean":
                m = mask[:, None]
                return (jnp.sum(jnp.where(m, hidden, 0), axis=0)
                        / jnp.maximum(n[0], 1)).astype(jnp.float32)
            if mode == "last":
                return hidden[n[0] - 1].astype(jnp.float32)
            return hidden[0].astype(jnp.float32)  # cls

        sharded = jax.shard_map(
            fwd, mesh=self.mesh,
            in_specs=(model.param_specs(), P(), P(), P()),
            out_specs=P(), check_vma=False)
        fn = jax.jit(sharded)
        self._fns[key] = fn
        return fn

    def _run(self, ids_list: List[List[int]], mode: str,
             type_ids_list: Optional[List[List[int]]] = None
             ) -> np.ndarray:
        outs = []
        for i, ids in enumerate(ids_list):
            t = len(ids)
            b = self._pick_bucket(t)
            arr = np.zeros(b, np.int32)
            arr[:t] = ids
            tt = np.zeros(b, np.int32)
            if type_ids_list is not None:
                tt[:t] = type_ids_list[i]
            fn = self._get_fn(b, mode)
            out = fn(self.params, jnp.asarray(arr), jnp.asarray(tt),
                     jnp.asarray([t], np.int32))
            outs.append(np.asarray(jax.device_get(out)))
        return np.stack(outs)

    # -- public API (mirrors ModelRunner.encode where it overlaps) ------

    def encode(self, ids_list: List[List[int]],
               pool: str = "cls") -> np.ndarray:
        return self._run(ids_list, pool)

    def classify(self, ids_list: List[List[int]],
                 type_ids_list: Optional[List[List[int]]] = None
                 ) -> np.ndarray:
        """Sequence-classification logits [N, num_labels]."""
        if not getattr(self.model.cfg, "num_labels", 0):
            raise ValueError("model has no classification head")
        return self._run(ids_list, "classify", type_ids_list)

    # engine-core compatibility no-ops
    def warmup(self, greedy_only: bool = True) -> None:
        pass

    def sleep(self, level: int = 1) -> None:
        pass

    def wake_up(self) -> None:
        pass
