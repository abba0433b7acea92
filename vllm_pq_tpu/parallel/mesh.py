"""Device-mesh construction (single- and multi-host).

Role of the reference's ``initialize_model_parallel`` / TPU communicator
bootstrap (``parallel_state.py:865-951``, ``tpu_communicator.py:21-66``)
— TPU-native: ``jax.distributed.initialize`` for the multi-host
control plane, then one global ("data", "model") mesh where the model
(TP) axis stays inside a host's ICI domain and the data (DP) axis spans
hosts over DCN (the scaling-book recipe).

Environment (mirrors the reference's VLLM_DP_* env plumbing):
  VPQ_COORDINATOR_ADDR  host:port of process 0
  VPQ_NUM_HOSTS         number of processes
  VPQ_HOST_RANK         this process's rank
(absent => single-process; GKE/TPU-VM auto-detection is left to JAX's
own cluster detection when these are unset but TPU env vars exist.)
"""

import os
from typing import Optional

import numpy as np

from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)

_initialized = False


def maybe_init_distributed() -> int:
    """Initialize jax.distributed from VPQ_* env vars. Returns the
    process index (0 for single-process)."""
    global _initialized
    import jax
    addr = os.environ.get("VPQ_COORDINATOR_ADDR")
    if not addr or _initialized:
        try:
            return jax.process_index()
        except Exception:  # noqa: BLE001
            return 0
    num = int(os.environ.get("VPQ_NUM_HOSTS", "1"))
    rank = int(os.environ.get("VPQ_HOST_RANK", "0"))
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=num, process_id=rank)
    _initialized = True
    logger.info("jax.distributed initialized: rank %d/%d via %s",
                rank, num, addr)
    return rank


def build_mesh(tp: int, dp: int):
    """Global ("data", "model") mesh. TP must fit within one host's
    devices so its collectives ride ICI; DP tiles hosts (DCN)."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    need = tp * dp
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for tp={tp} dp={dp}, have "
            f"{len(devices)}")
    n_hosts = max(getattr(jax, "process_count", lambda: 1)(), 1)
    per_host = len(devices) // n_hosts
    if n_hosts > 1 and tp > per_host:
        raise ValueError(
            f"tp={tp} exceeds {per_host} devices/host: the model axis "
            "would cross DCN; shard dp across hosts instead")
    if n_hosts > 1:
        try:
            from jax.experimental import mesh_utils
            dev_array = mesh_utils.create_hybrid_device_mesh(
                (dp // n_hosts * per_host // tp or 1, tp),
                (n_hosts, 1), devices=devices)
            return Mesh(dev_array, ("data", "model"))
        except Exception as e:  # noqa: BLE001
            logger.warning("hybrid mesh failed (%s); plain reshape", e)
    dev_array = np.array(devices[:need]).reshape(dp, tp)
    return Mesh(dev_array, ("data", "model"))
