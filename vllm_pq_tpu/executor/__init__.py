"""Executor plugin seam (role of reference
``vllm/executor/executor_base.py`` + ``distributed_executor_backend``
selection): the EngineCore drives model execution through an Executor
so alternative orchestrations (multi-process fan-out, external cluster
schedulers) can plug in without touching the engine loop.

Selection (``config.parallel.distributed_executor_backend``):
- ``"uniproc"`` (default): worker + runner in this process — on TPU a
  single jitted SPMD program spans the whole mesh, so one process per
  host is the natural executor (unlike the reference's
  one-process-per-GPU model).
- ``"external:module.path:ClassName"``: out-of-tree executor class with
  the UniprocExecutor interface.

The multi-host path (parallel/host_agent.py step broadcast) and the
engine-process boundary (engine/core_proc.py) compose ABOVE this seam,
as in the reference where MP/Ray executors wrap workers.
"""

import importlib

from vllm_pq_tpu.executor.uniproc import ExecutorBase, UniprocExecutor


def create_executor(config) -> ExecutorBase:
    backend = getattr(config.parallel, "distributed_executor_backend",
                      None) or "uniproc"
    if backend == "uniproc":
        return UniprocExecutor(config)
    if backend.startswith("external:"):
        spec = backend[len("external:"):]
        mod_name, _, cls_name = spec.partition(":")
        cls = getattr(importlib.import_module(mod_name), cls_name)
        ex = cls(config)
        if not isinstance(ex, ExecutorBase):
            raise TypeError(f"{spec} is not an ExecutorBase")
        return ex
    raise ValueError(
        f"unknown distributed_executor_backend {backend!r}; expected "
        "'uniproc' or 'external:module:Class'")


__all__ = ["ExecutorBase", "UniprocExecutor", "create_executor"]
