"""Logging for vllm_pq_tpu.

Env-configurable logging with per-module loggers (role of the reference's
``vllm/logger.py``): ``VPQ_LOGGING_LEVEL`` selects the level, logs go to
stderr with a compact single-line format.
"""

import logging
import os
import sys

_FORMAT = "%(levelname).1s %(asctime)s [%(name)s] %(message)s"
_DATEFMT = "%m-%d %H:%M:%S"

_root = logging.getLogger("vllm_pq_tpu")
if not _root.handlers:
    _handler = logging.StreamHandler(sys.stderr)
    _handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
    _root.addHandler(_handler)
    _root.setLevel(os.environ.get("VPQ_LOGGING_LEVEL", "INFO").upper())
    _root.propagate = False


def init_logger(name: str) -> logging.Logger:
    if name.startswith("vllm_pq_tpu"):
        return logging.getLogger(name)
    return logging.getLogger("vllm_pq_tpu." + name)
