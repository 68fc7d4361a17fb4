"""Observability: structured logging, stage timers, jax.profiler hooks.

The reference has no tracing/logging subsystem (SURVEY.md §5: ad-hoc
print() and time.clock() deltas). Here: a structured logger, a `stage`
context manager that wall-clocks pipeline stages (with device sync so
timings are honest on async backends), and first-class wrappers around
jax.profiler for TPU traces.
"""
from __future__ import annotations

import contextlib
import json
import logging
import sys
import time
from typing import Dict, Optional

import jax

__all__ = ["get_logger", "stage", "StageTimes", "trace", "log_compile_cache"]

_LOGGER_NAME = "astrild_tpu"


def get_logger(level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(level)
        logger.propagate = False
    return logger


class StageTimes:
    """Accumulates per-stage wall-clock times; printable as one JSON line."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    def add(self, name: str, dt: float):
        self.times[name] = self.times.get(name, 0.0) + dt

    def as_json(self) -> str:
        return json.dumps({k: round(v, 4) for k, v in self.times.items()})


_GLOBAL_STAGES = StageTimes()


@contextlib.contextmanager
def stage(name: str, sync=None, collector: Optional[StageTimes] = None,
          log: bool = True):
    """Wall-clock a pipeline stage.

    sync: optional array/pytree to block_until_ready on before stopping the
    clock (required for honest numbers under async dispatch).
    """
    logger = get_logger()
    t0 = time.perf_counter()
    holder = {}
    try:
        yield holder
    finally:
        if "sync" in holder:
            jax.block_until_ready(holder["sync"])
        elif sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        (collector or _GLOBAL_STAGES).add(name, dt)
        if log:
            logger.info("stage %s: %.3f s", name, dt)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/astrild_tpu_trace"):
    """jax.profiler trace context (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def log_compile_cache(cache_dir: str = "/tmp/jax_cache"):
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def enable_nan_checks(enable: bool = True):
    """Debug mode: raise on NaN production inside jitted code
    (jax_debug_nans). The reference had no failure detection (SURVEY §5);
    this plus `check_finite` is the engine's fault-detection layer."""
    jax.config.update("jax_debug_nans", enable)


def check_finite(tree, name: str = "result"):
    """Raise ValueError when any leaf holds non-finite values (host sync)."""
    import numpy as np

    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            bad = int(np.sum(~np.isfinite(arr)))
            raise ValueError(
                f"{name}: leaf {i} has {bad} non-finite values "
                f"(shape {arr.shape})")
    return tree
