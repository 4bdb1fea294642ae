"""Profiling hooks: jax.profiler traces + simple step timers.

The reference's only observability is wall-clock prints + cuda memory
(SURVEY.md 5.1). Here: ``trace`` context manager wraps any region in a
jax.profiler trace viewable in TensorBoard/Perfetto; ``StepTimer`` gives
blocking per-step device timing; ``device_memory_mb`` summarizes live HBM.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Blocking wall-clock step timer.

    Syncs by materializing one element of the result on host:
    ``jax.block_until_ready`` is a documented NO-OP on the tunneled axon
    TPU backend (CLAUDE.md), so a host materialization is the only
    reliable completion barrier across this project's backends."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            leaves = [x for x in jax.tree.leaves(result)
                      if hasattr(x, "ravel")]
            if leaves:
                np.asarray(jax.device_get(leaves[0]).ravel()[0])
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def device_memory_mb(device=None) -> Optional[dict]:
    dev = device or jax.local_devices()[0]
    stats = dev.memory_stats()
    if not stats:
        return None
    return {
        "in_use_mb": stats.get("bytes_in_use", 0) / 1e6,
        "peak_mb": stats.get("peak_bytes_in_use", 0) / 1e6,
        "limit_mb": stats.get("bytes_limit", 0) / 1e6,
    }
