"""Profiling hooks (§5.1): jax.profiler traces + step timing.

The reference has no tracer — only wall-clock meters with a forced
``cuda.synchronize`` per step (``Painter/util/misc.py:124-168``,
``engine_train.py:93``). Here: async dispatch by default, explicit
``trace`` context producing TensorBoard-viewable traces, and a
``StepTimer`` that only synchronizes at sampling boundaries.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (open with TensorBoard/XProf)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock steps/sec without per-step device sync: block only

    every ``sync_every`` steps on the last output."""

    def __init__(self, sync_every: int = 10):
        self.sync_every = sync_every
        self._count = 0
        self._t0: Optional[float] = None
        self.rate: float = 0.0

    def step(self, last_output=None) -> Optional[float]:
        import jax
        if self._t0 is None:
            self._t0 = time.perf_counter()
        self._count += 1
        if self._count % self.sync_every == 0:
            if last_output is not None:
                jax.block_until_ready(last_output)
            dt = time.perf_counter() - self._t0
            self.rate = self.sync_every / dt
            self._t0 = time.perf_counter()
            return self.rate
        return None


def device_memory_stats() -> dict:
    """Per-device memory stats (replaces cuda.max_memory_allocated)."""
    import jax
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:  # noqa: BLE001 — backend may not support it
            stats = {}
        out[str(d)] = {k: stats[k] for k in
                       ("bytes_in_use", "peak_bytes_in_use",
                        "bytes_limit") if k in stats}
    return out
