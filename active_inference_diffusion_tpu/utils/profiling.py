"""Profiling hooks: jax.profiler traces + per-phase step timing.

The reference has no profiler integration — only hand-rolled wall-clock
deques (reference: utils/async_collector.py:88-91, examples/train_mujoco.py:
271-347; SURVEY.md section 5). Here: structured phase timers that feed the
metrics stream, plus jax.profiler trace capture around arbitrary spans
(viewable in TensorBoard/XProf).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque
from typing import Dict, Iterator

import jax


class PhaseTimer:
    """Rolling per-phase wall-clock statistics for the metrics stream."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times: Dict[str, deque] = defaultdict(lambda: deque(maxlen=window))

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None) -> Iterator[None]:
        """Time a phase; pass ``block_on`` (an array/pytree) to include device
        completion in the measurement (JAX dispatch is async)."""
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self._times[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float):
        self._times[name].append(seconds)

    def metrics(self, prefix: str = "time/") -> Dict[str, float]:
        out = {}
        for name, times in self._times.items():
            if times:
                out[f"{prefix}{name}_ms"] = 1e3 * sum(times) / len(times)
        return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed span."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-span inside a captured trace (shows up in XProf)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def device_memory_stats() -> Dict[str, float]:
    """Per-device memory usage (the honest version of the reference's
    GPU-memory-as-utilization proxy, examples/train_mujoco.py:99-115)."""
    stats = {}
    for i, dev in enumerate(jax.local_devices()):
        try:
            m = dev.memory_stats()
            if m:
                stats[f"memory/device{i}_bytes_in_use"] = m.get("bytes_in_use", 0)
                stats[f"memory/device{i}_peak_bytes"] = m.get(
                    "peak_bytes_in_use", 0
                )
        except Exception:
            pass
    return stats
