"""Tracing / profiling utilities (SURVEY.md section 5.1: the reference has
none — only wall-clock prints). Provides a jax.profiler trace context and a
step timer with frames/sec accounting, tunnel-safe (syncs via scalar fetch
rather than block_until_ready, which is a no-op through the remote-TPU
tunnel).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force completion of all device work producing `tree`."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree.leaves(tree)
    if leaves:
        float(jnp.sum(leaves[0]))


class StepTimer:
    """Rolling wall-clock/throughput tracker for the train loop."""

    def __init__(self, batch_size: int, window: int = 50):
        self.batch_size = batch_size
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def seconds_per_step(self) -> float:
        return sum(self._times) / len(self._times) if self._times else float("nan")

    @property
    def frames_per_second(self) -> float:
        s = self.seconds_per_step
        return self.batch_size / s if s == s and s > 0 else float("nan")
