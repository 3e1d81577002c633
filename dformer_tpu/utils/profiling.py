"""Tracing / profiling utilities — the TPU counterpart of the reference's
CUDA-event timers (SURVEY.md §5.1: utils/latency.py CUDA events,
utils/train.py gpu_timer EMA epoch timers).

  * `trace(logdir)`: jax.profiler trace context -> TensorBoard xplane dump.
  * `StepTimer`: EMA-smoothed step timing with ETA (gpu_timer equivalent,
    utils/train.py:64-87) using block_until_ready for accurate device time.
  * `annotate`: named trace spans (jax.profiler.TraceAnnotation).
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """EMA-smoothed step timer with ETA (reference gpu_timer semantics)."""

    def __init__(self, alpha: float = 0.95):
        self.alpha = alpha
        self.ema = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else \
            self.alpha * self.ema + (1 - self.alpha) * dt
        return dt

    def eta(self, steps_remaining: int) -> float:
        return (self.ema or 0.0) * steps_remaining
