"""Tracing / profiling utilities — the TPU counterpart of the reference's
CUDA-event timers (SURVEY.md §5.1: utils/latency.py CUDA events,
utils/train.py gpu_timer EMA epoch timers).

  * `trace(logdir)`: jax.profiler trace context -> TensorBoard xplane dump.
  * `device_time_ms(logdir)`: sum the device-plane durations of jitted
    computations from a trace — GROUND TRUTH on this runtime, where
    block_until_ready can return before queued device work completes
    (wall-clock loops read arbitrarily fast for dependent-step chains).
  * `StepTimer`: EMA-smoothed step timing with ETA (gpu_timer equivalent,
    utils/train.py:64-87) using block_until_ready for accurate device time.
  * `annotate`: named trace spans (jax.profiler.TraceAnnotation).
"""

import contextlib
import glob
import time

import jax


def device_durations_ms(logdir: str, prefix: str = "jit_"):
    """Per-event device-plane durations (ms) of computations whose metadata
    name starts with `prefix`, from the newest xplane dump under `logdir`.
    Returns a list (possibly empty) — one entry per executable invocation,
    so percentiles over invocations are meaningful."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa

    files = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        return []
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    out = []
    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                if md.name.startswith(prefix):
                    out.append(ev.duration_ps / 1e9)
    return out


def device_time_ms(logdir: str, prefix: str = "jit_"):
    """Sum device-plane durations (ms) of computations whose metadata name
    starts with `prefix` (see device_durations_ms). None when absent."""
    return sum(device_durations_ms(logdir, prefix)) or None


def device_trace_options():
    """Slim ProfileOptions for timing harnesses: device-plane events only.

    The default trace embeds the executed modules' full HLO proto
    (enable_hlo_proto=True — 112 MB for the DFormer-L train step) plus host
    and python tracer lines; on this tunneled runtime stop_trace streams all
    of it through the relay at ~MB/s, turning a 1 s timed loop into minutes
    (round-5 bench postmortem). device_time_ms only reads device-plane event
    durations, which survive all three knobs. None on older jax."""
    try:
        o = jax.profiler.ProfileOptions()
        o.enable_hlo_proto = False
        o.host_tracer_level = 0
        o.python_tracer_level = 0
        return o
    except Exception:
        return None


def start_device_trace(logdir: str):
    """start_trace with the slim options (fallback: default options)."""
    opts = device_trace_options()
    try:
        jax.profiler.start_trace(logdir, profiler_options=opts)
    except TypeError:  # older jax: no profiler_options kwarg
        jax.profiler.start_trace(logdir)


@contextlib.contextmanager
def trace(logdir: str, slim: bool = True):
    if slim:
        start_device_trace(logdir)
    else:
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
