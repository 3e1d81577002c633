#!/usr/bin/env python
"""Inference latency — counterpart of reference utils/latency.py
(bs=1 480x640, 100 warmup + 300 timed reps with CUDA events); here the
per-invocation durations come from the profiler's DEVICE plane (the CUDA-
event equivalent — wall clock with block_until_ready is unreliable on this
runtime), reporting avg/p50/p90 with wall-clock numbers as fallback."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="local_configs.NYUDepthv2.DFormer_Large")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--amp", action=argparse.BooleanOptionalAction,
                    default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dformer_tpu.config import load_config
    from dformer_tpu.models import build_model

    cfg = load_config(args.config)
    model = build_model(cfg, dtype=jnp.bfloat16 if args.amp else None)
    shape = (args.batch, args.height, args.width, 3)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros(shape),
                                    jnp.zeros(shape))

    @jax.jit
    def forward(rgb, modal):
        return model.apply(variables, rgb, modal, train=False,
                           deterministic_bases=True)

    import tempfile

    from dformer_tpu.utils.profiling import device_durations_ms

    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(*shape).astype(np.float32))
    for _ in range(args.warmup):
        forward(rgb, rgb).block_until_ready()

    logdir = tempfile.mkdtemp(prefix="latency_")
    wall = []
    jax.profiler.start_trace(logdir)
    for _ in range(args.reps):
        t0 = time.perf_counter()
        forward(rgb, rgb).block_until_ready()
        wall.append((time.perf_counter() - t0) * 1000)
    jax.profiler.stop_trace()
    dev = device_durations_ms(logdir)
    times = np.asarray(dev or wall)
    src = "device plane" if dev else "wall clock"
    print(f"config: {args.config} bs={args.batch} {args.height}x{args.width} "
          f"{'bf16' if args.amp else 'fp32'} ({src})")
    print(f"latency avg {times.mean():.2f} ms  p50 {np.percentile(times, 50):.2f}"
          f" ms  p90 {np.percentile(times, 90):.2f} ms over {args.reps} reps")


if __name__ == "__main__":
    main()
