#!/usr/bin/env python
"""Inference latency — counterpart of reference utils/latency.py
(bs=1 480x640, 100 warmup + 300 timed reps with CUDA events); here timed
with block_until_ready around the jitted forward, reporting avg/p50/p90."""

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

    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(*shape).astype(np.float32))
    for _ in range(args.warmup):
        forward(rgb, rgb).block_until_ready()

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        forward(rgb, rgb).block_until_ready()
        times.append((time.perf_counter() - t0) * 1000)
    times = np.asarray(times)
    print(f"config: {args.config} bs={args.batch} {args.height}x{args.width} "
          f"{'bf16' if args.amp else 'fp32'}")
    print(f"latency avg {times.mean():.2f} ms  p50 {np.percentile(times, 50):.2f}"
          f" ms  p90 {np.percentile(times, 90):.2f} ms over {args.reps} reps")


if __name__ == "__main__":
    main()
