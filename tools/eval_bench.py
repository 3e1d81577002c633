#!/usr/bin/env python
"""Evaluation-path throughput (VERDICT r3 #3a): times MSF+flip and
MSF+sliding at Base/NYU (BASELINE config #3) on the device plane.

The reference's MSF loop is 10 forwards/img (5 scales x flip,
utils/val_mm.py:324-470) plus the sliding grid (:257-321) at scales whose
ceil-32 geometry exceeds the crop. Here every (scale, flip) pair is ONE
compiled executable reused across the val set and all sliding windows run
as one batched forward; this harness proves those programs' steady-state
rate and surfaces the sliding scatter-chain cost (eval/evaluate.py:158-167)
via the per-op breakdown.

Usage:
  python tools/eval_bench.py                 # MSF+flip
  python tools/eval_bench.py --sliding       # MSF+sliding
  python tools/eval_bench.py --ops           # + per-op breakdown of trace
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="local_configs.NYUDepthv2.DFormer_Base")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--nbatches", type=int, default=8)
    ap.add_argument("--sliding", action="store_true")
    ap.add_argument("--single-scale", action="store_true",
                    help="time plain `evaluate` instead of MSF")
    ap.add_argument("--ops", action="store_true",
                    help="print the per-op device breakdown of the trace")
    args = ap.parse_args()

    from dformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dformer_tpu.config import load_config
    from dformer_tpu.eval.evaluate import Evaluator
    from dformer_tpu.models import build_model
    from dformer_tpu.utils.profiling import (device_time_ms,
                                               start_device_trace)

    cfg = load_config(args.config)
    model = build_model(cfg, dtype=jnp.bfloat16)
    H, W = cfg.image_height, cfg.image_width
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, H, W, 3)),
                                    jnp.zeros((1, H, W, 3)))
    ev = Evaluator(model, variables, cfg, sliding=args.sliding)
    scales = list(getattr(cfg, "eval_scale_array", ()) or ())
    if len(scales) <= 1:  # config default (1,): use the reference MSF set
        scales = [0.5, 0.75, 1.0, 1.25, 1.5]

    rng = np.random.RandomState(0)

    def mk_batch():
        return dict(
            rgb=rng.rand(args.batch, H, W, 3).astype(np.float32),
            modal_x=rng.rand(args.batch, H, W, 3).astype(np.float32),
            gt=rng.randint(0, cfg.num_classes,
                           (args.batch, H, W)).astype(np.int32))

    def run(batches):
        if args.single_scale:
            return ev.evaluate(batches)
        return ev.evaluate_msf(batches, scales=scales, flip=True)

    mode = ("single-scale" if args.single_scale else
            "MSF+sliding" if args.sliding else "MSF+flip")
    print(f"{args.config} bs={args.batch} {H}x{W} bf16  mode={mode} "
          f"scales={scales if not args.single_scale else '-'}", flush=True)

    t0 = time.perf_counter()
    run([mk_batch()])  # compile all programs
    try:  # _cache_size is a private jax API; fall back to the jit-fn count
        n_exec = sum(f._cache_size() for f in ev._jitted.values())
    except AttributeError:
        n_exec = len(ev._jitted)
    print(f"compile+first batch: {time.perf_counter() - t0:.1f}s "
          f"({n_exec} executables)", flush=True)

    batches = [mk_batch() for _ in range(args.nbatches)]
    logdir = tempfile.mkdtemp(prefix="eval_bench_")
    t0 = time.perf_counter()
    start_device_trace(logdir)
    run(batches)
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    imgs = args.nbatches * args.batch
    dev_ms = device_time_ms(logdir)
    dev_s = dev_ms / 1000.0 if dev_ms else float("nan")
    print(f"{imgs} imgs: wall {wall:.1f}s ({imgs / wall:.2f} img/s), device "
          f"{dev_s:.1f}s -> {imgs / dev_s:.2f} img/s/chip, "
          f"{1000 * dev_s / imgs:.1f} ms/img device")

    if args.ops:
        from tools.profile_ops import op_breakdown

        op_breakdown(logdir, top=25)


if __name__ == "__main__":
    main()
