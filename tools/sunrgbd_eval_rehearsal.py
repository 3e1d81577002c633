#!/usr/bin/env python
"""SUNRGBD-realistic variable-geometry MSF eval rehearsal (VERDICT r4 #3).

The SUNRGBD val set (5,050 images, reference
local_configs/_base_/datasets/SUNRGBD.py:22-23) mixes four sensors with
different native resolutions; the reference dodges the geometry problem by
evaluating at batch=1 per GPU (reference utils/train.py:135-163). Our
Evaluator evaluates every image at its TRUE extent via geometry grouping +
pow2 batch bucketing (eval/evaluate.py:_true_extent_batches) — correct and
compile-bounded in unit tests, but never measured at a realistic mix where
each first-compile costs ~minutes on this one-CPU host.

This harness builds a val stream with an approximate SUNRGBD sensor mix
(populations from the SUNRGBD paper: Kinect v2 3,784 / Xtion 3,389 /
Kinect v1 2,003 / RealSense 1,159 of 10,335; the exact pixel geometries
on disk vary per sensor — these four canonical shapes stand in for them,
what matters operationally is SEVERAL distinct non-/32 geometries at
realistic frequencies), shaped exactly like Loader._collate's padded-canvas
output, and reports:

  * executable count (distinct compiled programs)
  * compile overhead seconds (pass-1 wall minus pass-2 steady wall)
  * steady-state img/s (device plane, pass 2)
  * pow2-bucketing pad overhead % (padded-forward pixels / true pixels - 1)

Usage:
  python tools/sunrgbd_eval_rehearsal.py --images 200          # full MSF
  python tools/sunrgbd_eval_rehearsal.py --images 48 --scales 1.0
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (h, w) -> relative frequency; see module docstring for provenance
SENSOR_MIX = {
    (530, 730): 0.366,  # Kinect v2
    (517, 658): 0.328,  # Asus Xtion
    (480, 640): 0.194,  # Kinect v1
    (468, 628): 0.112,  # Intel RealSense
}


def make_stream(n_images, batch, num_classes, seed=0):
    """Loader-shaped batches: common-canvas padded rgb/modal_x/gt + hw."""
    rng = np.random.RandomState(seed)
    shapes = list(SENSOR_MIX)
    probs = np.asarray(list(SENSOR_MIX.values()))
    picks = rng.choice(len(shapes), size=n_images, p=probs / probs.sum())
    batches = []
    for s in range(0, n_images, batch):
        hws = [shapes[i] for i in picks[s:s + batch]]
        H = max(h for h, _ in hws)
        W = max(w for _, w in hws)
        n = len(hws)
        b = dict(rgb=np.zeros((n, H, W, 3), np.float32),
                 modal_x=np.zeros((n, H, W, 3), np.float32),
                 gt=np.full((n, H, W), 255, np.int32),
                 hw=np.asarray(hws, np.int32))
        for i, (h, w) in enumerate(hws):
            b["rgb"][i, :h, :w] = rng.rand(h, w, 3)
            b["modal_x"][i, :h, :w] = rng.rand(h, w, 3)
            b["gt"][i, :h, :w] = rng.randint(0, num_classes, (h, w))
        batches.append(b)
    return batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="local_configs.SUNRGBD.DFormer_Small")
    ap.add_argument("--images", type=int, default=200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--scales", type=float, nargs="+",
                    default=[0.5, 0.75, 1.0, 1.25, 1.5])
    ap.add_argument("--no-flip", action="store_true")
    ap.add_argument("--record", action="store_true",
                    help="append the result line to BENCH_NOTES.md")
    args = ap.parse_args()

    from dformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dformer_tpu.config import load_config
    from dformer_tpu.eval.evaluate import Evaluator
    from dformer_tpu.models import build_model
    from dformer_tpu.utils.profiling import (device_time_ms,
                                               start_device_trace)

    cfg = load_config(args.config)
    model = build_model(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 480, 640, 3)),
                                    jnp.zeros((1, 480, 640, 3)))
    ev = Evaluator(model, variables, cfg)
    batches = make_stream(args.images, args.batch, cfg.num_classes)

    # -- host-side accounting of the grouping the Evaluator will perform
    true_px = fwd_px = 0
    groups = {}
    for sub in ev._true_extent_batches(batches):
        nb, bs = sub["nb"], sub["gt"].shape[0]
        h, w = sub["gt"].shape[1:3]
        groups[(h, w, bs)] = groups.get((h, w, bs), 0) + 1
        true_px += nb * h * w
        fwd_px += bs * h * w
    n_geom = len({(h, w) for h, w, _ in groups})
    # flip reuses the unflipped program (evaluate.py round-5), so programs
    # per (geom,bucket) shape = #scales regardless of flip
    print(f"{args.config}: {args.images} imgs, loader bs={args.batch}, "
          f"{n_geom} geometries, {len(groups)} (geom,bucket) shapes x "
          f"{len(args.scales)} scale programs; pad overhead "
          f"{100 * (fwd_px / true_px - 1):.1f}% of forwarded pixels", flush=True)

    def run():
        t0 = time.perf_counter()
        logdir = tempfile.mkdtemp(prefix="sunrgbd_rehearsal_")
        start_device_trace(logdir)
        m = ev.evaluate_msf(batches, scales=args.scales,
                            flip=not args.no_flip)
        jax.profiler.stop_trace()
        wall = time.perf_counter() - t0
        assert int(np.asarray(m.hist).sum()) == true_px  # exactness
        return wall, device_time_ms(logdir)

    wall1, _ = run()          # pass 1: compiles + run
    wall2, dev_ms = run()     # pass 2: steady state, device-plane truth
    try:
        n_exec = sum(f._cache_size() for f in ev._jitted.values())
    except AttributeError:
        n_exec = len(ev._jitted)
    dev_s = dev_ms / 1000.0 if dev_ms else float("nan")
    ips_dev = args.images / dev_s
    result = (f"{n_exec} executables, compile overhead {wall1 - wall2:.0f}s "
              f"(pass1 {wall1:.0f}s, steady pass {wall2:.0f}s wall), "
              f"steady {args.images / wall2:.2f} img/s wall / "
              f"{ips_dev:.2f} img/s/chip device, pad overhead "
              f"{100 * (fwd_px / true_px - 1):.1f}%")
    print(result, flush=True)
    if args.record:
        from tools.record_bench import record

        mode = f"MSF x{len(args.scales)}{'' if args.no_flip else '+flip'}"
        record(f"sunrgbd_eval_rehearsal {args.config.split('.')[-1]} "
               f"{args.images} imgs {mode}", result)


if __name__ == "__main__":
    main()
