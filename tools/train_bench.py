#!/usr/bin/env python
"""Training-step throughput harness — counterpart of the reference's
wall-clock headline (README.md:73: DFormer-L ~12h on 2 GPUs ≈ 9 img/s
total). Measures the full jitted train step (fwd + bwd + AdamW) on synthetic
data at the config's crop size."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="local_configs.NYUDepthv2.DFormer_Large")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dformer_tpu.config import load_config
    from dformer_tpu.models import build_model
    from dformer_tpu.parallel.mesh import make_mesh
    from dformer_tpu.train.loop import TrainState, make_train_step
    from dformer_tpu.train.optim import make_optimizer

    cfg = load_config(args.config)
    mesh = make_mesh()
    model = build_model(cfg, dtype=jnp.bfloat16)
    H, W = cfg.image_height, cfg.image_width
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, H, W, 3)),
                                    jnp.zeros((1, H, W, 3)))
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(step=jnp.asarray(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = make_train_step(model, tx, cfg, mesh)

    rng = np.random.RandomState(0)
    B = args.batch
    rgb = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, cfg.num_classes, (B, H, W)).astype(np.int32))
    key = jax.random.PRNGKey(0)

    import tempfile

    from dformer_tpu.utils.profiling import device_time_ms

    state, loss = step(state, rgb, gt, rgb, key)  # compile
    jax.block_until_ready(loss)
    # device-plane timing: on this runtime block_until_ready can return
    # before queued work completes, so a wall-clock loop reads absurdly
    # fast (9 ms for a ~250 ms step); the profiler's device plane is
    # ground truth (same method as bench.py)
    logdir = tempfile.mkdtemp(prefix="train_bench_")
    t0 = time.perf_counter()
    jax.profiler.start_trace(logdir)
    for _ in range(args.reps):
        state, loss = step(state, rgb, gt, rgb, key)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    wall = (time.perf_counter() - t0) / args.reps
    dev_ms = device_time_ms(logdir)
    dt = (dev_ms / args.reps / 1000.0) if dev_ms else wall
    ips = B / dt
    print(f"config: {args.config} bs={B} {H}x{W} bf16 train step")
    print(f"step {dt * 1000:.1f} ms (device plane)  ->  {ips:.1f} "
          f"img/s/chip (epoch of {cfg.num_train_imgs} imgs ≈ "
          f"{cfg.num_train_imgs / ips:.0f}s)")


if __name__ == "__main__":
    main()
