#!/usr/bin/env python
"""Benchmark: DFormer-Large 480x640 inference throughput on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement: the jitted forward runs under a jax.profiler trace and the
throughput is computed from the DEVICE-plane execution time of the jitted
computation (summed xplane durations / iterations). Wall-clock loops are
unreliable on this environment's remote-tunnel runtime: block_until_ready
can return before queued work completes (reads fast), while host-side
chaining serializes eager dispatches (reads slow). The device plane is
ground truth. Falls back to naive wall timing if the xplane proto parser
is unavailable.

Baseline: the reference publishes no A100 throughput (BASELINE.md — harness
only). We use 60 img/s for DFormer-L fp16 480x640 on one A100 with the
reference's PyTorch stack — the center of a 40-100 img/s band derived in
BENCH_NOTES.md from (a) measured V100 fps of SegFormer-class models in the
reference's own vendored mmseg model zoo scaled by FLOPs and an A100/V100
factor, and (b) the reference's published training wall-clock. The >3x goal
in BASELINE.json corresponds to vs_baseline >= 3.0.
"""

import json
import os
import tempfile
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compile cache (verified to work on the axon backend):
    amortizes the multi-minute DFormer-L train-step compile across bench
    invocations. Must run before backend init."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax: cache is an optimization, never a requirement


def _wait_for_backend(attempts: int = 3, delay_s: float = 60.0):
    """The tunneled TPU backend occasionally reports Unavailable for a
    stretch; retry init a few times before giving up so a transient flake
    doesn't zero out the benchmark run."""
    import jax

    for i in range(attempts):
        try:
            return jax.devices()
        except RuntimeError as e:
            if i == attempts - 1:
                raise
            print(f"# backend unavailable ({e}); retry {i + 1}/{attempts - 1} "
                  f"in {delay_s:.0f}s", flush=True)
            time.sleep(delay_s)


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="DFormer-Large",
                    help="variant to bench (the driver contract is the "
                         "default DFormer-Large line)")
    args = ap.parse_args()

    _enable_compile_cache()
    _wait_for_backend()
    from __graft_entry__ import _build

    batch = 8
    reps = 20
    _, model, variables = _build(args.backbone, (480, 640), 40,
                                 dtype=jnp.bfloat16)

    @jax.jit
    def forward(rgb, modal_x):
        out = model.apply(variables, rgb, modal_x, train=False,
                          deterministic_bases=True)
        return jnp.argmax(out, axis=-1).astype(jnp.int32)

    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(batch, 480, 640, 3).astype(np.float32))
    modal = jnp.asarray(rng.rand(batch, 480, 640, 3).astype(np.float32))

    jax.block_until_ready(forward(rgb, modal))  # compile
    for _ in range(3):
        jax.block_until_ready(forward(rgb, modal))

    logdir = tempfile.mkdtemp(prefix="bench_xplane_")
    t0 = time.perf_counter()
    jax.profiler.start_trace(logdir)
    for _ in range(reps):
        out = forward(rgb, modal)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    wall_ms = (time.perf_counter() - t0) * 1000

    try:
        from dformer_tpu.utils.profiling import device_time_ms

        dev_ms = device_time_ms(logdir)
    except Exception:
        dev_ms = None
    per_iter_ms = (dev_ms / reps) if dev_ms else (wall_ms / reps)
    ips = batch / (per_iter_ms / 1000.0)

    # -- train-step throughput on the same config (driver-visible version of
    # tools/train_bench.py, VERDICT r3 #4): full jitted fwd+bwd+AdamW step.
    train_ms = train_ips = None
    if args.backbone == "DFormer-Large":
        try:
            from dformer_tpu.config import load_config
            from dformer_tpu.models import build_model
            from dformer_tpu.parallel.mesh import make_mesh
            from dformer_tpu.train.loop import TrainState, make_train_step
            from dformer_tpu.train.optim import make_optimizer

            cfg = load_config("local_configs.NYUDepthv2.DFormer_Large")
            t_model = build_model(cfg, dtype=jnp.bfloat16)
            t_vars = jax.jit(t_model.init)(jax.random.PRNGKey(0),
                                           jnp.zeros((1, 480, 640, 3)),
                                           jnp.zeros((1, 480, 640, 3)))
            tx = make_optimizer(cfg, t_vars["params"])
            state = TrainState(step=jnp.asarray(0), params=t_vars["params"],
                               batch_stats=t_vars["batch_stats"],
                               opt_state=tx.init(t_vars["params"]))
            step = make_train_step(t_model, tx, cfg, make_mesh())
            gt = jnp.asarray(rng.randint(0, 40, (batch, 480, 640))
                             .astype(np.int32))
            key = jax.random.PRNGKey(0)
            state, loss = step(state, rgb, gt, modal, key)  # compile
            jax.block_until_ready(loss)
            tdir = tempfile.mkdtemp(prefix="bench_train_")
            jax.profiler.start_trace(tdir)
            for _ in range(reps):
                state, loss = step(state, rgb, gt, modal, key)
            jax.block_until_ready(loss)
            jax.profiler.stop_trace()
            tdev = device_time_ms(tdir)
            if tdev:
                train_ms = round(tdev / reps, 1)
                train_ips = round(batch / (tdev / reps / 1000.0), 2)
        except Exception as e:  # train extras must never sink the headline
            print(f"# train-step bench skipped: {e!r}")

    baseline_a100_ips = 60.0  # calibrated for DFormer-Large (BENCH_NOTES.md)
    slug = args.backbone.lower().replace("dformer-", "dformer_")
    record = {
        "metric": f"{slug}_480x640_infer_throughput",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": (round(ips / baseline_a100_ips, 3)
                        if args.backbone == "DFormer-Large" else None),
    }
    if train_ms is not None:
        record["train_step_ms_bs8"] = train_ms
        record["train_imgs_per_sec_per_chip"] = train_ips
    print(json.dumps(record))


if __name__ == "__main__":
    main()
