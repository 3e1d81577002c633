#!/usr/bin/env python
"""End-to-end input-pipeline benchmark (VERDICT r3 #2): measures whether the
host loaders can feed the device at its consumption rate, using a synthetic
ON-DISK dataset with real JPEG/PNG decode (tools/make_synth_dataset.py).

Counterpart of the reference's 16-worker torch DataLoader pipeline
(utils/dataloader/dataloader.py:126-177) on this image's ONE-CPU host.

Phases:
  1. loader-only sustained feed rate (thread Loader and, if built, the C++
     NativeBatchLoader) — img/s decoded+collated, no device.
  2. --e2e: the full jitted train step consuming the loader through the
     device-side augment, exactly as Trainer.run_epoch does. Total wall
     clock over the steady-state epoch (queue drained at the end) is the
     end-to-end ground truth; the device plane gives the compute floor.

Usage:
  python tools/pipeline_bench.py --root /tmp/synth_nyu            # loaders
  python tools/pipeline_bench.py --root /tmp/synth_nyu --e2e \
      --config local_configs.NYUDepthv2.DFormer_Large             # full
"""

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def bench_loader(loader, name, warm_batches=2):
    n_img = 0
    t0 = None
    for i, b in enumerate(loader):
        if i + 1 == warm_batches:
            t0 = time.perf_counter()
            n_img = 0
            continue
        n_img += len(b["rgb"])
    dt = time.perf_counter() - t0
    print(f"{name}: {n_img / dt:.1f} img/s sustained "
          f"({n_img} imgs, {dt:.1f}s)")
    return n_img / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_nyu")
    ap.add_argument("--config", default="local_configs.NYUDepthv2.DFormer_Large")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--n-train", type=int, default=795)
    ap.add_argument("--e2e", action="store_true")
    args = ap.parse_args()

    if not osp.isdir(osp.join(args.root, "NYUDepthv2", "RGB")):
        from tools.make_synth_dataset import generate

        print(f"generating synthetic dataset at {args.root} ...")
        generate(args.root, n_train=args.n_train)
    os.environ["DFORMER_DATA_ROOT"] = args.root

    from dformer_tpu.config import load_config
    from dformer_tpu.data import native_loader
    from dformer_tpu.data.loader import Loader, train_batches

    cfg = load_config(args.config)
    cfg.batch_size = args.batch

    # -- phase 1: loaders alone (device untouched; light host-only epoch)
    thread_loader = train_batches(cfg)
    assert isinstance(thread_loader, Loader)
    thread_loader.num_threads = args.threads
    thread_loader.set_epoch(1)
    thread_rate = bench_loader(thread_loader,
                               f"thread Loader (x{args.threads})")

    native_rate = None
    if native_loader.available():
        nat = train_batches(cfg, native=True)
        nat.set_epoch(1)
        native_rate = bench_loader(nat, "native C++ loader")
    else:
        print("native loader: not built (run make -C native)")

    if not args.e2e:
        return

    # -- phase 2: loader -> device augment -> jitted train step
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dformer_tpu.data.augment import device_train_augment
    from dformer_tpu.models import build_model
    from dformer_tpu.parallel.mesh import make_mesh
    from dformer_tpu.train.loop import TrainState, make_train_step
    from dformer_tpu.train.optim import make_optimizer
    from dformer_tpu.utils.profiling import (device_time_ms,
                                               start_device_trace)

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
    key = jax.random.PRNGKey(0)
    norm = dict(
        mean=jnp.asarray(cfg.norm_mean, jnp.float32),
        std=jnp.asarray(cfg.norm_std, jnp.float32),
        x_mean=jnp.asarray([0.48] * 3 if cfg.x_is_single_channel
                           else cfg.norm_mean, jnp.float32),
        x_std=jnp.asarray([0.28] * 3 if cfg.x_is_single_channel
                          else cfg.norm_std, jnp.float32),
    )

    def run_epoch(loader, epoch, profile_dir=None, prefetch=False):
        """Per-phase host timers localize any e2e gap: 'loader' = blocked on
        the decode queue, 'put' = jnp.asarray transfers, 'aug'/'step' = jit
        dispatch (should be ~0 if dispatch is async on this runtime)."""
        loader.set_epoch(epoch)
        it = 0
        ph = dict(loader=0.0, put=0.0, aug=0.0, step=0.0)
        t0 = time.perf_counter()
        if profile_dir:
            start_device_trace(profile_dir)
        nonlocal state
        loss = None

        def put(batch):
            return {k: jnp.asarray(batch[k]) for k in ("rgb", "gt", "modal_x")}

        if prefetch:
            from dformer_tpu.data.prefetch import device_prefetch

            stream = iter(device_prefetch(loader, put, depth=2))
        else:
            stream = iter(loader)
        while True:
            t = time.perf_counter()
            got = next(stream, None)
            if got is None:
                break
            ph["loader"] += time.perf_counter() - t
            t = time.perf_counter()
            arrs = got if prefetch else put(got)
            ph["put"] += time.perf_counter() - t
            t = time.perf_counter()
            k2 = jax.random.fold_in(key, epoch * 100003 + it)
            rgb, gt, modal = device_train_augment(
                arrs["rgb"], arrs["gt"], arrs["modal_x"], k2, (H, W),
                tuple(cfg.train_scale_array), norm["mean"], norm["std"],
                norm["x_mean"], norm["x_std"])
            ph["aug"] += time.perf_counter() - t
            t = time.perf_counter()
            state, loss = step(state, rgb, gt, modal, key)
            ph["step"] += time.perf_counter() - t
            it += 1
        jax.block_until_ready(loss)
        if profile_dir:
            jax.profiler.stop_trace()
        wall = time.perf_counter() - t0
        drain = wall - sum(ph.values())
        print(f"    host phases: loader {ph['loader']:.1f}s, put "
              f"{ph['put']:.1f}s, aug-dispatch {ph['aug']:.1f}s, "
              f"step-dispatch {ph['step']:.1f}s, final-drain {drain:.1f}s",
              flush=True)
        return wall, it

    first = True
    for name, mk in (("thread", lambda: train_batches(cfg)),
                     ("native", lambda: train_batches(cfg, native=True))):
        if name == "native" and not native_loader.available():
            continue
        loader = mk()
        if first:
            print(f"[{name}] epoch 1 (compile) ...", flush=True)
            run_epoch(loader, 1)
            first = False
        import tempfile

        for pf in (False, True):
            logdir = tempfile.mkdtemp(prefix="pipe_bench_")
            wall, iters = run_epoch(loader, 2 + pf, profile_dir=logdir,
                                    prefetch=pf)
            dev_ms = device_time_ms(logdir)
            imgs = iters * args.batch
            dev_s = dev_ms / 1000.0 if dev_ms else float("nan")
            print(f"[{name}{'+prefetch' if pf else ''}] e2e epoch: "
                  f"{imgs} imgs in {wall:.1f}s = "
                  f"{imgs / wall:.1f} img/s  (device busy {dev_s:.1f}s = "
                  f"{100 * dev_s / wall:.0f}% overlap; device-rate ceiling "
                  f"{imgs / dev_s:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
