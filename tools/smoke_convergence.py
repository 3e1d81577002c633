#!/usr/bin/env python
"""End-to-end learning smoke: train DFormer-Tiny on a learnable synthetic
task (labels = quantized smooth field, rgb/depth derived from the field) and
verify held-out mIoU far above chance. Validates the full gradient/optimizer/
BN-stat path semantically, without datasets on disk.

Measured on v5e: 600 steps ≈ 40s, final mIoU ≈ 87 (chance = 25).

--trav: same idea for DFormerTrav-Base (BASELINE config #5): the label's
low bit is derivable ONLY from the 360-beam lidar scan (scan-mean
threshold — see make_trav_batch for why it must be a value statistic),
the high bit only from the RGB field — held-out mIoU >> the ~33
low-bit-at-chance ceiling proves gradients flow through the
Attention1Dto2D lidar expansion (reference DFormer.py:308-339) and train
it to a useful signal, not merely to finite values
(tests/test_trav_fss.py covers that).

Measured on v5e: --trav --steps 600 = 89s post-startup (startup — jit
init + train-step program load over the tunnel — is ~8-9 min); final
held-out mIoU 96.3, chance 25 (BENCH_NOTES.md 2026-08-19)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_batch(rng, B=8, hw=(64, 96), num_classes=4):
    import jax
    import jax.numpy as jnp
    import numpy as np

    base = rng.rand(B, 8, 12, 1).astype(np.float32)
    field = np.asarray(jax.image.resize(jnp.asarray(base),
                                        (B, hw[0], hw[1], 1), "linear"))
    rgb = np.concatenate([field, 1 - field, 0.5 + 0 * field], -1) \
        + 0.05 * rng.randn(B, hw[0], hw[1], 3).astype(np.float32)
    gt = np.clip((field[..., 0] * num_classes).astype(np.int32), 0,
                 num_classes - 1)
    depth = np.repeat(field, 3, axis=-1).astype(np.float32)
    return (jnp.asarray(rgb.astype(np.float32)), jnp.asarray(gt),
            jnp.asarray(depth))


def make_trav_batch(rng, B=8, hw=(64, 96), beams=360):
    """Learnable lidar task: gt = 2*(rgb field > .5) + scan_bit, where
    scan_bit = (mean of the 360-beam scan > 0.5) — a value-statistic the
    Attention1Dto2D expansion CAN express. The low bit exists ONLY in the
    scan; samples are resampled to keep |mean - 0.5| >= 0.03 so the
    threshold bit is crisp.

    Why a global statistic and not a per-column bit: the reference module
    (and ours, faithfully) embeds each beam by its VALUE only
    (input_proj(scan[:, b]), reference DFormer.py:315-330) with no
    positional encoding, so its output is a permutation-invariant
    functional of the scan's values — beam-INDEXED targets are
    architecturally unrecoverable. Measured: the per-column-bit variant of
    this task plateaus at mIoU 42.3 (vs the 33.3 low-bit-at-chance floor;
    the residue is correlation between the bit and global scan statistics)
    at both 400 and 1200 steps — BENCH_NOTES 2026-08-19."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    base = rng.rand(B, 8, 12, 1).astype(np.float32)
    field = np.asarray(jax.image.resize(jnp.asarray(base),
                                        (B, hw[0], hw[1], 1), "linear"))
    rgb = np.concatenate([field, 1 - field, 0.5 + 0 * field], -1) \
        + 0.05 * rng.randn(B, hw[0], hw[1], 3).astype(np.float32)

    def expand(c):  # 12 smooth control points -> 360-beam scan
        return np.array(jax.image.resize(  # np.array: writable copy
            jnp.asarray(c), (c.shape[0], 1, beams, 1), "linear"))[:, 0, :, 0]

    scan = expand(rng.rand(B, 1, 12, 1).astype(np.float32))
    for _ in range(50):  # keep the threshold bit away from the boundary
        bad = np.abs(scan.mean(1) - 0.5) < 0.03
        if not bad.any():
            break
        scan[bad] = expand(rng.rand(int(bad.sum()), 1, 12, 1)
                           .astype(np.float32))
    scan_bit = (scan.mean(1) > 0.5).astype(np.int32)  # [B]
    gt = 2 * (field[..., 0] > 0.5).astype(np.int32) \
        + scan_bit[:, None, None]
    return (jnp.asarray(rgb.astype(np.float32)), jnp.asarray(gt),
            jnp.asarray(scan.astype(np.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--min_miou", type=float, default=60.0)
    ap.add_argument("--trav", action="store_true",
                    help="DFormerTrav lidar-expansion convergence smoke")
    args = ap.parse_args()

    from dformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dformer_tpu.config import load_config
    from dformer_tpu.models import build_model
    from dformer_tpu.ops.metrics import Metrics
    from dformer_tpu.train.loop import TrainState, make_train_step
    from dformer_tpu.train.optim import make_optimizer

    if args.trav:
        cfg = load_config("local_configs.Trav.DFormer_Base")
    else:
        cfg = load_config("local_configs.NYUDepthv2.DFormer_Tiny")
    cfg.num_classes = 4
    cfg.image_height, cfg.image_width = 64, 96
    # scale the warmup-poly schedule to the requested run length (default
    # 600 steps = 10x60 unchanged); without this, --steps beyond 600 train
    # at the decayed-to-zero tail LR and learn nothing further
    cfg.nepochs, cfg.warm_up_epoch = 10, 1
    cfg.niters_per_epoch = max(60, args.steps // cfg.nepochs)
    cfg.lr = 3e-4

    mk = make_trav_batch if args.trav else make_batch
    model = build_model(cfg, dtype=jnp.bfloat16)
    modal_zero = jnp.zeros((1, 360)) if args.trav \
        else jnp.zeros((1, 64, 96, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 96, 3)),
                                    modal_zero)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(step=jnp.asarray(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = make_train_step(model, tx, cfg, None)

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for it in range(args.steps):
        rgb, gt, depth = mk(rng)
        state, loss = step(state, rgb, gt, depth, key)
        if it % 100 == 0:
            print(f"it {it} loss {float(loss):.4f} ({time.time() - t0:.0f}s)",
                  flush=True)

    eval_vars = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def fwd(r, m):
        return model.apply(eval_vars, r, m, train=False,
                           deterministic_bases=True)

    metrics = Metrics(4, 255)
    erng = np.random.RandomState(123)
    for _ in range(10):
        rgb, gt, depth = mk(erng)
        metrics.update(fwd(rgb, depth), gt)
    ious, miou = metrics.compute_iou()
    print(f"final loss {float(loss):.4f}  held-out mIoU {miou} "
          f"(chance 25.0)  per-class {ious}")
    assert miou >= args.min_miou, f"mIoU {miou} < {args.min_miou}"
    print("CONVERGENCE SMOKE: PASS")


if __name__ == "__main__":
    main()
