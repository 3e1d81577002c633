#!/usr/bin/env python
"""K-fold cross-validated Trav training — counterpart of the reference's
k-fold DDP driver (archive/train_trav_ddp.py + get_kfold_loaders,
utils/dataloader/dataloader.py:324-401): sklearn 4-fold split of the labeled
CSV, one supervised train+eval run per fold, mean mIoU report."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="local_configs.Trav.DFormer_Base")
    ap.add_argument("--csv", default=None, help="labeled manifest")
    ap.add_argument("--folds", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dformer_tpu.config import load_config
    from dformer_tpu.data.loader import Loader
    from dformer_tpu.data.trav import (TravRGBDLabeledDataset, kfold_splits,
                                       trav_prepare_batch)
    from dformer_tpu.models import build_model
    from dformer_tpu.ops.metrics import Metrics, confusion_matrix
    from dformer_tpu.runtime.engine import Engine
    from dformer_tpu.train.loop import TrainState, make_train_step
    from dformer_tpu.train.optim import make_optimizer

    cfg = load_config(args.config)
    if args.epochs:
        cfg.nepochs = args.epochs
    csv = args.csv or cfg.train_source

    with Engine(cfg) as engine:
        log = engine.logger
        folds = kfold_splits(csv, n_splits=args.folds)
        rgb_mean = jnp.asarray(cfg.norm_mean, jnp.float32)
        rgb_std = jnp.asarray(cfg.norm_std, jnp.float32)
        key = jax.random.PRNGKey(engine.seed)
        fold_mious = []

        for fi, (train_df, val_df) in enumerate(folds):
            log.info(f"fold {fi + 1}/{len(folds)}: "
                     f"{len(train_df)} train / {len(val_df)} val")
            train_loader = Loader(TravRGBDLabeledDataset(train_df),
                                  cfg.batch_size, shuffle=True, drop_last=True)
            cfg.niters_per_epoch = max(len(train_loader), 1)

            model = build_model(cfg, dtype=jnp.bfloat16)
            shape = (1, cfg.image_height, cfg.image_width, 3)
            variables = jax.jit(model.init)(
                jax.random.fold_in(key, fi), jnp.zeros(shape),
                jnp.zeros((1, 360), jnp.float32))
            tx = make_optimizer(cfg, variables["params"])
            state = TrainState(step=jnp.asarray(0),
                               params=variables["params"],
                               batch_stats=variables["batch_stats"],
                               opt_state=tx.init(variables["params"]))
            step = make_train_step(model, tx, cfg)

            for epoch in range(1, cfg.nepochs + 1):
                train_loader.set_epoch(epoch)
                for it, b in enumerate(train_loader):
                    k = jax.random.fold_in(key, (fi * 1000 + epoch) * 10007 + it)
                    rgb, laser, gt = trav_prepare_batch(
                        jnp.asarray(b["rgb"]), jnp.asarray(b["laser"]), k,
                        rgb_mean, rgb_std, True, jnp.asarray(b["gt"]))
                    state, loss = step(state, rgb, gt, laser, key)
                log.info(f"fold {fi} epoch {epoch} loss {float(loss):.4f}")

            eval_vars = {"params": state.params,
                         "batch_stats": state.batch_stats}

            @jax.jit
            def forward(rgb, laser):
                return model.apply(eval_vars, rgb, laser, train=False,
                                   deterministic_bases=True)

            metrics = Metrics(cfg.num_classes, cfg.background)
            for b in Loader(TravRGBDLabeledDataset(val_df), 1):
                rgb, laser = trav_prepare_batch(
                    jnp.asarray(b["rgb"]), jnp.asarray(b["laser"]), key,
                    rgb_mean, rgb_std, False)
                metrics.update(forward(rgb, laser), jnp.asarray(b["gt"]))
            _, miou = metrics.compute_iou()
            fold_mious.append(miou)
            log.info(f"fold {fi} mIoU {miou}")

        log.info(f"k-fold mIoUs {fold_mious}, "
                 f"mean {float(np.mean(fold_mious)):.2f}")


if __name__ == "__main__":
    main()
