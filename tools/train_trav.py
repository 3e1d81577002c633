#!/usr/bin/env python
"""Trav semi-supervised driver — counterpart of reference
utils/train_trav_unlabeled_gt.py: supervised training on the labeled CSV,
then pseudo-label inference over the unlabeled CSV into a new manifest."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="local_configs.Trav.DFormer_Base")
    ap.add_argument("--labeled_csv", default=None)
    ap.add_argument("--unlabeled_csv", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--save_dir", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dformer_tpu.config import load_config
    from dformer_tpu.data.loader import Loader
    from dformer_tpu.data.trav import (TravRGBDLabeledDataset,
                                       labeled_unlabeled_split,
                                       trav_prepare_batch)
    from dformer_tpu.eval.pseudo_label import infer_unlabeled_masks
    from dformer_tpu.models import build_model
    from dformer_tpu.runtime.engine import Engine
    from dformer_tpu.train.loop import TrainState, make_train_step
    from dformer_tpu.train.optim import make_optimizer

    cfg = load_config(args.config)
    if args.epochs:
        cfg.nepochs = args.epochs
    labeled_csv = args.labeled_csv or cfg.train_source
    unlabeled_csv = args.unlabeled_csv or cfg.eval_source
    save_dir = args.save_dir or cfg.get("save_dir", "output/unlabeled_masks")

    with Engine(cfg) as engine:
        log = engine.logger
        train_df, unlabeled_df = labeled_unlabeled_split(labeled_csv,
                                                         unlabeled_csv)
        train_loader = Loader(TravRGBDLabeledDataset(train_df),
                              cfg.batch_size, shuffle=True, drop_last=True,
                              shard=engine.data_shard())
        cfg.niters_per_epoch = max(len(train_loader), 1)

        model = build_model(cfg, dtype=jnp.bfloat16)
        shape = (1, cfg.image_height, cfg.image_width, 3)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(engine.seed), jnp.zeros(shape),
            jnp.zeros((1, 360), jnp.float32))
        tx = make_optimizer(cfg, variables["params"])
        state = TrainState(step=jnp.asarray(0), params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=tx.init(variables["params"]))
        step = make_train_step(model, tx, cfg)

        rgb_mean = jnp.asarray(cfg.norm_mean, jnp.float32)
        rgb_std = jnp.asarray(cfg.norm_std, jnp.float32)
        key = jax.random.PRNGKey(engine.seed)
        for epoch in range(1, cfg.nepochs + 1):
            train_loader.set_epoch(epoch)
            for it, batch in enumerate(train_loader):
                k = jax.random.fold_in(key, epoch * 10007 + it)
                rgb, laser, gt = trav_prepare_batch(
                    jnp.asarray(batch["rgb"]), jnp.asarray(batch["laser"]),
                    k, rgb_mean, rgb_std, True, jnp.asarray(batch["gt"]))
                state, loss = step(state, rgb, gt, laser, key)
            log.info(f"epoch {epoch}/{cfg.nepochs} loss {float(loss):.4f}")

        # pseudo-label stage (utils/train_trav_unlabeled_gt.py:244-334)
        def unlabeled_batches():
            loader = Loader(TravRGBDLabeledDataset(unlabeled_df), 1)
            for b in loader:
                rgb, laser = trav_prepare_batch(
                    jnp.asarray(b["rgb"]), jnp.asarray(b["laser"]),
                    key, rgb_mean, rgb_std, False)
                yield dict(rgb=rgb, laser=laser, rgb_path=b["rgb_path"],
                           depth_path=b["depth_path"])

        eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
        csv_path = infer_unlabeled_masks(model, eval_vars,
                                         unlabeled_batches(), save_dir, log)
        log.info(f"pseudo-label manifest: {csv_path}")


if __name__ == "__main__":
    main()
