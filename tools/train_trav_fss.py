#!/usr/bin/env python
"""Few-shot episodic Trav training — counterpart of reference
utils/train_trav_fss_v1.py: meta_forward prototype loss, only
attn_expand_e + stage-0 + decoder trainable, episode-based eval."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="local_configs.Trav.DFormer_Base")
    ap.add_argument("--s_csv", default=None, help="support manifest")
    ap.add_argument("--q_csv", default=None, help="query manifest")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--class-episodes", action="store_true",
                    help="class-grouped episodes (reference "
                         "get_fs_train_loader, dataloader.py:229-323): rows "
                         "grouped by dominant mask class, each episode draws "
                         "K support + Q query from one class's pool; adds "
                         "the contrastive prototype term")
    ap.add_argument("--queries", type=int, default=1,
                    help="Q query images per class episode")
    ap.add_argument("--contrastive-weight", type=float, default=0.1,
                    help="weight of the prototype InfoNCE term in "
                         "--class-episodes mode (reference ContrastiveLoss, "
                         "models/builder.py:61-88)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dformer_tpu.config import load_config
    from dformer_tpu.data.loader import Loader
    from dformer_tpu.data.trav import (FewShotTravDatasetBinary,
                                       FewShotTravRGBDDataset,
                                       load_trav_csv, trav_prepare_batch)
    from dformer_tpu.models import build_model
    from dformer_tpu.runtime.engine import Engine
    from dformer_tpu.train.checkpoint import CheckpointManager
    from dformer_tpu.train.fss import (fss_evaluate, fss_trainable_mask,
                                       make_fss_train_step)
    from dformer_tpu.train.loop import TrainState
    from dformer_tpu.train.optim import make_optimizer
    from dformer_tpu.utils.convert import (convert_encoder_state,
                                           load_into_variables,
                                           load_torch_checkpoint,
                                           strip_prefixes)

    cfg = load_config(args.config)
    epochs = args.epochs or cfg.get("epochs", cfg.nepochs)
    with Engine(cfg) as engine:
        log = engine.logger
        s_df = load_trav_csv(args.s_csv or cfg.train_source)
        s_df = s_df[s_df["label"].notna() & (s_df["label"] != "")]
        q_df = load_trav_csv(args.q_csv or cfg.eval_source)

        if args.class_episodes:
            train_ds = FewShotTravRGBDDataset(
                s_df, class_names=(0, 1), K=cfg.shots, Q=args.queries)
            batch = min(cfg.batch_size, len(train_ds))
        else:
            train_ds = FewShotTravDatasetBinary(
                s_df, q_df, n_shots=cfg.shots,
                max_iters=cfg.episodes_per_epoch)
            batch = cfg.batch_size
        val_ds = FewShotTravDatasetBinary(
            s_df, q_df, n_shots=cfg.shots, max_iters=cfg.eval_iterations)
        train_loader = Loader(train_ds, batch, shuffle=False,
                              drop_last=True, shard=engine.data_shard())
        cfg.niters_per_epoch = max(len(train_loader), 1)

        model = build_model(cfg, dtype=jnp.bfloat16)
        shape = (1, cfg.image_height, cfg.image_width, 3)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(engine.seed), jnp.zeros(shape),
            jnp.zeros((1, 360), jnp.float32))
        pretrained = cfg.get("pretrained_model")
        if pretrained and os.path.exists(pretrained):
            sd = strip_prefixes(load_torch_checkpoint(pretrained))
            p, s = convert_encoder_state(sd, trav=True)
            variables, matched = load_into_variables(
                variables, {"encoder_backbone": p}, {"encoder_backbone": s})
            log.info(f"loaded pretrained Trav encoder: {len(matched)} tensors")

        tmask = fss_trainable_mask(variables["params"])
        tx = make_optimizer(cfg, variables["params"], tmask)
        state = TrainState(step=jnp.asarray(0), params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=tx.init(variables["params"]))
        con_w = args.contrastive_weight if args.class_episodes else 0.0
        step = make_fss_train_step(model, tx, cfg, contrastive_weight=con_w)
        ckpt = CheckpointManager(cfg.checkpoint_dir, keep=5, logger=log)
        from dformer_tpu.runtime.wandb import WandbHook

        wb = WandbHook(cfg, rank=engine.rank, logger=log)

        rgb_mean = jnp.asarray(cfg.norm_mean, jnp.float32)
        rgb_std = jnp.asarray(cfg.norm_std, jnp.float32)
        key = jax.random.PRNGKey(engine.seed)

        def prep(b, k, mirror):
            B, S = b["s_img"].shape[:2]
            s_img, s_laser, s_gt = trav_prepare_batch(
                jnp.asarray(b["s_img"]).reshape((B * S,) + b["s_img"].shape[2:]),
                jnp.asarray(b["s_depth"]).reshape(B * S, -1), k,
                rgb_mean, rgb_std, mirror,
                jnp.asarray(b["s_gt"]).reshape((B * S,) + b["s_gt"].shape[2:]))
            q_img, q_laser, q_gt = trav_prepare_batch(
                jnp.asarray(b["q_img"]), jnp.asarray(b["q_depth"]).reshape(B, -1),
                k, rgb_mean, rgb_std, mirror, jnp.asarray(b["q_gt"]))
            return (s_img.reshape((B, S) + s_img.shape[1:]),
                    s_gt.reshape((B, S) + s_gt.shape[1:]),
                    s_laser.reshape(B, S, -1), q_img, q_gt, q_laser)

        from dformer_tpu.data.trav import class_episodes_to_meta_batch
        from dformer_tpu.runtime.preempt import PreemptionGuard

        guard = PreemptionGuard(logger=log).install()
        best = 0.0
        for epoch in range(1, epochs + 1):
            if guard.requested:
                rescue = ckpt.save(state, epoch - 1, best,
                                   extra={"preempted": True})
                log.info(f"preempted: state saved; resume from {rescue}")
                break
            train_loader.set_epoch(epoch)
            for it, b in enumerate(train_loader):
                if args.class_episodes:
                    b = class_episodes_to_meta_batch(b)
                k = jax.random.fold_in(key, epoch * 10007 + it)
                s_img, s_gt, s_laser, q_img, q_gt, q_laser = prep(b, k, True)
                state, loss = step(state, s_img, s_gt, s_laser, q_img, q_gt,
                                   q_laser, key)
            if con_w > 0:
                total, con = loss
                log.info(f"epoch {epoch}/{epochs} loss {float(total):.4f} "
                         f"(contrastive {float(con):.4f} @ w={con_w})")
            else:
                log.info(f"epoch {epoch}/{epochs} loss {float(loss):.4f}")

            def val_batches():
                for b in Loader(val_ds, 1):
                    s_img, s_gt, s_laser, q_img, q_gt, q_laser = \
                        prep(b, key, False)
                    yield dict(s_img=s_img, s_gt=s_gt, s_depth=s_laser,
                               q_img=q_img, q_gt=q_gt, q_depth=q_laser)

            eval_vars = {"params": state.params,
                         "batch_stats": state.batch_stats}
            m = fss_evaluate(model, eval_vars, val_batches(), cfg)
            _, miou = m.compute_iou()
            log.info(f"epoch {epoch} episodic mIoU {miou}")
            wb.log_fss_eval(epoch, m)
            if miou > best:
                best = miou
                # all hosts call save (orbax coordinates multihost writes)
                ckpt.save(state, epoch, miou)
        wb.finish()
        log.info(f"done; best episodic mIoU {best}")


if __name__ == "__main__":
    main()
