#!/usr/bin/env python
"""Training entry point — the TPU-native counterpart of reference
utils/train.py. Flags mirror the reference surface (train.sh:17-27); GPU/DDP
flags that have no TPU meaning are accepted and ignored with a note.

Examples:
  python tools/train.py --config=local_configs.NYUDepthv2.DFormer_Large
  python tools/train.py --config=local_configs.NYUDepthv2.DFormer_Tiny \
      --synthetic-data --epochs 2   # smoke run without datasets on disk
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def is_eval(epoch, cfg):
    # reference utils/train.py:60-61
    return epoch > int(cfg.checkpoint_start_epoch) or epoch == 1 \
        or epoch % 10 == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--continue_fpath", default=None)
    ap.add_argument("--amp", action=argparse.BooleanOptionalAction,
                    default=True, help="bf16 compute (TPU AMP equivalent)")
    ap.add_argument("--val_amp", action=argparse.BooleanOptionalAction,
                    default=False)
    ap.add_argument("--mst", action=argparse.BooleanOptionalAction,
                    default=True, help="multi-scale+flip val")
    ap.add_argument("--sliding", action=argparse.BooleanOptionalAction,
                    default=False)
    ap.add_argument("--syncbn", action=argparse.BooleanOptionalAction,
                    default=True, help="(always on under a mesh: global BN)")
    ap.add_argument("--compile", action=argparse.BooleanOptionalAction,
                    default=True, help="(always on: XLA jit)")
    ap.add_argument("--use_seed", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--epochs", type=int, default=None,
                    help="override cfg.nepochs")
    ap.add_argument("--synthetic-data", action="store_true",
                    help="random tensors instead of datasets on disk")
    ap.add_argument("--native-loader", action="store_true",
                    help="C++ decode pool for fixed-canvas datasets")
    ap.add_argument("--val_batch_size", type=int, default=4)
    ap.add_argument("--debug_nans", action="store_true",
                    help="raise on NaN (the TPU analog of the reference's "
                         "determinism/sanitizer knobs, SURVEY.md §5.2)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from dformer_tpu.config import load_config
    from dformer_tpu.data.loader import train_batches, val_batches
    from dformer_tpu.eval.evaluate import Evaluator
    from dformer_tpu.models import build_model
    from dformer_tpu.parallel.mesh import make_mesh
    from dformer_tpu.runtime.engine import Engine
    from dformer_tpu.train.checkpoint import CheckpointManager
    from dformer_tpu.train.loop import TrainState, Trainer
    from dformer_tpu.train.optim import (make_optimizer,
                                         trainable_mask_from_matched)
    from dformer_tpu.utils.convert import (convert_encoder_state,
                                           load_into_variables,
                                           load_torch_checkpoint,
                                           strip_prefixes)

    cfg = load_config(args.config)
    if args.epochs:
        cfg.nepochs = args.epochs
    with Engine(cfg) as engine:
        log = engine.logger
        mesh = make_mesh()
        log.info(f"devices: {jax.device_count()} mesh: {mesh.shape}")

        dtype = jnp.bfloat16 if args.amp else None
        model = build_model(cfg, dtype=dtype)
        rng = jax.random.PRNGKey(engine.seed)
        shape = (1, cfg.image_height, cfg.image_width, 3)
        variables = jax.jit(model.init)(rng, jnp.zeros(shape), jnp.zeros(shape))
        log.info("model initialized: %.2fM params" % (
            sum(p.size for p in jax.tree.leaves(variables["params"])) / 1e6))

        matched = []
        pretrained = cfg.get("pretrained_model")
        if pretrained and os.path.exists(pretrained):
            sd = strip_prefixes(load_torch_checkpoint(pretrained))
            trav = cfg.backbone.startswith("DFormerTrav")
            p, s = convert_encoder_state(sd, trav=trav)
            variables, enc_matched = load_into_variables(
                variables, {"encoder_backbone": p}, {"encoder_backbone": s})
            matched = enc_matched
            log.info(f"loaded pretrained encoder: {len(matched)} tensors; "
                     "loaded params frozen (reference DFormer.py:272-276)")
        elif pretrained:
            log.info(f"pretrained model {pretrained} not found; "
                     "training from scratch")

        params = variables["params"]
        tmask = trainable_mask_from_matched(params, matched) if matched else None
        # Trav rule: loaded params stay trainable (DFormer.py:408-433)
        if cfg.backbone.startswith("DFormerTrav"):
            tmask = None
        tx = make_optimizer(cfg, params, tmask)
        state = TrainState(step=jnp.asarray(0), params=params,
                           batch_stats=variables["batch_stats"],
                           opt_state=tx.init(params))

        ckpt = CheckpointManager(cfg.checkpoint_dir, keep=5, logger=log)
        start_epoch = 1
        if args.continue_fpath:
            state, start_epoch = ckpt.restore(state, args.continue_fpath)

        from dformer_tpu.runtime.tb import TBWriter

        tb = TBWriter(cfg.get("tb_dir"), rank=engine.rank)
        trainer = Trainer(model, state, tx, cfg, mesh=mesh, logger=log,
                          seed=engine.seed, tb=tb, trainable_mask=tmask)
        train_loader = train_batches(cfg, shard=engine.data_shard(),
                                     synthetic=args.synthetic_data,
                                     native=args.native_loader)
        from dformer_tpu.runtime.preempt import PreemptionGuard

        guard = PreemptionGuard(logger=log).install()
        best_miou = 0.0
        for epoch in range(start_epoch, cfg.nepochs + 1):
            t0 = time.time()
            mean_loss = trainer.run_epoch(train_loader, epoch,
                                          total_epochs=cfg.nepochs,
                                          guard=guard)
            tb.scalar("train/loss", mean_loss, epoch)
            log.info(f"epoch {epoch}/{cfg.nepochs} loss {mean_loss:.4f} "
                     f"({time.time() - t0:.1f}s)")
            if guard.requested:
                # preemption: save the live state under this epoch (resume
                # continues at epoch+1; best_miou keys retention so the
                # rescue checkpoint is never the pruning victim) and exit 0
                # within the SIGTERM grace window
                rescue = ckpt.save(trainer.state, epoch, best_miou,
                                   extra={"preempted": True})
                log.info(f"preempted during epoch {epoch}: state saved; "
                         f"resume with --continue_fpath={rescue}")
                break
            if is_eval(epoch, cfg):
                eval_vars = {"params": trainer.state.params,
                             "batch_stats": trainer.state.batch_stats}
                # eval shards per host: local mesh under multi-host (hists
                # merge host-level below), the full mesh on one host
                from dformer_tpu.parallel.mesh import make_local_mesh
                eval_mesh = make_local_mesh() if jax.process_count() > 1 \
                    else mesh
                ev = Evaluator(model, eval_vars, cfg, sliding=args.sliding,
                               mesh=eval_mesh)
                batches = _val_iter(cfg, engine, args)
                if args.mst:
                    # reference --mst validation hardcodes these scales+flip
                    # (utils/train.py:406-415) regardless of config
                    m = ev.evaluate_msf(batches,
                                        scales=[0.5, 0.75, 1.0, 1.25, 1.5],
                                        flip=True)
                else:
                    m = ev.evaluate(batches)
                # merge per-host shards before computing the selection metric
                # (reference all_gathers Metrics, val_mm.py:201-207)
                m.merge_across_processes()
                ious, miou = m.compute_iou()
                _, macc = m.compute_pixel_acc()
                _, mf1 = m.compute_f1()
                log.info(f"epoch {epoch} mIoU {miou} mAcc {macc} mF1 {mf1}")
                tb.scalar("val/mIoU", miou, epoch)
                tb.scalar("val/mAcc", macc, epoch)
                tb.scalar("val/mF1", mf1, epoch)
                if miou > best_miou:
                    best_miou = miou
                    # all hosts participate (orbax coordinates multihost
                    # writes; a rank gate would deadlock them)
                    ckpt.save(trainer.state, epoch, miou)
        tb.close()
        log.info(f"done; best mIoU {best_miou}")


def _val_iter(cfg, engine, args):
    from dformer_tpu.data.augment import normalize_batch
    from dformer_tpu.data.loader import val_batches

    import jax.numpy as jnp
    import numpy as np

    loader = val_batches(cfg, batch_size=args.val_batch_size,
                         shard=engine.data_shard(),
                         synthetic=args.synthetic_data)
    x_mean = np.asarray([0.48] * 3) if cfg.x_is_single_channel \
        else np.asarray(cfg.norm_mean)
    x_std = np.asarray([0.28] * 3) if cfg.x_is_single_channel \
        else np.asarray(cfg.norm_std)
    for b in loader:
        rgb, modal = normalize_batch(jnp.asarray(b["rgb"]),
                                     jnp.asarray(b["modal_x"]),
                                     jnp.asarray(cfg.norm_mean, jnp.float32),
                                     jnp.asarray(cfg.norm_std, jnp.float32),
                                     jnp.asarray(x_mean, jnp.float32),
                                     jnp.asarray(x_std, jnp.float32))
        out = dict(rgb=rgb, modal_x=modal, gt=b["gt"], fn=b.get("fn"))
        if "hw" in b:
            # variable-size (SUNRGBD) canvas batch: per-sample true extents,
            # consumed by Evaluator._true_extent_batches
            out["hw"] = b["hw"]
        yield out


if __name__ == "__main__":
    main()
