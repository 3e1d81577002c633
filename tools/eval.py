#!/usr/bin/env python
"""Checkpoint evaluation — counterpart of reference utils/eval.py (eval.sh).

Evaluates a checkpoint (orbax dir from tools/train.py, or a torch .pth via
the converter) with single-scale or multi-scale+flip (+ sliding) inference.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--continue_fpath", default=None,
                    help="checkpoint path (orbax dir or torch .pth)")
    ap.add_argument("--mst", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--sliding", action=argparse.BooleanOptionalAction,
                    default=False)
    ap.add_argument("--amp", action=argparse.BooleanOptionalAction,
                    default=False, help="bf16 eval; default fp32 for parity")
    ap.add_argument("--val_batch_size", type=int, default=4)
    ap.add_argument("--synthetic-data", action="store_true")
    ap.add_argument("--save_path", default=None)
    ap.add_argument("--exported", default=None,
                    help="serve an AOT artifact (tools/export.py) instead "
                         "of a checkpoint: single-scale eval at the "
                         "artifact's lowered resolution (implies --no-mst)")
    ap.add_argument("--parity-check", action="store_true",
                    help="print mIoU delta vs the reference's published "
                         "number for this config (NYU DFormer-L 57.2 / "
                         "SUNRGBD DFormer-L 52.5, reference README.md:"
                         "133-134; tolerance ±0.2 per BASELINE.json). Run "
                         "with the released checkpoint via --continue_fpath "
                         "and the real dataset on disk.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if not args.amp:
        jax.config.update("jax_default_matmul_precision", "highest")

    from dformer_tpu.config import load_config
    from dformer_tpu.eval.evaluate import Evaluator
    from dformer_tpu.models import build_model
    from dformer_tpu.runtime.engine import Engine
    from dformer_tpu.utils.convert import (convert_model_state,
                                           load_into_variables,
                                           load_torch_checkpoint)

    cfg = load_config(args.config)
    with Engine(cfg, make_dirs=False) as engine:
        log = engine.logger
        if args.exported:
            from dformer_tpu.runtime.export import load_exported

            if args.mst or args.sliding:
                log.info("--exported serves the artifact's single lowered "
                         "shape: MSF/sliding disabled for this run")
            args.mst = False
            args.sliding = False
            model, variables = None, {}
        else:
            dtype = jnp.bfloat16 if args.amp else None
            model = build_model(cfg, dtype=dtype)
            shape = (1, cfg.image_height, cfg.image_width, 3)
            variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                            jnp.zeros(shape), jnp.zeros(shape))

        if args.continue_fpath and not args.exported:
            if args.continue_fpath.endswith((".pth", ".pt", ".pth.tar")):
                sd = load_torch_checkpoint(args.continue_fpath)
                p, s = convert_model_state(sd)
                variables, matched = load_into_variables(variables, p, s)
                log.info(f"converted torch checkpoint: {len(matched)} tensors")
            else:
                from dformer_tpu.train.checkpoint import CheckpointManager
                from dformer_tpu.train.loop import TrainState
                from dformer_tpu.train.optim import make_optimizer
                tx = make_optimizer(cfg, variables["params"])
                state = TrainState(step=jnp.asarray(0),
                                   params=variables["params"],
                                   batch_stats=variables["batch_stats"],
                                   opt_state=tx.init(variables["params"]))
                cm = CheckpointManager(os.path.dirname(args.continue_fpath)
                                       or ".", logger=log)
                state, _ = cm.restore(state, args.continue_fpath)
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}

        from dformer_tpu.parallel.mesh import make_local_mesh, make_mesh

        mesh = make_local_mesh() if jax.process_count() > 1 else make_mesh()
        if args.exported:
            # single-device serving: the artifact was lowered without
            # shardings (see Evaluator.from_exported)
            ev = Evaluator.from_exported(load_exported(args.exported), cfg)
            log.info(f"serving AOT artifact {args.exported}")
        else:
            ev = Evaluator(model, variables, cfg, sliding=args.sliding,
                           mesh=mesh)
        from tools.train import _val_iter
        batches = _val_iter(cfg, engine, args)

        save_hook = None
        if args.save_path:
            from dformer_tpu.eval.visualize import make_save_hook
            save_hook = make_save_hook(cfg, args.save_path)

        if args.mst:
            scales = cfg.eval_scale_array
            if scales == [1]:
                scales = [0.5, 0.75, 1.0, 1.25, 1.5]  # eval.sh --mst default
            m = ev.evaluate_msf(batches, scales=scales, flip=cfg.eval_flip,
                                save_hook=save_hook)
        else:
            m = ev.evaluate(batches, save_hook=save_hook)
        m.merge_across_processes()
        ious, miou = m.compute_iou()
        accs, macc = m.compute_pixel_acc()
        f1s, mf1 = m.compute_f1()
        for name, iou in zip(cfg.class_names, ious):
            log.info(f"  {name}: {iou}")
        log.info(f"mIoU {miou} mAcc {macc} mF1 {mf1}")
        print(dict(mIoU=miou, mAcc=macc, mF1=mf1))
        if args.parity_check:
            import json

            # published MSF-eval targets, reference README.md:133-134
            targets = {("NYUDepthv2", "DFormer-Large"): 57.2,
                       ("SUNRGBD", "DFormer-Large"): 52.5}
            target = targets.get((cfg.dataset_name, cfg.backbone))
            tol = 0.2  # BASELINE.json parity tolerance
            if target is None:
                print(json.dumps(dict(
                    parity_check="no published target for "
                                 f"{cfg.dataset_name}/{cfg.backbone}",
                    mIoU=miou)))
            else:
                delta = round(miou - target, 2)
                print(json.dumps(dict(
                    mIoU=miou, target=target, delta_vs_target=delta,
                    tolerance=tol, within_tolerance=abs(delta) <= tol,
                    synthetic=bool(args.synthetic_data))))


if __name__ == "__main__":
    main()
