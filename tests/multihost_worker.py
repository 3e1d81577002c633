"""Worker for the 2-process jax.distributed CPU test
(tests/test_multiprocess.py).

Runs a few REAL train steps (Trainer + make_train_step + commit_global) on
deterministic synthetic data and prints the per-step losses as JSON.
With --world 1 it runs the same global batches single-process — the
multi-process run must reproduce those losses, proving the global-batch
semantics (per-host batch_size//world slices concatenated via
make_array_from_process_local_data, grads psum'd, BN stats global).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--world", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--phase", default="full",
                    choices=["full", "save", "resume"],
                    help="full: epochs 1-3. save: epoch 1 then all-host "
                         "orbax save. resume: restore + epochs 2-3. The "
                         "save+resume pair must reproduce full's losses "
                         "(multi-host checkpoint contract, "
                         "train/checkpoint.py:62-68)")
    ap.add_argument("--ckpt-dir", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if args.world > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.world, process_id=args.rank)

    import numpy as np
    import jax.numpy as jnp

    from dformer_tpu.config import AttrDict
    from dformer_tpu.models import build_model
    from dformer_tpu.parallel.mesh import make_mesh
    from dformer_tpu.train.loop import TrainState, Trainer
    from dformer_tpu.train.optim import make_optimizer

    H, W, NCLS, B = 64, 96, 8, 4
    cfg = AttrDict(
        backbone="DFormer-Tiny", decoder="ham", num_classes=NCLS,
        decoder_embed_dim=128, drop_path_rate=0.1, aux_rate=0.0,
        bn_eps=1e-3, bn_momentum=0.1, background=255,
        image_height=H, image_width=W, batch_size=B,
        lr=6e-5, lr_power=0.9, weight_decay=0.01, momentum=0.9,
        optimizer="AdamW", nepochs=2, niters_per_epoch=2, warm_up_epoch=1,
        train_scale_array=[1.0], norm_mean=[0.485, 0.456, 0.406],
        norm_std=[0.229, 0.224, 0.225], x_is_single_channel=True,
    )
    model = build_model(cfg, dtype=None, pallas="off")
    zeros = jnp.zeros((1, H, W, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), zeros, zeros)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(step=jnp.asarray(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))

    mesh = make_mesh()
    start_epoch = 1
    if args.phase == "resume":
        from dformer_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(args.ckpt_dir)
        state, start_epoch = ckpt.restore(state)
        assert start_epoch == 2, start_epoch
    trainer = Trainer(model, state, tx, cfg, mesh=mesh, seed=8964)

    # deterministic GLOBAL batches; each host slices its contiguous
    # rank-block (the order commit_global concatenates in)
    rng = np.random.RandomState(0)
    local = B // args.world
    lo, hi = args.rank * local, (args.rank + 1) * local

    class FakeLoader:
        def __len__(self):
            return 2

        def set_epoch(self, e):
            pass

        def __iter__(self):
            r = np.random.RandomState(0)
            for _ in range(2):
                rgb = (r.rand(B, H, W, 3) * 255).astype(np.uint8)
                gt = r.randint(0, NCLS, (B, H, W)).astype(np.int32)
                x = (r.rand(B, H, W, 3) * 255).astype(np.uint8)
                yield dict(rgb=rgb[lo:hi], gt=gt[lo:hi], modal_x=x[lo:hi])

    epochs = {"full": (1, 2, 3), "save": (1,), "resume": (2, 3)}[args.phase]
    means = [float(trainer.run_epoch(FakeLoader(), e)) for e in epochs]

    if args.phase == "save":
        from dformer_tpu.train.checkpoint import CheckpointManager

        # EVERY process calls save (orbax coordinates the multihost write)
        ckpt = CheckpointManager(args.ckpt_dir)
        ckpt.save(trainer.state, epoch=1, miou=0.5)
    if args.phase in ("save", "resume"):
        print("LOSSJSON " + json.dumps({
            "rank": args.rank, "means": means,
            "step": int(jax.device_get(trainer.state.step)),
        }))
        return

    # the in-training eval path: a per-host Evaluator over a LOCAL mesh must
    # accept the trainer's GLOBAL-mesh-committed variables (regression: a
    # naive device_put of global arrays onto local devices raises a
    # cross-host-transfer ValueError)
    from dformer_tpu.eval.evaluate import Evaluator
    from dformer_tpu.parallel.mesh import make_local_mesh

    eval_vars = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    eval_mesh = make_local_mesh() if args.world > 1 else mesh
    ev = Evaluator(model, eval_vars, cfg, mesh=eval_mesh)
    r = np.random.RandomState(7)
    vb = dict(rgb=r.rand(2, H, W, 3).astype(np.float32),
              modal_x=r.rand(2, H, W, 3).astype(np.float32),
              gt=r.randint(0, NCLS, (2, H, W)).astype(np.int64))
    m = ev.evaluate([vb])
    m.merge_across_processes()
    _, miou = m.compute_iou()

    print("LOSSJSON " + json.dumps({
        "rank": args.rank,
        "means": means,
        "miou": float(miou),
        "step": int(jax.device_get(trainer.state.step)),
    }))


if __name__ == "__main__":
    main()
