#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.pth/.pth.tar encoder pretrain or
full-model train checkpoint) to an orbax checkpoint loadable by tools/eval.py
and tools/train.py --continue_fpath."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--out", required=True, help="output orbax dir")
    ap.add_argument("--encoder-only", action="store_true",
                    help="treat as encoder pretrain (.pth.tar)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dformer_tpu.config import load_config
    from dformer_tpu.models import build_model
    from dformer_tpu.train.checkpoint import CheckpointManager
    from dformer_tpu.train.loop import TrainState
    from dformer_tpu.train.optim import make_optimizer
    from dformer_tpu.utils.convert import (convert_encoder_state,
                                           convert_model_state,
                                           load_into_variables,
                                           load_torch_checkpoint,
                                           strip_prefixes)

    jax.config.update("jax_platforms", "cpu")
    cfg = load_config(args.config)
    model = build_model(cfg, pallas="off")
    shape = (1, cfg.image_height, cfg.image_width, 3)
    x_e = jnp.zeros((1, 360), jnp.float32) \
        if cfg.backbone.startswith("DFormerTrav") else jnp.zeros(shape)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros(shape),
                                    x_e)

    sd = load_torch_checkpoint(args.torch_ckpt)
    if args.encoder_only:
        sd = strip_prefixes(sd)
        p, s = convert_encoder_state(
            sd, trav=cfg.backbone.startswith("DFormerTrav"))
        p, s = {"encoder_backbone": p}, {"encoder_backbone": s}
    else:
        p, s = convert_model_state(sd)
    variables, matched = load_into_variables(variables, p, s)
    print(f"converted {len(matched)} tensors from {args.torch_ckpt}")

    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(step=jnp.asarray(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    cm = CheckpointManager(args.out, keep=100)
    path = cm.save(state, epoch=0, miou=0.0,
                   extra=dict(source=args.torch_ckpt))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
