#!/usr/bin/env python
"""AOT-export a checkpoint for serving: one StableHLO artifact with the
weights baked in (jax.export), loadable without model code or re-tracing.

The reference has no ahead-of-time serving path (utils/infer.py re-builds
the torch model and loads a .pth per process); this lowers the eval forward
once and ships the lowered module.

    python tools/export.py --config=local_configs.NYUDepthv2.DFormer_Large \
        --continue_fpath=<ckpt> --out model.shlo --platforms tpu
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--continue_fpath", default=None,
                    help="checkpoint (orbax dir or torch .pth); random init "
                         "when omitted (artifact-shape smoke runs)")
    ap.add_argument("--out", default="output/model.shlo")
    ap.add_argument("--batch", default="dynamic",
                    help="'dynamic' (symbolic batch, default) or a fixed int")
    ap.add_argument("--platforms", nargs="+", default=None,
                    help="lowering platforms, e.g. tpu cpu; default = "
                         "current backend")
    ap.add_argument("--amp", action=argparse.BooleanOptionalAction,
                    default=True, help="bf16 compute (serving default); "
                    "--no-amp exports the fp32 parity graph")
    ap.add_argument("--selftest", action="store_true",
                    help="reload the artifact and run one zero-input batch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if not args.amp:
        jax.config.update("jax_default_matmul_precision", "highest")

    from dformer_tpu.config import load_config
    from dformer_tpu.models import build_model
    from dformer_tpu.runtime.export import (export_forward, load_exported,
                                            save_exported)
    from dformer_tpu.utils.convert import (convert_model_state,
                                           load_into_variables,
                                           load_torch_checkpoint)

    cfg = load_config(args.config)
    dtype = jnp.bfloat16 if args.amp else None
    model = build_model(cfg, dtype=dtype)
    hw = (cfg.image_height, cfg.image_width)
    shape = (1, hw[0], hw[1], 3)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros(shape), jnp.zeros(shape))

    if args.continue_fpath:
        if args.continue_fpath.endswith((".pth", ".pt", ".pth.tar")):
            sd = load_torch_checkpoint(args.continue_fpath)
            p, s = convert_model_state(sd)
            variables, matched = load_into_variables(variables, p, s)
            print(f"converted torch checkpoint: {len(matched)} tensors")
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
                                   or ".")
            state, _ = cm.restore(state, args.continue_fpath)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}

    batch = None if args.batch == "dynamic" else int(args.batch)
    exported = export_forward(model, variables, hw, batch=batch,
                              platforms=args.platforms)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_exported(exported, args.out)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"exported {args.out}: {size_mb:.1f} MB, "
          f"platforms={exported.platforms}, "
          f"in_avals={[str(a) for a in exported.in_avals]}")

    if args.selftest:
        ex = load_exported(args.out)
        b = batch or 1
        rgb = np.zeros((b, hw[0], hw[1], 3), np.float32)
        out = ex.call(rgb, rgb)
        print(f"selftest ok: logits {out.shape} {out.dtype}")


if __name__ == "__main__":
    main()
