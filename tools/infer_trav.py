#!/usr/bin/env python
"""Trav prediction dumps — counterpart of reference utils/infer_trav.py:
run a trained Trav model over a CSV manifest and save colorized PNGs."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="local_configs.Trav.DFormer_Base")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--continue_fpath", default=None)
    ap.add_argument("--save_path", default="output/trav_preds")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dformer_tpu.config import load_config
    from dformer_tpu.data.loader import Loader
    from dformer_tpu.data.trav import (TravRGBDLabeledDataset, load_trav_csv,
                                       trav_prepare_batch)
    from dformer_tpu.eval.visualize import palette_for, save_pred_png
    from dformer_tpu.models import build_model
    from dformer_tpu.runtime.engine import Engine
    from dformer_tpu.utils.convert import (convert_model_state,
                                           load_into_variables,
                                           load_torch_checkpoint)

    cfg = load_config(args.config)
    with Engine(cfg, make_dirs=False) as engine:
        log = engine.logger
        df = load_trav_csv(args.csv or cfg.eval_source)
        if "image" not in df.columns and "img" in df.columns:
            df = df.rename(columns={"img": "image", "laser": "depth"})
        model = build_model(cfg, dtype=jnp.bfloat16)
        shape = (1, cfg.image_height, cfg.image_width, 3)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros(shape),
            jnp.zeros((1, 360), jnp.float32))
        if args.continue_fpath and args.continue_fpath.endswith(
                (".pt", ".pth", ".pth.tar")):
            sd = load_torch_checkpoint(args.continue_fpath)
            p, s = convert_model_state(sd)
            variables, matched = load_into_variables(variables, p, s)
            log.info(f"converted torch checkpoint: {len(matched)} tensors")

        @jax.jit
        def forward(rgb, laser):
            return jnp.argmax(model.apply(variables, rgb, laser,
                                          train=False), axis=-1)

        palette = palette_for(cfg)
        rgb_mean = jnp.asarray(cfg.norm_mean, jnp.float32)
        rgb_std = jnp.asarray(cfg.norm_std, jnp.float32)
        key = jax.random.PRNGKey(0)
        n = 0
        for b in Loader(TravRGBDLabeledDataset(df), 1):
            rgb, laser = trav_prepare_batch(
                jnp.asarray(b["rgb"]), jnp.asarray(b["laser"]), key,
                rgb_mean, rgb_std, False)
            pred = np.asarray(forward(rgb, laser))[0].astype(np.uint8)
            name = os.path.splitext(os.path.basename(b["rgb_path"][0]))[0]
            save_pred_png(pred, os.path.join(args.save_path,
                                             f"{name}_pred.png"), palette)
            n += 1
        log.info(f"saved {n} predictions -> {args.save_path}")


if __name__ == "__main__":
    main()
