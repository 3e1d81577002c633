#!/usr/bin/env python
"""FLOPs / parameter count — counterpart of reference utils/benchmark.py
(thop at 1x3x480x640), using XLA's compiled cost analysis instead of
module hooks."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="local_configs.NYUDepthv2.DFormer_Large")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dformer_tpu.config import load_config
    from dformer_tpu.models import build_model

    cfg = load_config(args.config)
    model = build_model(cfg)
    shape = (1, args.height, args.width, 3)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros(shape),
                                    jnp.zeros(shape))
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))

    def forward(rgb, modal):
        return model.apply(variables, rgb, modal, train=False,
                           deterministic_bases=True)

    lowered = jax.jit(forward).lower(jnp.zeros(shape), jnp.zeros(shape))
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = cost.get("flops", float("nan"))
    print(f"config: {args.config} input {args.height}x{args.width}")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"flops:  {flops / 1e9:.2f} GFLOPs (XLA cost analysis)")
    print(f"bytes accessed: {cost.get('bytes accessed', float('nan')) / 1e9:.2f} GB")
    mem = compiled.memory_analysis()
    if mem is not None:
        # device-memory budget of the compiled executable (HBM on TPU):
        # what production sizing actually needs, absent in the reference's
        # thop-based harness (utils/benchmark.py counts only MACs/params)
        tot = (mem.argument_size_in_bytes + mem.output_size_in_bytes +
               mem.temp_size_in_bytes + mem.generated_code_size_in_bytes)
        print(f"device memory: args {mem.argument_size_in_bytes / 1e6:.1f} MB, "
              f"outputs {mem.output_size_in_bytes / 1e6:.1f} MB, "
              f"temps {mem.temp_size_in_bytes / 1e6:.1f} MB, "
              f"code {mem.generated_code_size_in_bytes / 1e6:.1f} MB, "
              f"total {tot / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
