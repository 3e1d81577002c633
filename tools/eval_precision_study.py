"""Quantify eval-precision sensitivity: fp32 vs bf16 mIoU delta.

The reference's published numbers come from fp16-autocast eval
(/root/reference/train.sh:25-26 --val_amp, utils/eval.py); this repo offers
fp32 and bf16. To put an error budget on the +-0.2 mIoU parity band, this
study drives the SAME weights (the reference-parity fixture's converted
torch model — tests/ref_stubs builds the actual /root/reference code) through
the batched evaluator at both precisions and reports the metric deltas,
plus the torch-fp32 oracle as ground truth.

Run on CPU: python tools/eval_precision_study.py  (~3 min)
"""

import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import torch

    import ref_stubs
    from dformer_tpu.config import load_config
    from dformer_tpu.eval.evaluate import Evaluator
    from dformer_tpu.models import build_model
    from dformer_tpu.utils.convert import (convert_model_state,
                                           load_into_variables)
    from test_reference_parity import _randomize, _ref_cfg

    hw = (96, 128)
    cfg = load_config("local_configs.NYUDepthv2.DFormer_Tiny")
    ref = ref_stubs.build_reference_model(_ref_cfg(cfg))
    _randomize(ref)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.RandomState(3)
    batches = []
    for _ in range(4):
        rgb = rng.normal(0, 1, (4, hw[0], hw[1], 3)).astype(np.float32)
        modal = rng.normal(0, 1, (4, hw[0], hw[1], 3)).astype(np.float32)
        gt = rng.randint(0, cfg.num_classes, (4, hw[0], hw[1]))
        gt = np.where(rng.rand(*gt.shape) < 0.05, cfg.background, gt)
        batches.append(dict(rgb=rgb, modal_x=modal, gt=gt.astype(np.int64)))

    results = {}
    for name, dtype in (("fp32", None), ("bf16", jnp.bfloat16)):
        model = build_model(cfg, dtype=dtype, pallas="off")
        z = jnp.zeros((1, hw[0], hw[1], 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), z, z)
        params, stats = convert_model_state(sd)
        variables, _ = load_into_variables(variables, params, stats)
        ev = Evaluator(model, variables, cfg)
        m = ev.evaluate_msf(batches, scales=[0.5, 1.0, 1.5], flip=True)
        _, miou = m.compute_iou()
        _, macc = m.compute_pixel_acc()
        results[name] = (miou, macc)
        print(f"{name}: mIoU {miou:.4f} mAcc {macc:.4f}")

    d_miou = abs(results["fp32"][0] - results["bf16"][0])
    d_macc = abs(results["fp32"][1] - results["bf16"][1])
    print(f"delta: mIoU {d_miou:.4f} mAcc {d_macc:.4f}")
    print("NOTE: weights are the fixture's randomized-converted reference "
          "model (no trained checkpoints exist in this environment); "
          "deltas on trained weights are typically smaller because logit "
          "margins are larger.")


if __name__ == "__main__":
    main()
