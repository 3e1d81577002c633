"""Per-op device-plane breakdown of the full jitted train step
(fwd + bwd + AdamW), DFormer-Large bs8 480x640 by default.

Usage: python tools/profile_train.py [batch] [config]
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_ops import op_breakdown  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from dformer_tpu.config import load_config
    from dformer_tpu.models import build_model
    from dformer_tpu.train.loop import TrainState, make_train_step
    from dformer_tpu.train.optim import make_optimizer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    config = sys.argv[2] if len(sys.argv) > 2 else \
        "local_configs.NYUDepthv2.DFormer_Large"
    reps = 10
    cfg = load_config(config)
    H, W = cfg.image_height, cfg.image_width
    model = build_model(cfg, dtype=jnp.bfloat16)
    z = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), z, z)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(step=jnp.asarray(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = make_train_step(model, tx, cfg)

    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(batch, H, W, 3).astype(np.float32))
    gt = jnp.asarray(
        rng.randint(0, cfg.num_classes, (batch, H, W)).astype(np.int32))
    key = jax.random.PRNGKey(0)

    state, loss = step(state, rgb, gt, rgb, key)  # compile
    jax.block_until_ready(loss)
    for _ in range(2):
        state, loss = step(state, rgb, gt, rgb, key)
    jax.block_until_ready(loss)

    from dformer_tpu.utils.profiling import start_device_trace

    logdir = tempfile.mkdtemp(prefix="trainprof_")
    start_device_trace(logdir)  # slim: per-op device events survive, the
    # multi-hundred-MB HLO proto download does not (utils/profiling.py)
    for _ in range(reps):
        state, loss = step(state, rgb, gt, rgb, key)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    print(f"batch={batch} config={config} reps={reps} (divide totals by reps)")
    op_breakdown(logdir)


if __name__ == "__main__":
    main()
