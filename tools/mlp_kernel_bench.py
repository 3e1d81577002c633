"""Microbenchmark the fused MLP kernel vs the XLA reference at a bench shape.

Usage: python tools/mlp_kernel_bench.py [B H W C ratio]
       GRAD=1 python tools/mlp_kernel_bench.py ...   # value+grad step
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dformer_tpu.utils.profiling import device_time_ms as device_ms  # noqa


def main():
    import jax
    import jax.numpy as jnp

    from dformer_tpu.kernels.fused_mlp import fused_mlp, fused_mlp_reference

    args = [int(a) for a in sys.argv[1:]] or [8, 120, 160, 96, 8]
    B, H, W, C, ratio = args
    Ch = C * ratio
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32),
                    jnp.bfloat16)
    ln_w = jnp.asarray(rng.uniform(0.8, 1.2, (C,)).astype(np.float32))
    ln_b = jnp.asarray(rng.normal(0, 0.05, (C,)).astype(np.float32))
    fc1_w = jnp.asarray(rng.normal(0, C ** -0.5, (C, Ch)).astype(np.float32),
                        jnp.bfloat16)
    fc1_b = jnp.asarray(rng.normal(0, 0.05, (Ch,)).astype(np.float32))
    pos_w = jnp.asarray(rng.normal(0, 0.2, (3, 3, Ch)).astype(np.float32),
                        jnp.bfloat16)
    pos_b = jnp.asarray(rng.normal(0, 0.05, (Ch,)).astype(np.float32))
    fc2_w = jnp.asarray(rng.normal(0, Ch ** -0.5, (Ch, C)).astype(np.float32),
                        jnp.bfloat16)
    fc2_b = jnp.asarray(rng.normal(0, 0.05, (C,)).astype(np.float32))
    inputs = (x, ln_w, ln_b, fc1_w, fc1_b, pos_w, pos_b, fc2_w, fc2_b)

    if os.environ.get("GRAD"):
        # full VJP step: pallas forward + pallas backward kernel (bf16
        # dispatch) vs pallas forward + XLA backward (_bwd_xla via a
        # shadowed dispatch) — isolates the backward-kernel win.
        from dformer_tpu.kernels import fused_mlp as fm

        def val_grad(fn):
            def loss(*a):
                return jnp.sum(fn(*a).astype(jnp.float32))
            return jax.jit(jax.grad(loss, argnums=tuple(range(9))))

        pallas_fn = val_grad(fused_mlp)

        @jax.custom_vjp
        def mlp_xbwd(*a):
            return fm._forward_pallas(*a, 1e-6, False)

        mlp_xbwd.defvjp(lambda *a: (fm._forward_pallas(*a, 1e-6, False), a),
                        lambda res, g: fm._bwd_xla(1e-6, res, g))
        xla_fn = val_grad(mlp_xbwd)
    else:
        pallas_fn = jax.jit(lambda *a: fused_mlp(*a))
        xla_fn = jax.jit(lambda *a: fused_mlp_reference(*a))

    out_p = jax.block_until_ready(pallas_fn(*inputs))
    out_x = jax.block_until_ready(xla_fn(*inputs))
    if isinstance(out_p, tuple):
        worst = 0.0
        for j, (a, b) in enumerate(zip(out_p, out_x)):
            err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                        - b.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) or 1.0
            print(f"grad[{j}]: max|pallas-xla|={err:.4f} rel={err / scale:.4f}")
            worst = max(worst, err / scale)
        # CHECK=1: on-chip grad-parity assertion (the real-Mosaic analog of
        # tests/test_kernels.py's interpret-mode checks — interpret mode
        # cannot catch VMEM block-persistence bugs, only hardware can)
        if os.environ.get("CHECK") and worst > 0.05:
            raise SystemExit(f"GRAD PARITY FAIL: worst rel err {worst:.4f}")
    else:
        err = float(jnp.max(jnp.abs(out_p.astype(jnp.float32)
                                    - out_x.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(out_x.astype(jnp.float32))))
        print(f"shape B{B} {H}x{W} C{C} ratio{ratio}: max|pallas-xla|={err:.4f} "
              f"(scale {scale:.2f})")

    reps = 30
    todo = (("pallas", pallas_fn),) if os.environ.get("SKIP_XLA") \
        else (("pallas", pallas_fn), ("xla", xla_fn))
    for name, fn in todo:
        for _ in range(3):
            jax.block_until_ready(fn(*inputs))
        logdir = tempfile.mkdtemp(prefix="mlpbench_")
        jax.profiler.start_trace(logdir)
        for _ in range(reps):
            out = fn(*inputs)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        ms = device_ms(logdir) / reps
        flops = (2 * B * H * W * C * Ch * 2 + B * H * W * Ch * 9 * 2)
        if os.environ.get("GRAD"):
            # VJP step ≈ 3x the forward FLOPs (fwd recompute + two grad
            # matmuls per fc, conv-transpose + weight-grad taps); without
            # this the fwd-only formula understated GRAD throughput ~3x
            flops *= 3
        print(f"{name}: {ms:.3f} ms/call  ({flops / ms / 1e9:.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
