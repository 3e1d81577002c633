#!/usr/bin/env python
"""Benchmark: DFormer-Large 480x640 inference throughput on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no A100 throughput (BASELINE.md — harness
only). We use an estimated 60 img/s for DFormer-L bs>1 fp16 480x640 on one
A100 with the reference's PyTorch stack as the comparison point; the >3x
goal in BASELINE.json therefore corresponds to vs_baseline >= 3.0.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build

    batch = 8
    _, model, variables = _build("DFormer-Large", (480, 640), 40,
                                 dtype=jnp.bfloat16)

    @jax.jit
    def forward(rgb, modal_x):
        return model.apply(variables, rgb, modal_x, train=False,
                           deterministic_bases=True)

    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(batch, 480, 640, 3).astype(np.float32))
    modal = jnp.asarray(rng.rand(batch, 480, 640, 3).astype(np.float32))

    # warmup (compile + 5 reps, reference latency.py uses 100 warmup)
    forward(rgb, modal).block_until_ready()
    for _ in range(5):
        forward(rgb, modal).block_until_ready()

    reps = 30
    t0 = time.perf_counter()
    for _ in range(reps):
        out = forward(rgb, modal)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    ips = batch * reps / dt

    baseline_a100_ips = 60.0
    print(json.dumps({
        "metric": "dformer_large_480x640_infer_throughput",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / baseline_a100_ips, 3),
    }))


if __name__ == "__main__":
    main()
