#!/usr/bin/env python
"""Host->device transfer microbenchmark (round 5): quantifies the relay
tunnel's transfer behavior to explain / fix the pipeline_bench e2e gap
(e2e 4.7 img/s vs 52.4 img/s device ceiling, 9% overlap).

Questions answered:
  1. Does jnp.asarray / device_put BLOCK the host until the bytes land
     (serializing transfer with compute), or return async?
  2. Can a background-thread device_put overlap with a running device
     computation (i.e. would a prefetcher recover the overlap)?
  3. Effective host->device bandwidth for a train batch's arrays, and the
     byte cost of gt-as-int32 vs gt-as-uint8.

Run on the real chip: python tools/transfer_probe.py
"""
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    B, H, W = 8, 480, 640
    rng = np.random.RandomState(0)
    rgb_u8 = rng.randint(0, 256, (B, H, W, 3), dtype=np.uint8)
    gt_i32 = rng.randint(0, 40, (B, H, W)).astype(np.int32)
    gt_u8 = gt_i32.astype(np.uint8)
    x_u8 = rng.randint(0, 256, (B, H, W, 1), dtype=np.uint8)

    def put_time(name, arr, reps=3):
        # vary a byte each rep so no caching layer can dedupe the payload
        ts = []
        for r in range(reps):
            arr.flat[r] = (int(arr.flat[r]) + 1) % 250
            t0 = time.perf_counter()
            d = jax.device_put(arr)
            t_submit = time.perf_counter() - t0
            d.block_until_ready()
            t_done = time.perf_counter() - t0
            ts.append((t_submit, t_done))
        sub = min(t for t, _ in ts)
        don = min(t for _, t in ts)
        mb = arr.nbytes / 1e6
        print(f"{name:14s} {mb:7.1f} MB  submit {sub * 1e3:8.1f} ms  "
              f"ready {don * 1e3:8.1f} ms  -> {mb / max(don, 1e-9):6.1f} MB/s",
              flush=True)
        return don

    print("\n-- 1/3: device_put blocking & bandwidth per array --")
    put_time("rgb uint8", rgb_u8)
    put_time("x uint8", x_u8)
    t_i32 = put_time("gt int32", gt_i32)
    t_u8 = put_time("gt uint8", gt_u8)
    print(f"gt uint8 saves {(t_i32 - t_u8) * 1e3:.0f} ms/batch vs int32")

    # -- 2/3: overlap test. Launch a long device computation, then
    # device_put from a background thread while it runs. If the put's
    # ready-time is hidden inside the compute wall, transfers overlap.
    print("\n-- 2/3: transfer/compute overlap --")
    a = jax.device_put(rng.rand(4096, 4096).astype(np.float32))

    @jax.jit
    def burn(x):
        def body(c, _):
            return jnp.tanh(c @ c) * 0.999, ()
        y, _ = jax.lax.scan(body, x, None, length=30)
        return jnp.sum(y)

    float(burn(a))  # compile + warm
    t0 = time.perf_counter()
    float(burn(a))
    t_burn = time.perf_counter() - t0
    print(f"burn() alone: {t_burn * 1e3:.0f} ms")

    results = {}

    def bg_put():
        t0 = time.perf_counter()
        d = jax.device_put(rgb_u8)
        d.block_until_ready()
        results["put_s"] = time.perf_counter() - t0

    r = burn(a)  # enqueue compute (async dispatch)
    th = threading.Thread(target=bg_put)
    t0 = time.perf_counter()
    th.start()
    float(r)  # wait for compute
    t_total = time.perf_counter() - t0
    th.join()
    put_s = results["put_s"]
    overlap = "YES" if t_total < t_burn + 0.5 * put_s else "no"
    print(f"compute {t_burn * 1e3:.0f} ms + concurrent put "
          f"{put_s * 1e3:.0f} ms -> total {t_total * 1e3:.0f} ms "
          f"(overlap: {overlap})", flush=True)

    # -- 3/3: serialized loop (current run_epoch shape) vs threaded-prefetch
    # loop over the same 6 synthetic batches
    print("\n-- 3/3: serialized vs prefetch batch loop (6 x bs8 batches) --")

    def fresh_batches(n=6):
        out = []
        for i in range(n):
            r = rgb_u8.copy(); r[0, 0, 0, 0] = i
            g = gt_u8.copy(); g[0, 0, 0] = i
            x = x_u8.copy(); x[0, 0, 0, 0] = i
            out.append((r, g, x))
        return out

    burnv = jax.device_put(rng.rand(2048, 2048).astype(np.float32))

    @jax.jit
    def consume2(r, g, x, bv):
        def body(c, _):
            return jnp.tanh(c @ c) * 0.999, ()
        y, _ = jax.lax.scan(body, bv, None, length=8)
        return jnp.sum(r.astype(jnp.float32)) * 0 + jnp.sum(y)

    bs = fresh_batches()
    out = consume2(*map(jax.device_put, bs[0]), burnv)
    float(out)  # compile

    t0 = time.perf_counter()
    for b in fresh_batches():
        out = consume2(*map(jax.device_put, b), burnv)
        float(out)  # step-serial consumer, like run_epoch at audit points
    t_serial = time.perf_counter() - t0

    q = []
    lock = threading.Semaphore(0)

    def producer():
        for b in fresh_batches():
            q.append(tuple(map(jax.device_put, b)))
            lock.release()

    th = threading.Thread(target=producer)
    t0 = time.perf_counter()
    th.start()
    outs = []
    for i in range(6):
        lock.acquire()
        outs.append(consume2(*q[i], burnv))
    float(outs[-1])
    for o in outs:
        float(o)
    t_pref = time.perf_counter() - t0
    th.join()
    print(f"serialized loop {t_serial:.2f}s vs threaded-prefetch "
          f"{t_pref:.2f}s -> {t_serial / t_pref:.2f}x", flush=True)


if __name__ == "__main__":
    main()
