"""Per-op device-plane breakdown of the bench forward."""
import glob
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def op_breakdown(logdir, top=150):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb")
    xs = xplane_pb2.XSpace()
    with open(files[0], "rb") as f:
        xs.ParseFromString(f.read())
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                agg[md.name] += ev.duration_ps / 1e9
                cnt[md.name] += 1
                total += ev.duration_ps / 1e9
        # fallback: if no "XLA Ops" line, list line names
    if not agg:
        for plane in xs.planes:
            if plane.name.startswith("/device:"):
                print("lines:", [l.name for l in plane.lines])
        return
    print(f"total op time: {total:.1f} ms")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:9.2f} ms  {cnt[name]:5d}x  {name[:110]}")
    # grouped view: fold per-block instances (%fusion.123 -> fusion) keyed by
    # op family + result shape, so the long tail of small per-block ops is
    # visible instead of scattered below the per-op cutoff
    import re

    grp = defaultdict(float)
    gcnt = defaultdict(int)
    for name, ms in agg.items():
        m = re.match(r"%([a-zA-Z_0-9\-]+?)(?:\.\d+)?\s*=\s*(\(?\w+\[[^\]]*\])",
                     name)
        key = f"{m.group(1)} {m.group(2)}" if m else name[:60]
        grp[key] += ms
        gcnt[key] += cnt[name]
    print("\n--- grouped by op family + result shape ---")
    for key, ms in sorted(grp.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{ms:9.2f} ms  {gcnt[key]:5d}x  {key[:100]}")


def main():
    import jax
    import jax.numpy as jnp

    from dformer_tpu.config import AttrDict
    from dformer_tpu.models import build_model

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    pallas = sys.argv[2] if len(sys.argv) > 2 else "auto"
    reps = 10
    cfg = AttrDict(
        backbone="DFormer-Large", decoder="ham", num_classes=40,
        decoder_embed_dim=512, drop_path_rate=0.1, aux_rate=0.0,
        bn_eps=1e-3, bn_momentum=0.1, background=255,
        image_height=480, image_width=640,
    )
    model = build_model(cfg, dtype=jnp.bfloat16, pallas=pallas)
    z = jnp.zeros((1, 480, 640, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), z, z)

    @jax.jit
    def forward(rgb, modal_x):
        out = model.apply(variables, rgb, modal_x, train=False,
                          deterministic_bases=True)
        return jnp.argmax(out, axis=-1).astype(jnp.int32)

    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(batch, 480, 640, 3).astype(np.float32))
    modal = jnp.asarray(rng.rand(batch, 480, 640, 3).astype(np.float32))
    jax.block_until_ready(forward(rgb, modal))
    for _ in range(3):
        jax.block_until_ready(forward(rgb, modal))
    logdir = tempfile.mkdtemp(prefix="opprof_")
    jax.profiler.start_trace(logdir)
    for _ in range(reps):
        out = forward(rgb, modal)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print(f"batch={batch} pallas={pallas} reps={reps}")
    op_breakdown(logdir)


if __name__ == "__main__":
    main()
