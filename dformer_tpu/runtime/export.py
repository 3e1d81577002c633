"""AOT export for serving: serialize the jitted eval forward as a portable
StableHLO artifact (`jax.export`).

A serving process loads the artifact with `load_exported` and calls it with
zero Python model code, zero re-tracing, and no torch/flax dependency at the
call site — the weights are baked into the module as constants, so one file
is the whole deployable. The batch dimension is exported symbolically by
default, so one artifact serves any batch size.

The reference framework has no ahead-of-time path (eager torch + .pth,
utils/infer.py loads Python model code and a checkpoint at serving time);
this is the TPU-native replacement: lower once, ship the lowered module.
"""

import jax
import jax.numpy as jnp
from jax import export as jexport


def make_serving_fn(model, variables):
    """Eval-mode forward `(rgb, modal_x) -> logits [B, H, W, num_classes]`.

    Deterministic NMF bases (the eval contract, models/decoders/ham.py) so
    two exports of the same weights are bit-identical.
    """

    def forward(rgb, modal_x):
        return model.apply(variables, rgb, modal_x, train=False,
                           deterministic_bases=True)

    return forward


def export_forward(model, variables, hw, batch=None, platforms=None):
    """Lower + export the eval forward as a `jax.export.Exported`.

    batch: fixed int, or None for a symbolic batch dimension ("b >= 1" —
      one artifact, any batch size).
    platforms: sequence of lowering platforms (e.g. ["tpu"], ["cpu"]);
      None exports for the default backend. Cross-platform export works
      from any host — lowering does not touch the device.
    """
    forward = make_serving_fn(model, variables)
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, hw[0], hw[1], 3), jnp.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(jax.jit(forward), **kwargs)(spec, spec)


def save_exported(exported, path: str) -> str:
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_exported(path: str):
    """Deserialize an artifact; run it via `.call(rgb, modal_x)`."""
    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))
