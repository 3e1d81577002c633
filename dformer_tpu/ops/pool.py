"""Adaptive average pooling with exact torch `AdaptiveAvgPool2d` semantics.

Used by the DFormer GAA branch (reference: models/encoders/DFormer.py:92 pools
features to 7x7 query tokens) and UPerHead's PPM (models/decoders/UPernet.py).

Torch computes per output cell: start = floor(i*in/out), end = ceil((i+1)*in/out),
then averages. Adaptive pooling is separable, so like ops/resize.py we express
it as two dense matmuls with precomputed averaging-weight matrices -> MXU.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _pool_weights(in_size: int, out_size: int) -> np.ndarray:
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        w[i, start:end] = 1.0 / (end - start)
    return w.astype(np.float32)


def adaptive_avg_pool2d(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """NHWC adaptive average pool to `output_size = (H, W)`."""
    out_h, out_w = int(output_size[0]), int(output_size[1])
    _, in_h, in_w, _ = x.shape
    dt = x.dtype
    wh = jnp.asarray(_pool_weights(in_h, out_h))
    ww = jnp.asarray(_pool_weights(in_w, out_w))
    y = x.astype(jnp.float32)
    y = jnp.einsum("hi,biwc->bhwc", wh, y, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("wj,bhjc->bhwc", ww, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(dt)


def global_avg_pool2d(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)
