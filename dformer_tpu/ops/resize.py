"""Bilinear / nearest image resize with exact PyTorch `F.interpolate` semantics.

The reference stack depends on *two* coexisting bilinear conventions
(reference: models/builder.py:203 uses align_corners=False, while
utils/val_mm.py:367,379 uses align_corners=True), and mIoU parity hinges on
matching both exactly.

TPU-first design: rather than gather-based interpolation (poor VPU layout),
the resize is expressed as two small dense matmuls with precomputed
interpolation-weight matrices,

    out[b, oh, ow, c] = sum_{ih, iw} Wh[oh, ih] * Ww[ow, iw] * x[b, ih, iw, c]

Each weight row has at most two non-zeros, but the dense matmul form maps
straight onto the MXU and lets XLA fuse the surrounding elementwise work.
Weights are computed in numpy at trace time (shapes are static under jit),
so they are baked into the executable as constants.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=256)
def _linear_weights(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out_size, in_size) bilinear weight matrix, torch semantics."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    # Coordinate math in float32 to match torch's scalar_t=float kernels
    # (area_pixel_compute_source_index); fp64 here would drift up to ~3e-4.
    dst = np.arange(out_size, dtype=np.float32)
    if align_corners:
        if out_size == 1:
            src = np.zeros(1, dtype=np.float32)
        else:
            scale = np.float32(in_size - 1) / np.float32(out_size - 1)
            src = dst * scale
    else:
        scale = np.float32(in_size) / np.float32(out_size)
        src = (dst + np.float32(0.5)) * scale - np.float32(0.5)
        src = np.clip(src, 0.0, None)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = np.clip((src - lo).astype(np.float64), 0.0, 1.0)
    w = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w.astype(np.float32)


@lru_cache(maxsize=256)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """Nearest-neighbor source index per output position (torch/cv2 'floor' rule)."""
    dst = np.arange(out_size, dtype=np.float64)
    src = np.floor(dst * (in_size / out_size)).astype(np.int64)
    return np.clip(src, 0, in_size - 1)


def resize_bilinear(x: jnp.ndarray, size, align_corners: bool = False,
                    fast_bf16: bool = False) -> jnp.ndarray:
    """Bilinear resize of an NHWC tensor to `size = (H, W)`.

    Matches torch.nn.functional.interpolate(mode='bilinear') bit-for-bit in
    fp32 up to matmul reassociation. Computation runs in fp32 and is cast
    back to the input dtype.

    fast_bf16=True on a bf16 input runs the two weight matmuls as native
    MXU bf16 dots with fp32 accumulation instead of the multi-pass fp32
    HIGHEST emulation, and keeps the (OH, IW) intermediate in bf16 — for
    the bf16 model path's own upsamples (the full-res logits resize was
    ~1 ms/iter of f32 emulation + a 393 MB f32 intermediate at the bench
    shape). Interpolation weights are exact in bf16 only up to rounding;
    parity-critical (fp32 eval) callers leave this off.
    """
    out_h, out_w = int(size[0]), int(size[1])
    b, in_h, in_w, c = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x
    dt = x.dtype
    wh = jnp.asarray(_linear_weights(in_h, out_h, align_corners))
    ww = jnp.asarray(_linear_weights(in_w, out_w, align_corners))
    if fast_bf16 and dt == jnp.bfloat16:
        y = jnp.einsum("hi,biwc->bhwc", wh.astype(dt), x,
                       preferred_element_type=jnp.float32).astype(dt)
        y = jnp.einsum("wj,bhjc->bhwc", ww.astype(dt), y,
                       preferred_element_type=jnp.float32)
        return y.astype(dt)
    y = x.astype(jnp.float32)
    # (OH, IH) @ (B, IH, IW, C) over H, then over W. Precision HIGHEST: on TPU
    # fp32 matmuls default to bf16 passes, which would break eval parity.
    y = jnp.einsum("hi,biwc->bhwc", wh, y, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("wj,bhjc->bhwc", ww, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(dt)


def resize_nearest(x: jnp.ndarray, size) -> jnp.ndarray:
    """Nearest-neighbor resize of NHWC (or NHW for labels) to (H, W)."""
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[1], x.shape[2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    ih = jnp.asarray(_nearest_index(in_h, out_h))
    iw = jnp.asarray(_nearest_index(in_w, out_w))
    return x[:, ih][:, :, iw]
