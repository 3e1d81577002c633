"""Transcendental-free GELU (exact-erf form, reference nn.GELU default).

erf(x) ~= clip(x, +-2.5) * P(clip(x)^2): degree-6 Chebyshev-fit polynomial
on [0, 2.5] with the INPUT clamped. Valid only as the GELU inner term:
0.5*h*(1+poly_erf(h/sqrt2)) has max abs error 7.7e-4 over all h — far below
bf16 output rounding (~8e-3 relative at activation scale ~4). v5e finding
(kernels/fused_mlp.py): the VPU is the bottleneck on elementwise-heavy
fusions and XLA's erf lowering takes an exp-based branch for |x| > 1, so the
clamped polynomial is the fastest correct-to-bf16 GELU on this hardware.
fp32 parity paths must use jax.nn.gelu(approximate=False) instead
(models/nn.py gates on dtype)."""

import jax.numpy as jnp
import numpy as np

_ERF_COEF = (
    1.128327841545965, -0.3752161375254132, 0.11017227865151494,
    -0.02386296372461015, 0.0035287012695947024, -0.000310355563933048,
    1.198749466543182e-05)


def poly_erf(x):
    """Clamped polynomial erf — GELU-scoped (see module docstring)."""
    xc = jnp.clip(x, -2.5, 2.5)
    t = xc * xc
    acc = jnp.full_like(x, np.float32(_ERF_COEF[-1]))
    for c in _ERF_COEF[-2::-1]:
        acc = acc * t + np.float32(c)
    return xc * acc


def poly_gelu(x):
    """bf16-accurate GELU: fp32 internal math, transcendental-free."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + poly_erf(xf * np.float32(0.7071067811865476)))
    return y.astype(x.dtype)

# NOTE (measured, do not revisit blindly): a closed-form transcendental-free
# derivative of poly_gelu was evaluated for the fused-MLP backward and
# rejected — the clamp makes d/dx spike to 2.2e-2 abs error at |x|~3.5
# (activation-scale territory) vs the exact gelu', and the backward is not
# VPU-bound enough to justify that gradient noise.
