"""Pallas kernels, interpret mode on CPU: fused MLP and fused local
attention match their XLA references (which are themselves parity-tested
against torch via tests/test_model_parity.py), including gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dformer_tpu.kernels.fused_attention import (fused_local_attention,
                                                 fused_local_attention_reference)
from dformer_tpu.kernels.fused_mlp import fused_mlp, fused_mlp_reference

RNG = np.random.RandomState(0)


def _mlp_params(C, Ch):
    return [jnp.asarray((RNG.randn(*s) * 0.2).astype(np.float32)) for s in
            [(C,), (C,), (C, Ch), (Ch,), (3, 3, Ch), (Ch,), (Ch, C), (C,)]]


@pytest.mark.parametrize("shape", [(2, 8, 12, 16, 4), (1, 6, 10, 8, 8)])
def test_fused_mlp_interpret_matches_reference(shape):
    B, H, W, C, r = shape
    x = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    ps = _mlp_params(C, C * r)
    want = fused_mlp_reference(x, *ps)
    got = fused_mlp(x, *ps, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_fused_mlp_grad_matches_reference():
    B, H, W, C, r = 1, 6, 8, 8, 4
    x = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    ps = _mlp_params(C, C * r)

    gk = jax.grad(lambda x, w: jnp.sum(
        fused_mlp(x, ps[0], ps[1], w, *ps[3:], 1e-6, True)),
        argnums=(0, 1))(x, ps[2])
    gr = jax.grad(lambda x, w: jnp.sum(
        fused_mlp_reference(x, ps[0], ps[1], w, *ps[3:])),
        argnums=(0, 1))(x, ps[2])
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4)


def _attn_params(C):
    Ce = C // 2
    shapes = [(C,), (C,), (Ce,), (Ce,), (C, C), (C,), (C, Ce), (Ce,),
              (C, C), (C,), (7, 7, C), (C,), (C, C), (C,), (Ce, Ce), (Ce,),
              (7, 7, Ce), (Ce,), (Ce, Ce), (Ce,), (C + Ce, C), (C,),
              (C + Ce, Ce), (Ce,)]
    return [jnp.asarray((RNG.randn(*s) * 0.2).astype(np.float32))
            for s in shapes]


def test_fused_attention_interpret_matches_reference():
    B, H, W, C = 2, 8, 12, 16
    x = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    e = jnp.asarray(RNG.randn(B, H, W, C // 2).astype(np.float32))
    ps = _attn_params(C)
    want = fused_local_attention_reference(x, e, *ps)
    got = fused_local_attention(x, e, *ps, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               atol=2e-5, rtol=1e-4)


def test_fused_attention_grad_matches_reference():
    B, H, W, C = 1, 6, 8, 8
    x = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    e = jnp.asarray(RNG.randn(B, H, W, C // 2).astype(np.float32))
    ps = _attn_params(C)

    def loss_k(x, e):
        o, oe = fused_local_attention(x, e, *ps, 1e-6, True)
        return jnp.sum(o) + jnp.sum(oe)

    def loss_r(x, e):
        o, oe = fused_local_attention_reference(x, e, *ps)
        return jnp.sum(o) + jnp.sum(oe)

    gk = jax.grad(loss_k, argnums=(0, 1))(x, e)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, e)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4)


def test_fused_gaa_front_interpret_matches_reference():
    from dformer_tpu.kernels.fused_attention import (
        fused_gaa_front, fused_gaa_front_reference)

    B, H, W, C = 2, 12, 16, 16
    Ce = C // 2
    x = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
    e = jnp.asarray(RNG.randn(B, H, W, Ce).astype(np.float32))
    shapes = [(C,), (C,), (Ce,), (Ce,), (C, 2 * C + Ce), (2 * C + Ce,),
              (7, 7, C), (C,), (C, C), (C,), (Ce, Ce), (Ce,), (7, 7, Ce),
              (Ce,), (Ce, Ce), (Ce,)]
    ps = [jnp.asarray((RNG.randn(*s) * 0.2).astype(np.float32))
          for s in shapes]
    want = fused_gaa_front_reference(x, e, *ps)
    got = fused_gaa_front(x, e, *ps, 1e-6, True)
    for name, g, w in zip(("xa", "ce", "t", "pooled"), got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5,
                                   rtol=1e-4, err_msg=name)

    def loss(fn):
        return lambda x, e: sum(jnp.sum(o) for o in fn(x, e))

    gk = jax.grad(loss(lambda x, e: fused_gaa_front(x, e, *ps, 1e-6, True)),
                  argnums=(0, 1))(x, e)
    gr = jax.grad(loss(lambda x, e: fused_gaa_front_reference(x, e, *ps)),
                  argnums=(0, 1))(x, e)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4)


def test_mlpblock_pallas_path_matches_standard():
    """MLPBlock(use_pallas) vs standard path with the SAME params."""
    from dformer_tpu.models.encoder import MLPBlock

    x = jnp.asarray(RNG.randn(2, 8, 12, 16).astype(np.float32))
    std = MLPBlock(dim=16, mlp_ratio=4, use_pallas=False)
    variables = std.init(jax.random.PRNGKey(0), x)
    want = std.apply(variables, x)
    # interpret-mode pallas path on CPU via monkeypatched interpret flag
    import dformer_tpu.kernels.fused_mlp as fm

    orig = fm.fused_mlp

    def interp(*args):
        return orig(*args[:9], 1e-6, True)

    fm_fused, fm.fused_mlp = fm.fused_mlp, interp
    try:
        fused = MLPBlock(dim=16, mlp_ratio=4, use_pallas=True)
        got = fused.apply(variables, x)
    finally:
        fm.fused_mlp = fm_fused
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)
