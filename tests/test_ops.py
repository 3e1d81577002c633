"""Golden tests for the ops layer against torch.nn.functional semantics.

Each op the reference relies on (F.interpolate in both align_corners modes,
AdaptiveAvgPool2d, CE-with-ignore masked mean, bincount confusion matrix,
WarmUpPolyLR) is checked numerically against the torch CPU implementation.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from dformer_tpu.ops.resize import resize_bilinear, resize_nearest
from dformer_tpu.ops.pool import adaptive_avg_pool2d
from dformer_tpu.ops.loss import softmax_cross_entropy_masked_mean
from dformer_tpu.ops.metrics import Metrics, confusion_matrix, iou_from_hist
from dformer_tpu.ops.schedule import warmup_poly_lr

RNG = np.random.RandomState(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def to_nhwc(t_nchw):
    return np.transpose(t_nchw.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((15, 20), (60, 80)), ((60, 80), (15, 20)), ((7, 7), (30, 40)),
     ((480, 640), (240, 320)), ((17, 23), (17, 23)), ((5, 5), (1, 1))],
)
def test_resize_bilinear_matches_torch(align, in_hw, out_hw):
    x = RNG.randn(2, *in_hw, 3).astype(np.float32)
    want = to_nhwc(
        tF.interpolate(nchw(x), size=out_hw, mode="bilinear", align_corners=align)
    )
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_resize_nearest_matches_cv2_rule():
    import cv2

    x = (RNG.rand(37, 53) * 255).astype(np.uint8)
    out = (17, 29)  # (H, W)
    want = cv2.resize(x, (out[1], out[0]), interpolation=cv2.INTER_NEAREST)
    got = np.asarray(resize_nearest(jnp.asarray(x[None]), out))[0]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("in_hw,out_hw", [((60, 80), (7, 7)), ((15, 20), (7, 7)),
                                          ((7, 7), (7, 7)), ((13, 17), (3, 5))])
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    x = RNG.randn(2, *in_hw, 5).astype(np.float32)
    want = to_nhwc(tF.adaptive_avg_pool2d(nchw(x), out_hw))
    got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_masked_ce_matches_torch():
    logits = RNG.randn(2, 8, 10, 5).astype(np.float32)
    labels = RNG.randint(0, 5, size=(2, 8, 10)).astype(np.int64)
    labels[0, :2] = 255  # ignored region
    t_logits = nchw(logits)
    loss_t = tF.cross_entropy(t_logits, torch.from_numpy(labels),
                              reduction="none", ignore_index=255)
    want = loss_t[torch.from_numpy(labels) != 255].mean().item()
    got = float(softmax_cross_entropy_masked_mean(
        jnp.asarray(logits), jnp.asarray(labels), ignore_index=255))
    assert abs(got - want) < 1e-5


def test_confusion_matrix_matches_bincount():
    C = 7
    target = RNG.randint(0, C, size=(3, 16, 16))
    target[0, :4] = 255
    pred = RNG.randint(0, C, size=(3, 16, 16))
    keep = target != 255
    want = np.bincount(
        (target[keep] * C + pred[keep]).astype(np.int64), minlength=C * C
    ).reshape(C, C)
    got = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(target), C))
    np.testing.assert_array_equal(got, want)


def test_metrics_iou_matches_reference_formula():
    C = 5
    m = Metrics(C)
    probs = RNG.rand(2, 12, 12, C).astype(np.float32)
    target = RNG.randint(0, C, size=(2, 12, 12))
    target[1, 5] = 255
    m.update(jnp.asarray(probs), jnp.asarray(target))

    pred = probs.argmax(-1)
    keep = target != 255
    hist = np.bincount((target[keep] * C + pred[keep]).astype(np.int64),
                       minlength=C * C).reshape(C, C).astype(np.float64)
    diag = np.diag(hist)
    with np.errstate(invalid="ignore"):
        ious = diag / (hist.sum(0) + hist.sum(1) - diag)
    ious = np.where(np.isnan(ious), 0, ious)
    _, miou = m.compute_iou()
    assert abs(miou - round(ious.mean() * 100, 2)) < 1e-6


def test_warmup_poly_matches_reference():
    base, total, warm, power = 6e-5, 50000, 1000, 0.9

    def ref(cur):  # WarmUpPolyLR semantics (utils/lr_policy.py:22-34)
        if cur < warm:
            return base * (cur / warm)
        return base * ((1 - float(cur) / total) ** power)

    for step in [0, 1, 500, 999, 1000, 2500, 49999]:
        got = float(warmup_poly_lr(step, base, total, warm, power))
        # schedule math runs in fp32 inside the jitted step
        assert got == pytest.approx(ref(step), rel=1e-5, abs=1e-10)


def test_poly_gelu_error_below_bf16_rounding():
    """The clamped degree-6 poly-erf GELU (ops/activations.py) must stay
    within its documented ~7.7e-4 abs-error bound vs exact-erf GELU, and be
    exactly representable-equal after bf16 rounding for typical activation
    magnitudes (the bf16 fast path in models/nn.gelu)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dformer_tpu.ops.activations import poly_gelu

    x = jnp.asarray(np.linspace(-12.0, 12.0, 200001), jnp.float32)
    exact = jax.nn.gelu(x, approximate=False)
    poly = poly_gelu(x)
    assert float(jnp.max(jnp.abs(poly - exact))) < 8e-4

    # bf16 in/out path: identical to rounding the exact activation for
    # almost all inputs; tolerance one bf16 ulp at |y| <= 8
    xb = x.astype(jnp.bfloat16)
    got = poly_gelu(xb).astype(jnp.float32)
    want = jax.nn.gelu(xb.astype(jnp.float32),
                       approximate=False).astype(jnp.bfloat16)
    diff = jnp.abs(got - want.astype(jnp.float32))
    assert float(jnp.max(diff)) <= 0.0625  # 1 ulp of bf16 at scale 8
