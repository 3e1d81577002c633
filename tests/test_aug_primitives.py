"""cv2 parity for the standalone aug primitives (reference
utils/transforms.py:61-157 — dormant in the reference TrainPre, shipped for
custom pipelines)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from dformer_tpu.data.augment import (center_crop, gaussian_blur,
                                      pad_to_multiple, pad_to_shape,
                                      random_gaussian_blur, random_rotation,
                                      resize_shortest_edge, rotate)

RNG = np.random.RandomState(0)


def test_pad_to_shape_matches_reference_margins():
    # single-channel: exact cv2 parity. (On multichannel images cv2's
    # scalar `value` fills only channel 0 — a Scalar quirk; ours broadcasts
    # to every channel. Invisible in reference usage, which pads images
    # with 0.)
    img = RNG.randint(0, 255, (37, 53)).astype(np.uint8)
    got, margin = pad_to_shape(jnp.asarray(img), (64, 64), 7)
    want = cv2.copyMakeBorder(img, 13, 14, 5, 6, cv2.BORDER_CONSTANT,
                              value=7)
    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_array_equal(margin, [13, 14, 5, 6])


def test_pad_to_multiple():
    img = RNG.randint(0, 255, (37, 53)).astype(np.uint8)
    got, margin = pad_to_multiple(jnp.asarray(img), 32, 0)
    assert got.shape == (64, 64)
    assert tuple(margin) == (13, 14, 5, 6)
    # already a multiple: no-op
    got2, margin2 = pad_to_multiple(jnp.asarray(got), 32, 0)
    assert got2.shape == (64, 64) and tuple(margin2) == (0, 0, 0, 0)


def test_center_crop():
    img = RNG.rand(37, 53, 2).astype(np.float32)
    got = np.asarray(center_crop(jnp.asarray(img), (20, 24)))
    np.testing.assert_array_equal(got, img[8:28, 14:38])


@pytest.mark.parametrize("hw", [(36, 60), (60, 36)])
def test_resize_shortest_edge_matches_cv2(hw):
    img = RNG.rand(*hw, 3).astype(np.float32)
    edge = 48
    got = np.asarray(resize_shortest_edge(jnp.asarray(img), edge))
    h, w = hw
    if h < w:
        th, tw = edge, max(1, int(edge / h * w))
    else:
        th, tw = max(1, int(edge / w * h)), edge
    want = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("angle", [-10.0, 3.7, 9.9])
def test_rotate_bilinear_matches_cv2(angle):
    img = RNG.rand(40, 56, 3).astype(np.float32)
    M = cv2.getRotationMatrix2D((56 / 2, 40 / 2), angle, 1)
    want = cv2.warpAffine(img, M, (56, 40), flags=cv2.INTER_LINEAR)
    got = np.asarray(rotate(jnp.asarray(img), jnp.float32(angle)))
    # interior parity; cv2's fixed-point bilinear differs by ~1/32 at edges
    diff = np.abs(got - want)
    assert np.mean(diff) < 2e-3, np.mean(diff)
    assert np.percentile(diff, 99) < 0.05


@pytest.mark.parametrize("angle", [-7.3, 8.0])
def test_rotate_nearest_mostly_matches_cv2(angle):
    gt = RNG.randint(0, 40, (40, 56)).astype(np.int32)
    M = cv2.getRotationMatrix2D((56 / 2, 40 / 2), angle, 1)
    want = cv2.warpAffine(gt.astype(np.float32), M, (56, 40),
                          flags=cv2.INTER_NEAREST)
    got = np.asarray(rotate(jnp.asarray(gt), jnp.float32(angle),
                            nearest=True))
    # nearest rounding at half-integer source coords can differ per pixel
    mismatch = (got != want).mean()
    assert mismatch < 0.05, mismatch


@pytest.mark.parametrize("ksize", [3, 5, 7])
def test_gaussian_blur_matches_cv2(ksize):
    img = RNG.rand(32, 48, 3).astype(np.float32)
    want = cv2.GaussianBlur(img, (ksize, ksize), 0)
    got = np.asarray(gaussian_blur(jnp.asarray(img), ksize))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_random_ops_run_under_jit():
    key = jax.random.PRNGKey(0)
    img = jnp.asarray(RNG.rand(24, 32, 3).astype(np.float32))
    gt = jnp.asarray(RNG.randint(0, 40, (24, 32)).astype(np.int32))
    r_img, r_gt = jax.jit(random_rotation)(key, img, gt)
    assert r_img.shape == img.shape and r_gt.shape == gt.shape
    blurred = jax.jit(random_gaussian_blur)(key, img)
    assert blurred.shape == img.shape
