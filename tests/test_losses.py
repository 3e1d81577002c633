"""Loss-zoo sanity + torch-parity where torch has an equivalent."""

import numpy as np
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from dformer_tpu.ops.loss import (berhu_loss, class_balanced_ce, dice_loss,
                                  focal_loss, lovasz_softmax_loss,
                                  ohem_cross_entropy, tversky_loss)

RNG = np.random.RandomState(0)


def _data(C=6, ignore=True):
    logits = RNG.randn(2, 10, 12, C).astype(np.float32)
    labels = RNG.randint(0, C, (2, 10, 12)).astype(np.int64)
    if ignore:
        labels[0, :3] = 255
    return jnp.asarray(logits), jnp.asarray(labels)


def test_losses_finite_and_positive():
    logits, labels = _data()
    for fn in (dice_loss, focal_loss, tversky_loss, lovasz_softmax_loss,
               class_balanced_ce):
        v = float(fn(logits, labels))
        assert np.isfinite(v) and v >= 0, fn.__name__


def test_losses_zero_at_perfect_prediction():
    C = 4
    labels = RNG.randint(0, C, (2, 8, 8))
    logits = jax.nn.one_hot(labels, C) * 50.0
    labels = jnp.asarray(labels)
    assert float(dice_loss(logits, labels)) < 1e-3
    assert float(tversky_loss(logits, labels)) < 1e-3
    assert float(lovasz_softmax_loss(logits, labels)) < 1e-3
    assert float(focal_loss(logits, labels)) < 1e-6


def test_ohem_keeps_hard_pixels():
    logits, labels = _data()
    full = float(ohem_cross_entropy(logits, labels, thresh=0.7, min_kept=10))
    # hard-pixel mean CE must be >= plain mean CE (easy pixels dropped)
    from dformer_tpu.ops.loss import softmax_cross_entropy_masked_mean

    plain = float(softmax_cross_entropy_masked_mean(logits, labels))
    assert full >= plain - 1e-5


def test_berhu_matches_manual():
    pred = jnp.asarray(RNG.randn(4, 8).astype(np.float32))
    target = jnp.asarray(RNG.randn(4, 8).astype(np.float32))
    diff = np.abs(np.asarray(pred) - np.asarray(target))
    c = 0.2 * diff.max()
    want = np.where(diff <= c, diff, (diff ** 2 + c ** 2) / (2 * c)).mean()
    got = float(berhu_loss(pred, target))
    assert abs(got - want) < 1e-5


def test_lovasz_decreases_with_better_preds():
    C = 3
    labels = jnp.asarray(RNG.randint(0, C, (1, 16, 16)))
    good = jax.nn.one_hot(labels, C) * 5.0
    bad = jnp.asarray(RNG.randn(1, 16, 16, C).astype(np.float32))
    assert float(lovasz_softmax_loss(good, labels)) < \
        float(lovasz_softmax_loss(bad, labels))


def test_sigmoid_focal_matches_reference_module():
    """Drives the reference's own SigmoidFocalLoss (utils/loss_opr.py:104)
    as the oracle (no cuda calls in that module path)."""
    import sys

    import torch

    import ref_stubs

    ref_stubs.install_stubs()
    for p in ("/root/reference", "/root/reference/utils"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import loss_opr as ref_loss

    from dformer_tpu.ops.loss import sigmoid_focal_loss

    rng = np.random.RandomState(0)
    logits = rng.randn(2, 8, 10).astype(np.float32)
    labels = rng.randint(0, 2, (2, 8, 10)).astype(np.int64)
    labels[0, 0, :3] = 255

    mod = ref_loss.SigmoidFocalLoss(ignore_label=255)
    want = float(mod(torch.from_numpy(logits), torch.from_numpy(labels)))
    got = float(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rce_matches_torch_reimplementation():
    """RCELoss (utils/loss_opr.py:27-61) hardcodes .cuda() so it cannot run
    here; the oracle is its math transcribed to CPU torch, quirks included:
    invalid labels onehot to class 0, and `torch.mean(loss2*mask)` with
    loss2 [b,h,w] vs mask [b,1,h,w] — which BROADCASTS to [b,b,h,w],
    coupling sample j's NLL with sample i's mask."""
    import torch
    import torch.nn.functional as tF

    from dformer_tpu.ops.loss import rce_loss

    rng = np.random.RandomState(1)
    C = 6
    logits = rng.randn(2, 5, 7, C).astype(np.float32)
    labels = rng.randint(0, C, (2, 5, 7)).astype(np.int64)
    labels[1, 2, :4] = 255

    pred = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    target = torch.from_numpy(labels)
    b, c, h, w = pred.shape
    max_pred, max_id = torch.max(pred, dim=1)
    target_flat = target.view(b, 1, h, w)
    mask = (target_flat.ne(255)).float()
    target_flat = (mask * target_flat.float()).long()
    label_pred = torch.zeros(b, C, h, w).scatter_(1, target_flat, 1)
    weighted_pred = tF.log_softmax(pred, dim=1)
    loss1 = tF.nll_loss(weighted_pred, target, ignore_index=255)
    label_pred = torch.clamp(label_pred, min=1e-9, max=1.0 - 1e-9)
    loss2_map = tF.nll_loss(torch.log(label_pred), max_id, reduction="none")
    loss2 = torch.mean(loss2_map * mask)  # [b,h,w]*[b,1,h,w] -> [b,b,h,w]
    want = float(loss1 + 0.01 * loss2)

    got = float(rce_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
