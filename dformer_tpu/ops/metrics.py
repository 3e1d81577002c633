"""Confusion-matrix segmentation metrics (mIoU / mAcc / mF1).

Mirrors the semantics of the reference GPU bincount histogram
(reference: utils/metrics_new.py:16-47): hist[t, p] counts pixels with ground
truth t predicted as p, skipping ignore_index; IoU/F1/Acc treat nan as 0 and
report percentages rounded to 2 decimals.

TPU-first: bincount/scatter-add lays out poorly on the VPU, so the per-batch
histogram is computed as a masked one-hot matmul
    hist = onehot(target)^T @ onehot(pred)
which runs on the MXU. fp32 is exact for per-batch counts (< 2^24 pixels);
cross-batch and cross-device accumulation happens in int: under a mesh the
per-device hists are summed with `psum` (replacing the reference's pickle
`all_gather_object`, val_mm.py:201-207).
"""

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int,
                     ignore_index: int = 255) -> jnp.ndarray:
    """[num_classes, num_classes] int32 histogram; rows=target, cols=pred.

    pred/target: [...] int arrays of equal shape (class ids).
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    target = target.reshape(-1).astype(jnp.int32)
    keep = (target != ignore_index).astype(jnp.float32)
    t1h = (target[:, None] == jnp.arange(num_classes, dtype=jnp.int32)[None, :])
    p1h = (pred[:, None] == jnp.arange(num_classes, dtype=jnp.int32)[None, :])
    t1h = t1h.astype(jnp.float32) * keep[:, None]
    hist = jnp.dot(t1h.T, p1h.astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return hist.astype(jnp.int32)


def _nan_to_zero(x: np.ndarray) -> np.ndarray:
    return np.where(np.isnan(x), 0.0, x)


def iou_from_hist(hist: np.ndarray):
    """Per-class IoU (%) and mIoU (%), matching metrics_new.compute_iou."""
    hist = np.asarray(hist, dtype=np.float64)
    diag = np.diag(hist)
    with np.errstate(divide="ignore", invalid="ignore"):
        ious = diag / (hist.sum(0) + hist.sum(1) - diag)
    ious = _nan_to_zero(ious)
    miou = ious.mean()
    return np.round(ious * 100, 2).tolist(), round(miou * 100, 2)


def f1_from_hist(hist: np.ndarray):
    hist = np.asarray(hist, dtype=np.float64)
    diag = np.diag(hist)
    with np.errstate(divide="ignore", invalid="ignore"):
        f1 = 2 * diag / (hist.sum(0) + hist.sum(1))
    f1 = _nan_to_zero(f1)
    return np.round(f1 * 100, 2).tolist(), round(f1.mean() * 100, 2)


def pixel_acc_from_hist(hist: np.ndarray):
    hist = np.asarray(hist, dtype=np.float64)
    diag = np.diag(hist)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = diag / hist.sum(1)
    acc = _nan_to_zero(acc)
    return np.round(acc * 100, 2).tolist(), round(acc.mean() * 100, 2)


def accuracy(logits, labels, topk=1, ignore_index: int = 255,
             thresh: float = None):
    """Top-k pixel accuracy (%) — capability parity with
    models/losses/accuracy.py (the one loss util the reference exports,
    models/losses/__init__.py:2-9). logits: [..., C]; labels: [...]."""
    num_classes = logits.shape[-1]
    ks = (topk,) if isinstance(topk, int) else tuple(topk)
    maxk = max(ks)
    valid = labels != ignore_index
    vals, idx = jax.lax.top_k(logits, maxk)
    correct = idx == labels[..., None]
    if thresh is not None:
        correct = correct & (vals > thresh)
    total = jnp.maximum(jnp.sum(valid), 1)
    accs = []
    for k in ks:
        hit = jnp.any(correct[..., :k], axis=-1) & valid
        accs.append(jnp.sum(hit) / total * 100.0)
    return accs[0] if isinstance(topk, int) else accs


class Metrics:
    """Host-side accumulator over per-batch device histograms."""

    def __init__(self, num_classes: int, ignore_index: int = 255):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.hist = np.zeros((num_classes, num_classes), dtype=np.int64)

    def update_hist(self, hist) -> None:
        self.hist += np.asarray(hist, dtype=np.int64)

    def update(self, probs_or_logits, target) -> None:
        """probs_or_logits: [B, H, W, C] (argmax over last axis); target: [B, H, W]."""
        pred = jnp.argmax(probs_or_logits, axis=-1)
        self.update_hist(confusion_matrix(pred, target, self.num_classes,
                                          self.ignore_index))

    def merge_across_processes(self) -> "Metrics":
        """Sum hists over all hosts (replaces the reference's pickle
        all_gather_object of Metrics, val_mm.py:201-207). No-op single-host."""
        import jax

        if jax.process_count() == 1:
            return self
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(
            jnp.asarray(self.hist, jnp.int32))
        self.hist = np.asarray(gathered, np.int64).sum(axis=0)
        return self

    def compute_iou(self):
        return iou_from_hist(self.hist)

    def compute_f1(self):
        return f1_from_hist(self.hist)

    def compute_pixel_acc(self):
        return pixel_acc_from_hist(self.hist)
