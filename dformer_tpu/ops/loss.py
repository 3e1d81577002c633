"""Segmentation losses.

The reference trains with `nn.CrossEntropyLoss(reduction='none',
ignore_index=background)` followed by a masked mean over valid pixels
(reference: utils/train.py:180, models/builder.py:230). Re-expressed here as a
pure function on NHWC logits; the log-softmax runs in fp32 regardless of the
compute dtype for numerical parity.
"""

import jax
import jax.numpy as jnp


def softmax_cross_entropy_masked_mean(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = 255
) -> jnp.ndarray:
    """Mean CE over pixels whose label != ignore_index.

    Args:
      logits: [B, H, W, C] raw scores.
      labels: [B, H, W] int class ids (may contain ignore_index).
    """
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count


def per_pixel_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                            ignore_index: int = 255) -> jnp.ndarray:
    """Per-pixel CE (zero at ignored pixels), matching reduction='none'."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.where(valid, nll, 0.0)


def dice_loss(logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = 255,
              smooth: float = 1.0) -> jnp.ndarray:
    """Multi-class soft Dice (capability parity with models/losses/dice_loss.py)."""
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    valid = (labels != ignore_index)[..., None]
    onehot = jax.nn.one_hot(jnp.where(labels == ignore_index, 0, labels), num_classes)
    onehot = jnp.where(valid, onehot, 0.0)
    probs = jnp.where(valid, probs, 0.0)
    inter = jnp.sum(probs * onehot, axis=(0, 1, 2))
    denom = jnp.sum(probs, axis=(0, 1, 2)) + jnp.sum(onehot, axis=(0, 1, 2))
    dice = (2.0 * inter + smooth) / (denom + smooth)
    return 1.0 - jnp.mean(dice)


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, gamma: float = 2.0,
               alpha: float = 0.25, ignore_index: int = 255) -> jnp.ndarray:
    """Focal loss (capability parity with models/losses/focal_loss.py)."""
    nll = per_pixel_cross_entropy(logits, labels, ignore_index)
    valid = labels != ignore_index
    pt = jnp.exp(-nll)
    loss = alpha * (1.0 - pt) ** gamma * nll
    loss = jnp.where(valid, loss, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)
