"""Few-shot segmentation wrapper + contrastive prototype loss
(reference models/builder.py:14-88).

`FewShotSegmentation` is the standalone prototype-matching wrapper around a
trained EncoderDecoder (the episodic fine-tune path lives in
EncoderDecoder.meta_forward, models/builder.py:237-310); `contrastive_loss`
is the InfoNCE-style prototype loss (temperature 0.1)."""

from typing import Any

import jax
import jax.numpy as jnp

from dformer_tpu.ops.resize import resize_bilinear


def compute_prototypes(features, masks, num_classes: int = 2):
    """Class prototypes from support features.

    features: [N, h, w, C]; masks: [N, h, w] int. Returns [num_classes, N, C]
    (masked mean per class per image, reference builder.py:40-48)."""
    protos = []
    for c in range(num_classes):
        m = (masks == c).astype(features.dtype)[..., None]
        proto = jnp.sum(features * m, axis=(1, 2)) / (
            jnp.sum(m, axis=(1, 2)) + 1e-8)
        protos.append(proto)
    return jnp.stack(protos)


def match_prototypes(q_features, prototypes):
    """Assign each query pixel to the most-similar prototype
    (reference builder.py:50-58). q_features: [B, h, w, C];
    prototypes: [K, B, C] -> [B, h, w] class ids."""
    qn = q_features / (jnp.linalg.norm(q_features, axis=-1, keepdims=True)
                       + 1e-8)
    pn = prototypes / (jnp.linalg.norm(prototypes, axis=-1, keepdims=True)
                       + 1e-8)
    sim = jnp.einsum("bhwc,kbc->bkhw", qn, pn)
    return jnp.argmax(sim, axis=1)


class FewShotSegmentation:
    """Prototype-matching episode forward over a bound (model, variables)."""

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables

    def __call__(self, s_imgs, s_depths, s_masks, q_imgs, q_depths):
        enc = lambda r, m: self.model.apply(
            self.variables, r, m, False, method=self.model.encode)
        s_feats = enc(s_imgs, s_depths)[-1]
        q_feats = enc(q_imgs, q_depths)[-1]
        hw = s_feats.shape[1:3]
        m = resize_bilinear(s_masks[..., None].astype(jnp.float32), hw)[..., 0]
        protos = compute_prototypes(s_feats, jnp.round(m).astype(jnp.int32))
        return match_prototypes(q_feats, protos)


def contrastive_loss(q_features, prototypes, q_masks,
                     temperature: float = 0.1):
    """Prototype InfoNCE (reference ContrastiveLoss, builder.py:61-88):
    query pixels should be closer to their class prototype than to others.

    q_features: [B, h, w, C]; prototypes: [K, B, C]; q_masks: [B, h, w]."""
    qn = q_features / (jnp.linalg.norm(q_features, axis=-1, keepdims=True)
                       + 1e-8)
    pn = prototypes / (jnp.linalg.norm(prototypes, axis=-1, keepdims=True)
                       + 1e-8)
    sim = jnp.einsum("bhwc,kbc->bkhw", qn, pn)  # [B, K, h, w]
    K = prototypes.shape[0]
    onehot = jax.nn.one_hot(jnp.clip(q_masks, 0, K - 1), K)  # [B,h,w,K]
    onehot = onehot.transpose(0, 3, 1, 2)
    pos = jnp.sum(sim * onehot, axis=1)
    neg = jnp.sum(sim * (1 - onehot), axis=1) / jnp.maximum(K - 1, 1)
    logits = jnp.stack([pos, neg], axis=-1) / temperature
    loss = -jax.nn.log_softmax(logits, axis=-1)[..., 0]
    return jnp.mean(loss)
