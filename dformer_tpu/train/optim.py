"""Optimizer construction: AdamW/SGDM with decay/no-decay grouping, warmup-poly
schedule, and frozen-parameter masking.

Grouping semantics follow group_weight (reference utils/init_func.py:26-70):
conv/linear weights get weight decay; biases and all norm affines don't. (The
reference's isinstance walk silently skips its custom LayerNorm and the
layer_scale parameters from BOTH groups, leaving them un-optimized; since
loaded encoder params are frozen anyway (DFormer.py:272-276) this is
invisible in the stock recipe. Here every non-frozen param is optimized, with
LayerNorm/layer_scale/bias in the no-decay group.)

Freezing reproduces the fork rule "freeze every successfully-loaded encoder
param": the converter reports matched paths, which become an optax
multi_transform label tree routing those leaves to set_to_zero().
"""

from typing import Callable, Optional, Sequence, Set, Tuple

import jax
import optax

from dformer_tpu.ops.schedule import warmup_poly_lr


def decay_mask(params) -> dict:
    """True for leaves that receive weight decay (conv/linear kernels)."""
    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        is_kernel = path[-1] in ("kernel", "in_proj_weight") \
            and getattr(tree, "ndim", 0) >= 2
        return is_kernel
    return walk(params)


def trainable_mask_from_matched(params, matched_paths: Sequence[Tuple[str, ...]],
                                prefix: Tuple[str, ...] = ("encoder_backbone",)):
    """False (frozen) for params whose path was loaded from the pretrain
    under `prefix` (reference freeze rule, DFormer.py:272-276)."""
    frozen: Set[Tuple[str, ...]] = {tuple(p) for p in matched_paths}

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if prefix and path[:len(prefix)] != prefix:
            return True
        return path not in frozen
    return walk(params)


def make_schedule(cfg):
    total = cfg.nepochs * cfg.niters_per_epoch
    warmup = cfg.niters_per_epoch * cfg.warm_up_epoch

    def sched(step):
        return warmup_poly_lr(step, cfg.lr, total, warmup, cfg.lr_power)
    return sched


def make_optimizer(cfg, params, trainable_mask=None,
                   schedule: Optional[Callable] = None) -> optax.GradientTransformation:
    """schedule overrides the cfg-derived warmup-poly LR (step -> lr); the
    trajectory-parity test uses it to replicate the reference's post-step LR
    write (utils/train.py:353-357: step k runs at get_lr(k-1), step 0 at the
    constructor base_lr)."""
    sched = schedule if schedule is not None else make_schedule(cfg)
    if cfg.get("optimizer", "AdamW") == "AdamW":
        tx = optax.adamw(learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8,
                         weight_decay=cfg.weight_decay,
                         mask=decay_mask(params))
    elif cfg.optimizer == "SGDM":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask(params)),
            optax.sgd(learning_rate=sched, momentum=cfg.momentum),
        )
    else:
        raise NotImplementedError(cfg.optimizer)

    if trainable_mask is not None:
        labels = jax.tree.map(lambda t: "train" if t else "frozen",
                              trainable_mask)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels)
    return tx
