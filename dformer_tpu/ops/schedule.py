"""Learning-rate schedules as pure functions of the step counter.

Semantics match the reference policies (utils/lr_policy.py:11-57): WarmUpPolyLR
does linear warmup to base lr over `warmup_steps`, then poly decay
(1 - t/T)^power. Expressed as jnp functions so they trace into the jitted
train step (no per-iter host writes of param_group lr like utils/train.py:353).
"""

import jax.numpy as jnp


def poly_lr(step, base_lr: float, total_steps: int, power: float = 0.9):
    step = jnp.asarray(step, jnp.float32)
    # clamp: past total_steps the base goes negative and x**0.9 -> NaN
    frac = jnp.clip(1.0 - step / float(total_steps), 0.0, 1.0)
    return base_lr * frac ** power


def warmup_poly_lr(step, base_lr: float, total_steps: int, warmup_steps: int,
                   power: float = 0.9):
    step = jnp.asarray(step, jnp.float32)
    warm = base_lr * step / jnp.maximum(float(warmup_steps), 1.0)
    frac = jnp.clip(1.0 - step / float(total_steps), 0.0, 1.0)
    poly = base_lr * frac ** power
    return jnp.where(step < warmup_steps, warm, poly)


def multi_stage_lr(step, stages):
    """stages: list of (until_step, lr); returns lr of first stage with step < until."""
    lr = jnp.asarray(stages[-1][1], jnp.float32)
    for until, val in reversed(stages):
        lr = jnp.where(step < until, val, lr)
    return lr


def linear_increase_lr(step, start_lr: float, end_lr: float, warm_iters: int):
    step = jnp.asarray(step, jnp.float32)
    return start_lr + step * (end_lr - start_lr) / float(warm_iters)
