"""Step-1 gradient/trainable-coverage audit.

The reference warns on any parameter with a missing .grad after the first
backward of epoch 1 (utils/train.py:347-351) — catching params disconnected
from the loss. Our optax multi_transform freeze masks make the equivalent
failure (a leaf silently routed to set_to_zero, or never touched by the
loss) easier to hit and harder to see, so the audit checks two things using
per-leaf flags computed INSIDE the jitted train step (grads and updates are
already materialized there; the any(!=0) reductions add one HBM read of the
grad tree, ~0.2 ms for DFormer-L):

* grad coverage (valid at any LR, including the reference-faithful lr=0
  first warmup iter, lr_policy.py:30): a trainable kernel/scale leaf with an
  exactly-zero gradient is disconnected from the loss or stop_gradient'd.
  Conv BIASES directly in front of a BatchNorm legitimately get exact-zero
  grads (BN removes constant shifts) — torch's audit doesn't flag them
  either (.grad exists, it's just zero) — so zero-grad biases are reported
  as info, not warnings; a truly disconnected module is still caught by its
  kernel leaves.
* update coverage (needs a step whose LR is nonzero, i.e. usually step 2):
  a leaf the mask declares frozen must have an exactly-zero optimizer
  update, and a trainable leaf with a nonzero gradient must receive a
  nonzero update. This is checked on the optimizer's actual updates, not
  param deltas, so weight decay can't mask a disconnected leaf. If the
  audited step had lr=0 the check reports incomplete and the Trainer
  re-audits on the next step.
"""

from typing import Optional, Sequence

import jax
import numpy as np


def param_paths(params):
    """Leaf paths in jax.tree.leaves order (same order the step's flag
    vectors are stacked in — both flatten the params/grads tree)."""
    return [tuple(str(getattr(k, "key", k)) for k in p)
            for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]


def flags_from(tree) -> np.ndarray:
    """Host-side per-leaf any(!=0) flags (for tests / non-jit callers)."""
    return np.asarray([bool(np.any(np.asarray(l) != 0))
                       for l in jax.tree.leaves(tree)])


def coverage_audit(paths: Sequence[tuple], grad_nz, upd_nz,
                   trainable_mask=None, logger=None,
                   verbose_grad: bool = True) -> dict:
    """Audit one early train step's flag vectors against the mask.

    Returns {"ok", "complete", "disconnected", "zero_grad_biases",
    "frozen_updated", "trainable_stuck", "per_module"}. complete=False means
    the step produced no updates at all (warmup lr=0) and the update checks
    must be retried on a later step; the grad checks are always final.
    """
    grad_nz = np.asarray(grad_nz, bool)
    upd_nz = np.asarray(upd_nz, bool)
    if trainable_mask is None:
        expected = np.ones(len(paths), bool)
    else:
        expected = np.asarray(jax.tree.leaves(trainable_mask), bool)
    assert len(paths) == len(grad_nz) == len(upd_nz) == len(expected)

    def _log(msg, warn=False):
        if logger is None:
            print(msg, flush=True)
        elif warn and hasattr(logger, "warning"):
            logger.warning(msg)
        else:
            logger.info(msg)

    disconnected, zero_grad_biases = [], []
    for p, g, e in zip(paths, grad_nz, expected):
        if e and not g:
            (zero_grad_biases if p[-1] == "bias" else disconnected).append(p)

    per_module = {}
    for p, g, u, e in zip(paths, grad_nz, upd_nz, expected):
        mod = per_module.setdefault(
            p[0], dict(trainable=0, frozen=0, grad=0, updated=0))
        mod["trainable" if e else "frozen"] += 1
        mod["grad"] += int(g)
        mod["updated"] += int(u)
    if verbose_grad:
        for mod, d in sorted(per_module.items()):
            _log(f"step-1 coverage: {mod}: {d['grad']} grads / "
                 f"{d['updated']} updated over {d['trainable']} trainable "
                 f"+ {d['frozen']} frozen leaves")
        for p in disconnected:
            _log("step-1 coverage: trainable leaf has exactly-zero gradient "
                 "(disconnected from the loss, or stop_gradient'd): "
                 + "/".join(p), warn=True)
        if zero_grad_biases:
            _log(f"step-1 coverage: {len(zero_grad_biases)} bias leaves "
                 "with exact-zero grad (conv bias before BatchNorm — "
                 "absorbed by construction): "
                 + ", ".join("/".join(p) for p in zero_grad_biases[:8])
                 + ("..." if len(zero_grad_biases) > 8 else ""))

    frozen_updated, trainable_stuck = [], []
    complete = bool(upd_nz.any())
    if complete:
        for p, g, u, e in zip(paths, grad_nz, upd_nz, expected):
            if not e and u:
                frozen_updated.append(p)
            elif e and g and not u:
                trainable_stuck.append(p)
        for p in frozen_updated:
            _log("step-1 coverage: FROZEN leaf received a nonzero update "
                 "(mask not applied?): " + "/".join(p), warn=True)
        for p in trainable_stuck:
            _log("step-1 coverage: trainable leaf with nonzero grad got a "
                 "ZERO update (routed to set_to_zero — mislabeled mask?): "
                 + "/".join(p), warn=True)
        if not frozen_updated and not trainable_stuck and not disconnected:
            _log("step-1 coverage: complete — every trainable leaf receives "
                 "gradient and update, every frozen leaf is untouched")
    else:
        _log("step-1 coverage: step produced no updates (warmup lr=0 at "
             "iter 0, faithful to reference lr_policy.py:30) — update "
             "checks deferred to the next step")

    return dict(ok=not disconnected and not frozen_updated
                and not trainable_stuck,
                complete=complete, disconnected=disconnected,
                zero_grad_biases=zero_grad_biases,
                frozen_updated=frozen_updated,
                trainable_stuck=trainable_stuck, per_module=per_module)
