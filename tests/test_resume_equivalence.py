"""Resume equivalence: train N epochs straight == train k + save + restore +
train N-k (the reference's operational resume contract,
utils/engine/engine.py:161-186; SURVEY §7 step 8 exit criterion).

Holds because every source of randomness is threaded deterministically:
the per-iter augment key is fold_in(rng, epoch*100003+it), the step key is
fold_in(rng, state.step) with step restored from the checkpoint, and the
loader shuffles with RandomState(seed+epoch)."""

import numpy as np

import jax
import jax.numpy as jnp

from dformer_tpu.data.loader import train_batches
from dformer_tpu.models import build_model
from dformer_tpu.train.checkpoint import CheckpointManager
from dformer_tpu.train.loop import TrainState, Trainer
from dformer_tpu.train.optim import make_optimizer
from tests.test_train_eval import tiny_cfg


class _LossRecorder:
    def __init__(self):
        self.iter_losses = []

    def scalar(self, tag, value, step):
        if tag == "train/loss_iter":
            self.iter_losses.append((step, float(value)))


def _fresh(cfg):
    model = build_model(cfg)
    z = jnp.zeros((1, cfg.image_height, cfg.image_width, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), z, z)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(step=jnp.asarray(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    return model, tx, state


def _run_epochs(model, tx, state, cfg, start_epoch, end_epoch, rec):
    trainer = Trainer(model, state, tx, cfg, tb=rec, logger=None)
    trainer._audited = True  # skip the step-1 audit noise in this test
    loader = train_batches(cfg, synthetic=True)
    for epoch in range(start_epoch, end_epoch + 1):
        trainer.run_epoch(loader, epoch)
    return trainer.state


def test_resume_equals_straight_run(tmp_path):
    cfg = tiny_cfg(nepochs=4, niters_per_epoch=2, batch_size=4)

    # A: 4 epochs straight
    model, tx, state = _fresh(cfg)
    rec_a = _LossRecorder()
    state_a = _run_epochs(model, tx, state, cfg, 1, 4, rec_a)

    # B: 2 epochs, save, fresh process-equivalent restore, 2 more epochs
    model_b, tx_b, state_b = _fresh(cfg)
    rec_b = _LossRecorder()
    state_b = _run_epochs(model_b, tx_b, state_b, cfg, 1, 2, rec_b)
    cm = CheckpointManager(str(tmp_path))
    cm.save(state_b, epoch=2, miou=1.0)

    model_c, tx_c, state_c = _fresh(cfg)  # blank re-init, as a new process
    restored, next_epoch = cm.restore(state_c)
    assert next_epoch == 3
    assert int(restored.step) == 4
    state_b = _run_epochs(model_c, tx_c, restored, cfg, next_epoch, 4, rec_b)

    # loss sequences match exactly (same inputs, same keys, same state)
    assert len(rec_a.iter_losses) == len(rec_b.iter_losses) == 8
    np.testing.assert_allclose(
        np.asarray([l for _, l in rec_a.iter_losses]),
        np.asarray([l for _, l in rec_b.iter_losses]), rtol=0, atol=0)

    # final params + batch_stats + step match bitwise
    assert int(state_a.step) == int(state_b.step) == 8
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for sa, sb in zip(jax.tree.leaves(state_a.batch_stats),
                      jax.tree.leaves(state_b.batch_stats)):
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
