"""Graceful preemption: SIGTERM flips the guard, the trainer stops between
steps, the rescue checkpoint restores and resumes (runtime/preempt.py;
SURVEY §5.3 — the reference loses everything since the last improvement
epoch, utils/engine/engine.py:101-134)."""

import os
import signal

import numpy as np
import jax
import jax.numpy as jnp

from dformer_tpu.runtime.preempt import PreemptionGuard
from dformer_tpu.train.checkpoint import CheckpointManager
from dformer_tpu.train.loop import TrainState, Trainer
from dformer_tpu.train.optim import make_optimizer
from dformer_tpu.models import build_model

from test_train_eval import tiny_cfg


def test_guard_flips_on_sigterm():
    guard = PreemptionGuard(signals=(signal.SIGTERM,)).install()
    try:
        assert not guard.requested
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.requested
    finally:
        guard.uninstall()


def test_second_sigint_restores_default():
    guard = PreemptionGuard(signals=(signal.SIGINT,)).install()
    try:
        os.kill(os.getpid(), signal.SIGINT)  # first: cooperative
        assert guard.requested
        try:
            os.kill(os.getpid(), signal.SIGINT)  # second: default handler
            raised = False
        except KeyboardInterrupt:
            raised = True
        assert raised
    finally:
        guard.uninstall()


class _FlagAfter:
    """Loader wrapper that requests preemption after `n` yielded batches."""

    def __init__(self, batches, guard, n):
        self._batches = batches
        self._guard = guard
        self._n = n

    def set_epoch(self, e):
        pass

    def __len__(self):
        return len(self._batches)

    def __iter__(self):
        for i, b in enumerate(self._batches):
            if i == self._n:
                self._guard._requested = True
            yield b


def test_trainer_stops_and_rescue_checkpoint_resumes(tmp_path):
    cfg = tiny_cfg()
    model = build_model(cfg)
    rgb = jnp.zeros((2, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), rgb, rgb)
    tx = make_optimizer(cfg, variables["params"])
    # the train step donates its input state; keep the fixture arrays alive
    # for the fresh-process restore below
    v1 = jax.tree.map(jnp.copy, variables)
    state = TrainState(step=jnp.asarray(0), params=v1["params"],
                       batch_stats=v1["batch_stats"],
                       opt_state=tx.init(v1["params"]))
    trainer = Trainer(model, state, tx, cfg)

    rng = np.random.RandomState(0)
    batches = [dict(rgb=rng.rand(2, 64, 96, 3).astype(np.float32),
                    gt=rng.randint(0, 5, (2, 64, 96)).astype(np.int32),
                    modal_x=rng.rand(2, 64, 96, 3).astype(np.float32))
               for _ in range(4)]
    guard = PreemptionGuard(signals=())  # flag flipped by the loader shim
    trainer.run_epoch(_FlagAfter(batches, guard, 2), epoch=1, guard=guard)
    assert int(trainer.state.step) == 2  # stopped before batch 3

    cm = CheckpointManager(str(tmp_path), keep=5)
    path = cm.save(trainer.state, 1, 0.0, extra={"preempted": True})
    assert os.path.exists(path)

    # a fresh process restores the rescue state and continues
    state2 = TrainState(step=jnp.asarray(0), params=variables["params"],
                        batch_stats=variables["batch_stats"],
                        opt_state=tx.init(variables["params"]))
    restored, next_epoch = cm.restore(state2)
    assert next_epoch == 2
    assert int(restored.step) == 2
    trainer2 = Trainer(model, restored, tx, cfg)
    trainer2.run_epoch(_FlagAfter(batches, PreemptionGuard(signals=()),
                                  99), epoch=next_epoch)
    assert int(trainer2.state.step) == 6
