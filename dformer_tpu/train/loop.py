"""Training loop: jitted train step over a device mesh + epoch driver.

Replaces the reference's DDP loop (utils/train.py:290-391). One jitted step
fuses: device-side augmentation consumption, bf16/fp32 forward with BN batch
stats (global under the mesh = SyncBN), masked-CE loss (+ aux), backward
(XLA inserts the grad all-reduce), AdamW with warmup-poly LR, and the
frozen-param mask. The loss returned is already the global mean (the
reference all-reduces it separately for logging, train.py:329-330).
"""

import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dformer_tpu.ops.loss import softmax_cross_entropy_masked_mean
from dformer_tpu.parallel.mesh import commit_global, replicated


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_train_step(model, tx, cfg, mesh=None, with_coverage_flags=False):
    """Returns train_step(state, rgb, gt, modal_x, rng) -> (state, loss).

    with_coverage_flags=True appends per-leaf (grad != 0, update != 0) bool
    vectors to the return — the step-1 coverage audit's inputs
    (train/audit.py; reference missing-grad audit, utils/train.py:347-351).
    The any(!=0) reductions cost one extra HBM read of the grad tree
    (~0.2 ms for DFormer-L) and are computed in the same executable, so the
    audited first step compiles once, not twice."""
    aux_rate = cfg.get("aux_rate", 0.0)
    background = cfg.background

    def step_fn(state: TrainState, rgb, gt, modal_x, rng):
        drop_key, nmf_key = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            (logits, aux), new_vars = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                rgb, modal_x, train=True, deterministic_bases=False,
                method=model.forward_with_aux,
                mutable=["batch_stats"],
                rngs={"dropout": drop_key, "nmf": nmf_key},
            )
            loss = softmax_cross_entropy_masked_mean(logits, gt, background)
            if aux is not None and aux_rate:
                loss = loss + aux_rate * softmax_cross_entropy_masked_mean(
                    aux, gt, background)
            return loss, new_vars["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        if with_coverage_flags:
            gflags = jnp.stack([jnp.any(g != 0)
                                for g in jax.tree.leaves(grads)])
            uflags = jnp.stack([jnp.any(u != 0)
                                for u in jax.tree.leaves(updates)])
            return new_state, loss, (gflags, uflags)
        return new_state, loss

    # Plain jit: shardings are inferred from the committed inputs (state
    # device_put replicated once, batches device_put batch-sharded by the
    # caller / shard_batch) and GSPMD propagates them. Explicit
    # in_shardings/out_shardings on jit force a reshard of the whole state
    # every step — measured at 39 s/step through the axon host tunnel vs
    # 300 ms for inferred shardings on the same mesh.
    del mesh
    return jax.jit(step_fn, donate_argnums=(0,))


class Trainer:
    """Epoch driver: augment-on-device, step, periodic eval + top-5 ckpt
    (reference utils/train.py epoch loop + engine checkpoint policy)."""

    def __init__(self, model, state: TrainState, tx, cfg, mesh=None,
                 logger=None, seed: int = 8964, tb=None,
                 trainable_mask=None):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.logger = logger
        self.tb = tb
        self.rng = jax.random.PRNGKey(seed)
        self.step_fn = make_train_step(model, tx, cfg, mesh,
                                       with_coverage_flags=True)
        # step-1 coverage audit expectation (reference missing-grad audit,
        # utils/train.py:347-351); None = everything expected trainable.
        # Grad checks run after the first step; the update checks need a
        # nonzero-LR step (warmup lr is 0 at iter 0, faithful to the
        # reference, lr_policy.py:30) so the audit retries until one runs.
        self.trainable_mask = trainable_mask
        self._audited = False
        self._audit_verbose = True
        self._param_paths = None
        # commit the state replicated over the mesh once; batches are
        # committed batch-sharded per step — jit infers the DP shardings
        if mesh is not None and np.prod(list(mesh.shape.values())) > 1:
            if jax.process_count() > 1:
                # every host holds an identical seeded init; promote the
                # host-local copies to one global replicated array
                from jax.experimental import multihost_utils
                from jax.sharding import PartitionSpec

                state = multihost_utils.host_local_array_to_global_array(
                    jax.device_get(state), mesh, PartitionSpec())
            else:
                state = jax.device_put(state, replicated(mesh))
        self.state = state

    def log(self, msg):
        if self.logger:
            self.logger.info(msg)
        else:
            print(msg, flush=True)

    def run_epoch(self, loader, epoch: int, total_epochs: int = None,
                  guard=None) -> float:
        """guard: optional runtime.preempt.PreemptionGuard — when it flips
        to requested, stop before the next step (the in-flight one
        completes; the driver checkpoints the live state)."""
        from dformer_tpu.data.augment import device_train_augment

        cfg = self.cfg
        loader.set_epoch(epoch)
        losses = []
        t0 = time.time()
        n = len(loader)
        multi = self.mesh is not None and \
            np.prod(list(self.mesh.shape.values())) > 1
        for it, batch in enumerate(loader):
            if guard is not None and guard.requested:
                self.log(f"epoch {epoch} stopped by preemption after "
                         f"{it}/{n} iterations")
                break
            key = jax.random.fold_in(self.rng, epoch * 100003 + it)
            if multi:
                # forms the GLOBAL batch: under multi-host each host
                # contributes its batch_size//world slice
                arrs = {k: commit_global(batch[k], self.mesh)
                        for k in ("rgb", "gt", "modal_x")}
            else:
                arrs = {k: jnp.asarray(batch[k])
                        for k in ("rgb", "gt", "modal_x")}
            rgb, gt, modal_x = device_train_augment(
                arrs["rgb"], arrs["gt"], arrs["modal_x"], key,
                (cfg.image_height, cfg.image_width),
                tuple(cfg.train_scale_array),
                jnp.asarray(cfg.norm_mean, jnp.float32),
                jnp.asarray(cfg.norm_std, jnp.float32),
                jnp.asarray([0.48, 0.48, 0.48], jnp.float32)
                if cfg.x_is_single_channel
                else jnp.asarray(cfg.norm_mean, jnp.float32),
                jnp.asarray([0.28, 0.28, 0.28], jnp.float32)
                if cfg.x_is_single_channel
                else jnp.asarray(cfg.norm_std, jnp.float32),
                true_hw=(jnp.asarray(batch["hw"]) if "hw" in batch else None),
            )
            if not self._audited and self._param_paths is None:
                from dformer_tpu.train.audit import param_paths

                self._param_paths = param_paths(self.state.params)
            self.state, loss, flags = self.step_fn(self.state, rgb, gt,
                                                   modal_x, self.rng)
            if not self._audited:
                from dformer_tpu.train.audit import coverage_audit

                report = coverage_audit(
                    self._param_paths, *jax.device_get(flags),
                    trainable_mask=self.trainable_mask, logger=self.logger,
                    verbose_grad=self._audit_verbose)
                self._audit_verbose = False
                self._audited = report["complete"]
            # keep the loss lazy (device scalar) — no host sync per step;
            # per-iter series resolve at epoch end (reference logs every
            # iter with an all-reduce, utils/train.py:329-330,377-381)
            losses.append(loss)
            if it % max(n // 10, 1) == 0:
                # drain the queued steps so s/it includes real device time
                jax.block_until_ready(loss)
                remaining = (n - it - 1) + \
                    n * (max(total_epochs - epoch, 0) if total_epochs else 0)
                sec_per_it = (time.time() - t0) / (it + 1)
                eta_s = sec_per_it * remaining
                self.log(f"epoch {epoch} iter {it + 1}/{n} "
                         f"loss {float(loss):.4f} "
                         f"({sec_per_it:.2f}s/it, ETA {eta_s / 60:.1f}m)")
        # ONE transfer for the whole epoch series (per-scalar float() would
        # pay n tunnel round-trips on this runtime)
        losses = np.asarray(jax.device_get(jnp.stack(losses))).tolist() \
            if losses else []
        if self.tb is not None:
            base = (epoch - 1) * n
            for i, l in enumerate(losses):
                self.tb.scalar("train/loss_iter", l, base + i)
        return float(np.mean(losses)) if losses else float("nan")
