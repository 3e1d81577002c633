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
from dformer_tpu.parallel.mesh import batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_train_step(model, tx, cfg, mesh=None):
    """Returns train_step(state, rgb, gt, modal_x, rng) -> (state, loss)."""
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
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt), loss

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
                 logger=None, seed: int = 8964):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.logger = logger
        self.rng = jax.random.PRNGKey(seed)
        self.step_fn = make_train_step(model, tx, cfg, mesh)
        # commit the state replicated over the mesh once; batches are
        # committed batch-sharded per step — jit infers the DP shardings
        if mesh is not None and np.prod(list(mesh.shape.values())) > 1:
            state = jax.device_put(state, replicated(mesh))
        self.state = state

    def log(self, msg):
        if self.logger:
            self.logger.info(msg)
        else:
            print(msg, flush=True)

    def run_epoch(self, loader, epoch: int) -> float:
        from dformer_tpu.data.augment import device_train_augment

        cfg = self.cfg
        loader.set_epoch(epoch)
        losses = []
        t0 = time.time()
        n = len(loader)
        multi = self.mesh is not None and \
            np.prod(list(self.mesh.shape.values())) > 1
        for it, batch in enumerate(loader):
            key = jax.random.fold_in(self.rng, epoch * 100003 + it)
            if multi:
                sh = batch_sharding(self.mesh)
                arrs = {k: jax.device_put(batch[k], sh)
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
            self.state, loss = self.step_fn(self.state, rgb, gt, modal_x,
                                            self.rng)
            if it % max(n // 10, 1) == 0:
                losses.append(float(loss))
                self.log(f"epoch {epoch} iter {it + 1}/{n} "
                         f"loss {losses[-1]:.4f} "
                         f"({(time.time() - t0) / (it + 1):.2f}s/it)")
        return float(np.mean(losses)) if losses else float("nan")
