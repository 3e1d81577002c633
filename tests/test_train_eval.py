"""Integration tests: train step over an 8-device CPU mesh (DP sharding,
SyncBN-for-free, frozen-param mask), evaluation paths (single-scale / MSF /
sliding), device augmentation, and checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dformer_tpu.config import AttrDict, load_config
from dformer_tpu.data.augment import device_train_augment
from dformer_tpu.data.datasets import SyntheticRGBXDataset
from dformer_tpu.data.loader import Loader
from dformer_tpu.eval.evaluate import Evaluator, slide_window_grid
from dformer_tpu.models import build_model
from dformer_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from dformer_tpu.train.loop import TrainState, Trainer, make_train_step
from dformer_tpu.train.optim import (decay_mask, make_optimizer,
                                     trainable_mask_from_matched)


def tiny_cfg(**over):
    cfg = load_config("local_configs.NYUDepthv2.DFormer_Tiny")
    cfg.image_height, cfg.image_width = 64, 96
    cfg.num_classes = 5
    cfg.batch_size = 8
    cfg.nepochs = 10
    cfg.niters_per_epoch = 2
    cfg.warm_up_epoch = 1
    cfg.eval_crop_size = [64, 96]
    cfg.num_train_imgs = 8
    cfg.num_eval_imgs = 4
    for k, v in over.items():
        cfg[k] = v
    return cfg


@pytest.fixture(scope="module")
def tiny_model_state():
    cfg = tiny_cfg()
    model = build_model(cfg)
    rgb = jnp.zeros((2, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), rgb, rgb)
    return cfg, model, variables


def test_train_step_decreases_loss_on_mesh(tiny_model_state):
    cfg, model, variables = tiny_model_state
    # the train step donates its input state; don't hand it the shared
    # fixture arrays or later tests see deleted buffers
    variables = jax.tree.map(jnp.copy, variables)
    mesh = make_mesh(8)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(step=jnp.asarray(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = make_train_step(model, tx, cfg, mesh)

    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(8, 64, 96, 3).astype(np.float32))
    modal = jnp.asarray(rng.rand(8, 64, 96, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, 5, (8, 64, 96)).astype(np.int32))

    bsh, rep = batch_sharding(mesh), replicated(mesh)
    rgb = jax.device_put(rgb, bsh)
    modal = jax.device_put(modal, bsh)
    gt = jax.device_put(gt, bsh)

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(8):
        state, loss = step(state, rgb, gt, modal, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_frozen_mask_keeps_encoder_fixed(tiny_model_state):
    cfg, model, variables = tiny_model_state
    variables = jax.tree.map(jnp.copy, variables)
    params = variables["params"]
    # pretend the whole encoder stem was loaded -> frozen
    matched = [("encoder_backbone", "stem", "conv1", "kernel")]
    tmask = trainable_mask_from_matched(params, matched)
    tx = make_optimizer(cfg, params, tmask)
    state = TrainState(step=jnp.asarray(0), params=params,
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(params))
    step = make_train_step(model, tx, cfg, mesh=None)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, 5, (2, 64, 96)).astype(np.int32))
    before = np.asarray(params["encoder_backbone"]["stem"]["conv1"]["kernel"])
    before_other = np.asarray(
        params["encoder_backbone"]["stem"]["conv2"]["kernel"])
    # two steps: warmup LR is exactly 0 at step 0 (reference lr_policy
    # semantics), so the first update moves nothing
    state, _ = step(state, rgb, gt, rgb, jax.random.PRNGKey(0))
    state, _ = step(state, rgb, gt, rgb, jax.random.PRNGKey(0))
    after = np.asarray(
        state.params["encoder_backbone"]["stem"]["conv1"]["kernel"])
    after_other = np.asarray(
        state.params["encoder_backbone"]["stem"]["conv2"]["kernel"])
    np.testing.assert_array_equal(before, after)
    assert np.abs(after_other - before_other).max() > 0


def test_decay_mask_groups():
    cfg, = (tiny_cfg(),)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
                           jnp.zeros((1, 64, 96, 3)))
    mask = decay_mask(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(mask)
    for path, v in flat:
        name = path[-1].key
        if name == "kernel":
            assert v, path
        if name in ("bias", "layer_scale_1", "weight"):
            assert not v, path


def test_slide_window_grid_matches_reference_rule():
    # 736x992 image, 480x640 crop, stride 2/3 -> 2x2 grid with clamped last
    grid = slide_window_grid(736, 992, (480, 640), 2 / 3)
    assert grid == [(0, 0), (0, 352), (256, 0), (256, 352)]
    assert slide_window_grid(480, 640, (480, 640), 2 / 3) == [(0, 0)]


def test_evaluator_paths(tiny_model_state):
    cfg, model, variables = tiny_model_state
    ds = SyntheticRGBXDataset(4, (64, 96), cfg.num_classes)
    batches = []
    for b in Loader(ds, 2):
        rgb = b["rgb"].astype(np.float32) / 255.0
        batches.append(dict(rgb=rgb, modal_x=rgb, gt=b["gt"]))

    ev = Evaluator(model, variables, cfg)
    m = ev.evaluate(batches)
    ious, miou = m.compute_iou()
    assert 0 <= miou <= 100 and len(ious) == cfg.num_classes
    assert m.hist.sum() == 4 * 64 * 96

    m2 = ev.evaluate_msf(batches, scales=[0.75, 1.0], flip=True)
    assert m2.hist.sum() == 4 * 64 * 96

    cfg_s = tiny_cfg(eval_crop_size=[48, 64])
    ev_s = Evaluator(model, variables, cfg_s, sliding=True)
    m3 = ev_s.evaluate(batches)
    assert m3.hist.sum() == 4 * 64 * 96


def test_device_augment_semantics():
    rng = np.random.RandomState(0)
    B, H, W = 4, 64, 96
    rgb = rng.randint(0, 256, (B, H, W, 3), np.uint8)
    gt = rng.randint(0, 5, (B, H, W)).astype(np.int32)
    out = device_train_augment(
        jnp.asarray(rgb), jnp.asarray(gt), jnp.asarray(rgb),
        jax.random.PRNGKey(0), (H, W), (0.5, 1.0, 1.75),
        jnp.asarray([0.485, 0.456, 0.406]), jnp.asarray([0.229, 0.224, 0.225]),
        jnp.asarray([0.48] * 3), jnp.asarray([0.28] * 3))
    r, g, x = out
    assert r.shape == (B, H, W, 3) and g.shape == (B, H, W)
    assert r.dtype == jnp.float32 and g.dtype == jnp.int32
    g = np.asarray(g)
    # labels are either valid classes or the pad value
    assert set(np.unique(g)).issubset(set(range(5)) | {255})
    # normalized rgb in a sane range
    assert np.abs(np.asarray(r)).max() < 5.0


def test_checkpoint_roundtrip(tmp_path, tiny_model_state):
    from dformer_tpu.train.checkpoint import CheckpointManager

    cfg, model, variables = tiny_model_state
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(step=jnp.asarray(3), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    cm = CheckpointManager(str(tmp_path), keep=2)
    cm.save(state, epoch=1, miou=10.0)
    cm.save(state, epoch=2, miou=30.0)
    cm.save(state, epoch=3, miou=20.0)
    # keep=2 -> the 10.0 one is dropped (retention is best-by-metric)
    best_path, best_epoch, best_miou = cm.best()
    assert "miou_30.0" in best_path and best_epoch == 2
    # resume target is the NEWEST epoch, not the best metric
    path, epoch = cm.latest()
    assert "miou_20.0" in path and epoch == 3

    blank = jax.tree.map(jnp.zeros_like, state)
    restored, next_epoch = cm.restore(blank)
    assert next_epoch == 4
    np.testing.assert_array_equal(
        np.asarray(restored.params["decode_head"]["conv_seg"]["kernel"]),
        np.asarray(state.params["decode_head"]["conv_seg"]["kernel"]))
    assert int(restored.step) == 3
