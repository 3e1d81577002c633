"""Trav/FSS coverage: lidar expansion forward, meta_forward episodes,
episodic train step with the restricted trainable mask, pseudo-label dump."""

import numpy as np

import jax
import jax.numpy as jnp

from dformer_tpu.config import AttrDict
from dformer_tpu.models import build_model
from dformer_tpu.train.fss import (fss_evaluate, fss_trainable_mask,
                                   make_fss_train_step)
from dformer_tpu.train.loop import TrainState
from dformer_tpu.train.optim import make_optimizer
from dformer_tpu.data.trav import trav_prepare_batch


def trav_cfg():
    return AttrDict(
        backbone="DFormerTrav-Base", decoder="ham", num_classes=2,
        decoder_embed_dim=64, drop_path_rate=0.0, aux_rate=0.0,
        bn_eps=1e-3, bn_momentum=0.1, background=255, temperature=1.0,
        alpha=0.5, optimizer="AdamW", lr=6e-5, lr_power=0.9,
        weight_decay=0.01, momentum=0.9, nepochs=4, niters_per_epoch=4,
        warm_up_epoch=1, image_height=64, image_width=96,
        norm_mean=np.array([0.5, 0.5, 0.5]), norm_std=np.array([0.3, 0.3, 0.3]),
    )


def _init(cfg):
    model = build_model(cfg)
    rgb = jnp.zeros((1, 64, 96, 3))
    lidar = jnp.zeros((1, 360))
    variables = model.init(jax.random.PRNGKey(0), rgb, lidar)
    return model, variables


def test_trav_forward_and_lidar_expansion():
    cfg = trav_cfg()
    model, variables = _init(cfg)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    lidar = jnp.asarray(rng.rand(2, 360).astype(np.float32))
    out = model.apply(variables, rgb, lidar)
    assert out.shape == (2, 64, 96, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_meta_forward_and_fss_step():
    cfg = trav_cfg()
    model, variables = _init(cfg)
    tmask = fss_trainable_mask(variables["params"])
    # attn_expand_e + stage-0 + decoder trainable; stage-3 frozen
    assert tmask["encoder_backbone"]["attn_expand_e"]["query1"]
    assert tmask["decode_head"]["conv_seg"]["kernel"]
    assert not tmask["encoder_backbone"]["body"]["stem"]["conv1"]["kernel"]
    assert not jax.tree.leaves(
        tmask["encoder_backbone"]["body"]["stage_3_block_0"])[0]
    assert all(jax.tree.leaves(
        tmask["encoder_backbone"]["body"]["stage_0_block_0"]))

    tx = make_optimizer(cfg, variables["params"], tmask)
    state = TrainState(step=jnp.asarray(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = make_fss_train_step(model, tx, cfg)

    rng = np.random.RandomState(1)
    B, S = 2, 2
    s_img = jnp.asarray(rng.rand(B, S, 64, 96, 3).astype(np.float32))
    s_gt = jnp.asarray(rng.randint(0, 2, (B, S, 64, 96)).astype(np.int32))
    s_depth = jnp.asarray(rng.rand(B, S, 360).astype(np.float32))
    q_img = jnp.asarray(rng.rand(B, 64, 96, 3).astype(np.float32))
    q_gt = jnp.asarray(rng.randint(0, 2, (B, 64, 96)).astype(np.int32))
    q_depth = jnp.asarray(rng.rand(B, 360).astype(np.float32))

    frozen_before = np.asarray(
        state.params["encoder_backbone"]["body"]["stem"]["conv1"]["kernel"])
    state, loss = step(state, s_img, s_gt, s_depth, q_img, q_gt, q_depth,
                       jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    frozen_after = np.asarray(
        state.params["encoder_backbone"]["body"]["stem"]["conv1"]["kernel"])
    np.testing.assert_array_equal(frozen_before, frozen_after)

    # episodic eval path
    batches = [dict(s_img=s_img, s_gt=s_gt, s_depth=s_depth, q_img=q_img,
                    q_gt=q_gt, q_depth=q_depth)]
    eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
    m = fss_evaluate(model, eval_vars, batches, cfg)
    _, miou = m.compute_iou()
    assert 0 <= miou <= 100


def test_trav_prepare_batch():
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randint(0, 256, (4, 32, 48, 3)).astype(np.uint8))
    laser = jnp.asarray((rng.rand(4, 360) * 5).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, 2, (4, 32, 48)).astype(np.int32))
    r, l, g = trav_prepare_batch(rgb, laser, jax.random.PRNGKey(0),
                                 jnp.asarray([0.5] * 3), jnp.asarray([0.3] * 3),
                                 True, gt)
    assert r.shape == (4, 32, 48, 3) and l.shape == (4, 360)
    # z-scored lidar: roughly centered given mean 3.71 on U[0,5) inputs
    assert abs(float(l.mean())) < 2.0


def test_pseudo_label_dump(tmp_path):
    from dformer_tpu.eval.pseudo_label import infer_unlabeled_masks

    cfg = trav_cfg()
    model, variables = _init(cfg)
    rng = np.random.RandomState(0)
    batches = [dict(
        rgb=jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32)),
        laser=jnp.asarray(rng.rand(2, 360).astype(np.float32)),
        rgb_path=[f"img_{i}.jpg" for i in range(2)],
        depth_path=[f"scan_{i}.pkl" for i in range(2)],
    )]
    csv_path = infer_unlabeled_masks(model, variables, batches, str(tmp_path))
    import pandas as pd

    df = pd.read_csv(csv_path)
    assert len(df) == 2
    mask = np.load(df.iloc[0]["label"])
    assert mask.shape == (64, 96) and set(np.unique(mask)).issubset({0, 1})
