"""Trav/FSS coverage: lidar expansion forward, meta_forward episodes,
episodic train step with the restricted trainable mask, pseudo-label dump."""

import os

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


def _write_class_fixture(root, n_per_class=3, hw=(64, 96)):
    """Synthetic on-disk Trav manifest: per class, images whose mask contains
    ONLY that class (so FewShotTravRGBDDataset groups them deterministically),
    plus pickled LaserScan files."""
    import pickle

    import cv2
    import pandas as pd

    rng = np.random.RandomState(0)
    os.makedirs(f"{root}/images", exist_ok=True)
    os.makedirs(f"{root}/labels", exist_ok=True)
    os.makedirs(f"{root}/scans", exist_ok=True)
    rows = []
    for cls in (0, 1):
        for i in range(n_per_class):
            name = f"c{cls}_{i}"
            img = rng.randint(0, 256, hw + (3,), np.uint8)
            cv2.imwrite(f"{root}/images/{name}.png", img)
            np.save(f"{root}/labels/{name}.npy",
                    np.full(hw, cls, np.int64))
            with open(f"{root}/scans/{name}.pkl", "wb") as f:
                pickle.dump({"ranges": rng.rand(1080).astype(np.float32) * 5},
                            f)
            rows.append(dict(img=f"{root}/images/{name}.png",
                             depth=f"{root}/scans/{name}.pkl"))
    return pd.DataFrame(rows)


def test_class_episode_pipeline_with_contrastive(tmp_path):
    """One class-grouped episode through the new --class-episodes path
    (FewShotTravRGBDDataset -> class_episodes_to_meta_batch -> FSS step with
    the contrastive prototype term): finite loss, non-zero contrastive term
    (reference get_fs_train_loader, dataloader.py:229-323 + ContrastiveLoss,
    models/builder.py:61-88)."""
    from dformer_tpu.data.loader import Loader
    from dformer_tpu.data.trav import (FewShotTravRGBDDataset,
                                       class_episodes_to_meta_batch)

    df = _write_class_fixture(str(tmp_path))
    ds = FewShotTravRGBDDataset(df, class_names=(0, 1), K=2, Q=1)
    assert len(ds) == 2
    assert all(len(v) == 3 for v in ds.class_to_rows.values())

    (batch,) = list(Loader(ds, batch_size=2))
    assert batch["s_imgs"].shape == (2, 2, 64, 96, 3)
    assert batch["q_imgs"].shape == (2, 1, 64, 96, 3)
    assert sorted(batch["cls"]) == [0, 1]
    b = class_episodes_to_meta_batch(batch)
    assert b["s_img"].shape == (2, 2, 64, 96, 3)
    assert b["q_img"].shape == (2, 64, 96, 3)

    cfg = trav_cfg()
    model, variables = _init(cfg)
    tmask = fss_trainable_mask(variables["params"])
    tx = make_optimizer(cfg, variables["params"], tmask)
    state = TrainState(step=jnp.asarray(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = make_fss_train_step(model, tx, cfg, contrastive_weight=0.1)

    key = jax.random.PRNGKey(0)
    s_img, s_laser, s_gt = trav_prepare_batch(
        jnp.asarray(b["s_img"].reshape(4, 64, 96, 3)),
        jnp.asarray(b["s_depth"].reshape(4, -1)), key,
        jnp.asarray([0.5] * 3), jnp.asarray([0.3] * 3), False,
        jnp.asarray(b["s_gt"].reshape(4, 64, 96)))
    q_img, q_laser, q_gt = trav_prepare_batch(
        jnp.asarray(b["q_img"]), jnp.asarray(b["q_depth"]), key,
        jnp.asarray([0.5] * 3), jnp.asarray([0.3] * 3), False,
        jnp.asarray(b["q_gt"]))
    state, (loss, con) = step(
        state, s_img.reshape(2, 2, 64, 96, 3), s_gt.reshape(2, 2, 64, 96),
        s_laser.reshape(2, 2, -1), q_img, q_gt, q_laser, key)
    assert np.isfinite(float(loss)), float(loss)
    assert np.isfinite(float(con)) and float(con) != 0.0, float(con)


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
