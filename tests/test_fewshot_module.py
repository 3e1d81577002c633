"""FewShotSegmentation wrapper, contrastive loss, and the class-grouped
episodic dataset."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dformer_tpu.models.fewshot import (compute_prototypes, contrastive_loss,
                                        match_prototypes)

RNG = np.random.RandomState(0)


def test_prototypes_and_matching_recover_planted_classes():
    # construct features where class-0 pixels ~ +u and class-1 pixels ~ -u
    C = 8
    u = RNG.randn(C).astype(np.float32)
    masks = RNG.randint(0, 2, (3, 10, 10)).astype(np.int32)
    feats = np.where(masks[..., None] == 0, u, -u).astype(np.float32)
    feats += 0.01 * RNG.randn(*feats.shape).astype(np.float32)

    protos = compute_prototypes(jnp.asarray(feats), jnp.asarray(masks), 2)
    assert protos.shape == (2, 3, C)
    pred = match_prototypes(jnp.asarray(feats), protos)
    acc = float((np.asarray(pred) == masks).mean())
    assert acc > 0.99


def test_contrastive_loss_prefers_correct_prototypes():
    C = 8
    u = RNG.randn(C).astype(np.float32)
    masks = RNG.randint(0, 2, (2, 8, 8)).astype(np.int32)
    feats = np.where(masks[..., None] == 0, u, -u).astype(np.float32)
    protos_good = compute_prototypes(jnp.asarray(feats), jnp.asarray(masks), 2)
    protos_bad = protos_good[::-1]
    good = float(contrastive_loss(jnp.asarray(feats), protos_good,
                                  jnp.asarray(masks)))
    bad = float(contrastive_loss(jnp.asarray(feats), protos_bad,
                                 jnp.asarray(masks)))
    assert good < bad


def test_class_grouped_episodic_dataset(tmp_path):
    cv2 = pytest.importorskip("cv2")
    import pandas as pd
    import pickle

    from dformer_tpu.data.trav import FewShotTravRGBDDataset

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rows = []
    for i in range(14):
        img = str(tmp_path / "images" / f"{i}.jpg")
        cv2.imwrite(img, RNG.randint(0, 256, (16, 24, 3), np.uint8))
        # alternate dominant class
        gt = np.full((16, 24), i % 2, np.uint8)
        np.save(str(tmp_path / "labels" / f"{i}.npy"), gt)
        scan = str(tmp_path / f"scan_{i}.pkl")
        with open(scan, "wb") as f:
            pickle.dump({"ranges": RNG.rand(1440).tolist()}, f)
        rows.append(dict(img=img, depth=scan))
    df = pd.DataFrame(rows)

    ds = FewShotTravRGBDDataset(df, class_names=(0, 1), K=3, Q=1)
    assert len(ds) == 2
    ep = ds[0]
    assert ep["s_imgs"].shape == (3, 16, 24, 3)
    assert ep["s_depths"].shape == (3, 360)
    assert ep["q_imgs"].shape == (1, 16, 24, 3)
    assert ep["cls"] in (0, 1)
