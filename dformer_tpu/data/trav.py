"""Trav (robot traversability) datasets: RGB camera frames paired with 360-beam
lidar scans from pickled ROS LaserScan messages, CSV-manifest driven.

Mirrors the reference dataset family (utils/dataloader/RGBXDataset.py:143-383):
  * TravRGBDDataset / TravRGBDLabeledDataset: rows with img/depth(/label)
    paths; lidar = pickle['ranges'][::-1][540:900] (front 90° sector).
  * FewShotTravDatasetBinary: episodic sampler drawing n_shots support rows
    and one query row per episode.
  * K-fold splits (sklearn KFold(4, shuffle, seed 42), dataloader.py:324-401)
    and labeled/unlabeled splits (dataloader.py:404-472).

Host code only decodes; lidar z-scoring and rgb normalization run on device
(trav_prepare_batch below).
"""

import os
import os.path as osp
import pickle
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

TRAV_LIDAR_MEAN = 3.712411900604355
TRAV_LIDAR_STD = 1.4213359933145486


def read_lidar(path: str) -> np.ndarray:
    """360-beam front sector from a pickled LaserScan
    (reference RGBXDataset.py:163-165)."""
    with open(path, "rb") as f:
        data = pickle.load(f)
    return np.asarray(data["ranges"][::-1], np.float32)[540:900]


def _imread_rgb(path):
    # cv2-native BGR order: the reference's _open_image passes COLOR_BGR2RGB
    # as an imread flag (no-op conversion), so its models see BGR pixels.
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img


class TravRGBDDataset:
    """CSV rows with 'img' + 'depth' columns; labels derived from the image
    path (images/ -> labels/, .npy) (reference RGBXDataset.py:143-185)."""

    def __init__(self, df):
        self.df = df.reset_index(drop=True)

    def __len__(self):
        return len(self.df)

    def set_epoch(self, seed):
        pass

    def _load(self, rgb_path, laser_path, gt_path=None):
        rgb = _imread_rgb(rgb_path)
        laser = read_lidar(laser_path)
        out = dict(rgb=rgb, laser=laser, rgb_path=rgb_path,
                   depth_path=laser_path, n=len(self.df))
        if gt_path is not None:
            out["gt"] = np.load(gt_path).astype(np.int32)
            out["gt_path"] = gt_path
        return out

    def __getitem__(self, index):
        row = self.df.iloc[index]
        gt_path = osp.splitext(row["img"].replace("/images/", "/labels/"))[0] \
            + ".npy"
        return self._load(row["img"], row["depth"], gt_path)


class TravRGBDLabeledDataset(TravRGBDDataset):
    """Rows with explicit image/depth/label columns; label may be missing
    (unlabeled pool) (reference RGBXDataset.py:189-220)."""

    def __getitem__(self, index):
        row = self.df.iloc[index]
        label = row.get("label")
        gt_path = label if isinstance(label, str) and label else None
        return self._load(row["image"], row["depth"], gt_path)


class FewShotTravDatasetBinary:
    """Episodic sampler: n_shots support + 1 query per episode
    (reference RGBXDataset.py:328-383)."""

    def __init__(self, df_support, df_query, n_shots=5, n_queries=1,
                 max_iters=1000, seed=0):
        self.support = TravRGBDLabeledDataset(df_support)
        self.query = TravRGBDLabeledDataset(df_query)
        self.n_shots = n_shots
        self.max_iters = max_iters
        self.seed = seed

    def __len__(self):
        return self.max_iters

    def set_epoch(self, seed):
        self.seed = seed

    def __getitem__(self, index):
        rng = np.random.RandomState(self.seed * 1000003 + index)
        si = rng.choice(len(self.support), self.n_shots, replace=False)
        qi = rng.choice(len(self.query), 1, replace=False)
        s = [self.support[int(i)] for i in si]
        q = self.query[int(qi[0])]
        return dict(
            s_img=np.stack([x["rgb"] for x in s]),
            s_gt=np.stack([x["gt"] for x in s]),
            s_depth=np.stack([x["laser"] for x in s]),
            q_img=q["rgb"], q_gt=q["gt"], q_depth=q["laser"],
            fn=q["rgb_path"],
        )


class FewShotTravRGBDDataset:
    """Class-grouped episodic sampler (reference RGBXDataset.py:223-326):
    rows are grouped by the dominant class of their mask; each episode draws
    K support + Q query items from one class's pool."""

    def __init__(self, df, class_names=(0, 1), K=5, Q=1, seed=0):
        self.K, self.Q = K, Q
        self.seed = seed
        self.class_names = list(class_names)
        self.df = df.reset_index(drop=True)
        self.class_to_rows = self._group_by_class()

    def _mask_path(self, row):
        return osp.splitext(row["img"].replace("/images/", "/labels/"))[0] \
            + ".npy"

    def _group_by_class(self):
        rng = np.random.RandomState(self.seed)
        groups = {c: [] for c in self.class_names}
        for _, row in self.df.iterrows():
            gt = np.load(self._mask_path(row))
            classes = np.unique(gt)
            classes = classes[(classes != 255)
                              & np.isin(classes, self.class_names)]
            if len(classes) == 0:
                continue
            c = int(rng.choice(classes))
            groups[c].append(dict(rgb=row["img"], gt=self._mask_path(row),
                                  depth=row["depth"]))
        return groups

    def __len__(self):
        return len(self.class_names)

    def set_epoch(self, seed):
        self.seed = seed

    def __getitem__(self, index):
        cls = self.class_names[index]
        pool = self.class_to_rows[cls]
        if len(pool) < self.K + self.Q:
            raise ValueError(f"not enough samples for class {cls}")
        rng = np.random.RandomState(self.seed * 1000003 + index)
        picks = rng.choice(len(pool), self.K + self.Q, replace=False)

        def load(sample):
            return (_imread_rgb(sample["rgb"]),
                    np.load(sample["gt"]).astype(np.int32),
                    read_lidar(sample["depth"]))

        sup = [load(pool[int(i)]) for i in picks[:self.K]]
        qry = [load(pool[int(i)]) for i in picks[self.K:]]
        return dict(
            s_imgs=np.stack([s[0] for s in sup]),
            s_masks=np.stack([s[1] for s in sup]),
            s_depths=np.stack([s[2] for s in sup]),
            q_imgs=np.stack([q[0] for q in qry]),
            q_masks=np.stack([q[1] for q in qry]),
            q_depths=np.stack([q[2] for q in qry]),
            cls=cls,
        )


def class_episodes_to_meta_batch(b):
    """Collated class-grouped episode batch (FewShotTravRGBDDataset keys
    s_imgs/s_masks/s_depths [B,K,...] + q_* [B,Q,...]) -> the meta_forward
    contract (s_img [B*Q,K,...], q_img [B*Q,...]): each of the Q query
    images becomes an episode sharing its class's K-shot support set
    (reference get_fs_train_loader episode unit, dataloader.py:229-323)."""
    Q = b["q_imgs"].shape[1]
    Bq = b["q_imgs"].shape[0] * Q
    rep = lambda a: np.repeat(np.asarray(a), Q, axis=0)
    flat = lambda a: np.asarray(a).reshape((Bq,) + a.shape[2:])
    return dict(s_img=rep(b["s_imgs"]), s_gt=rep(b["s_masks"]),
                s_depth=rep(b["s_depths"]), q_img=flat(b["q_imgs"]),
                q_gt=flat(b["q_masks"]), q_depth=flat(b["q_depths"]))


def load_trav_csv(path):
    import pandas as pd

    return pd.read_csv(path, index_col=0)


def labeled_unlabeled_split(labeled_csv, unlabeled_csv):
    """(train_df, val_df) per get_unlabeled_loaders (dataloader.py:404-412)."""
    import pandas as pd

    labeled = pd.read_csv(labeled_csv)
    train_df = labeled[labeled["label"].notna() & (labeled["label"] != "")]
    val_df = pd.read_csv(unlabeled_csv)
    val_df = val_df.rename(columns={"depth_path": "depth",
                                    "img_path": "image"})
    return train_df, val_df


def calc_depth_mean_std(csv_file, depth_col="depth"):
    """Lidar normalization stats over a manifest (reference
    local_configs/_base_/datasets/Trav.py:78-88 calc_depth_mean_std;
    produced the committed 3.7124 / 1.4213)."""
    import pandas as pd

    df = pd.read_csv(csv_file)
    scans = np.concatenate([read_lidar(p) for p in df[depth_col]])
    return float(np.mean(scans)), float(np.std(scans))


def rebase_manifest_paths(csv_file, img_base, depth_base, level=4,
                          out_csv=None):
    """Rewrite absolute img/depth paths onto new roots, keeping the last
    `level` path components (reference Trav.py:91-120 rename_path_csv)."""
    import pandas as pd

    def update(path, base):
        parts = str(path).split(os.sep)
        return osp.join(base, *parts[-level:])

    df = pd.read_csv(csv_file, index_col=0)
    depth_col = "laser" if "laser" in df.columns else "depth"
    img_col = "img" if "img" in df.columns else "image"
    df[depth_col] = df[depth_col].apply(lambda p: update(p, depth_base))
    df[img_col] = df[img_col].apply(lambda p: update(p, img_base))
    df = df.rename(columns={"laser": "depth"})
    df.to_csv(out_csv or csv_file)
    return df


def kfold_splits(csv_file, n_splits=4, seed=42):
    """sklearn 4-fold splits of labeled rows (dataloader.py:324-338)."""
    import pandas as pd
    from sklearn.model_selection import KFold

    df = pd.read_csv(csv_file)
    df = df[df["label"].notna() & (df["label"] != "")]
    kf = KFold(n_splits=n_splits, shuffle=True, random_state=seed)
    return [(df.iloc[tr], df.iloc[va]) for tr, va in kf.split(df)]


@partial(jax.jit, static_argnames=("mirror",))
def trav_prepare_batch(rgb, laser, key, rgb_mean, rgb_std, mirror: bool,
                       gt=None):
    """Device-side Trav preprocessing (TravTransform, dataloader.py:79-99):
    optional train mirror of rgb(+gt), rgb /255 normalize, lidar z-score."""
    rgb = (rgb.astype(jnp.float32) / 255.0 - rgb_mean) / rgb_std
    laser = (laser.astype(jnp.float32) - TRAV_LIDAR_MEAN) / TRAV_LIDAR_STD
    if mirror:
        flips = jax.random.bernoulli(key, 0.5, (rgb.shape[0],))
        sel = flips[:, None, None, None]
        rgb = jnp.where(sel, rgb[:, :, ::-1], rgb)
        if gt is not None:
            gt = jnp.where(flips[:, None, None], gt[:, :, ::-1], gt)
    if gt is not None:
        return rgb, laser, gt
    return rgb, laser
