"""Trav (robot traversability) dataset base — RGB + 360-beam lidar scan
(reference local_configs/_base_/datasets/Trav.py:12-42). The lidar scan is
`pickle['ranges'][::-1][540:900]`, z-scored with mean 3.7124 / std 1.4213."""

import os.path as osp

import numpy as np

from local_configs._base_ import base_config

TRAV_LIDAR_MEAN = 3.712411900604355
TRAV_LIDAR_STD = 1.4213359933145486


def dataset_config() -> "AttrDict":
    C = base_config()
    C.dataset = "Trav"
    C.dataset_name = "Trav"
    C.scenes = ["erb", "uc", "wh"]
    C.dataset_path = osp.join(C.root_dir, "trav")
    C.rgb_root_folder = osp.join(C.dataset_path, "RGB")
    C.rgb_format = ".jpg"
    C.gt_root_folder = osp.join(C.dataset_path, "labels")
    C.gt_format = ".png"
    C.gt_transform = False
    C.x_root_folder = osp.join(C.dataset_path, "Depth")
    C.x_format = ".png"
    C.x_is_single_channel = True
    C.train_source = osp.join(C.dataset_path, "df1.csv")
    C.eval_source = osp.join(C.dataset_path, "df2.csv")
    C.is_test = True
    C.num_train_imgs = 421
    C.num_eval_imgs = 423
    C.num_classes = 2
    C.class_names = [0, 1]  # obstacle / freespace
    C.background = 255
    C.image_height = 480
    C.image_width = 640
    C.norm_mean = np.array([0.5174, 0.4857, 0.5054])
    C.norm_std = np.array([0.2726, 0.2778, 0.2861])
    C.x_mean = TRAV_LIDAR_MEAN
    C.x_std = TRAV_LIDAR_STD
    return C
