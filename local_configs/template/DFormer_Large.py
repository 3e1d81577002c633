"""Annotated template for adding a new dataset (reference
local_configs/template/DFormer_Large.py).

Copy this file, point the dataset section at your data, and pick a backbone:
  - backbone: one of DFormer-{Tiny,Small,Base,Large}, DFormerTrav-Base
  - decoder:  'ham' (default) | 'MLPDecoder' | 'UPernet' | 'deeplabv3+' | 'nl'
  - gt_transform: True when label id 0 means 'invalid' (labels shift down 1)
  - x_is_single_channel: True for raw depth / thermal (replicated to 3ch)
"""

import os.path as osp

import numpy as np

from local_configs._base_ import base_config
from local_configs._base_.model_section import apply_model_section


def dataset_config():
    C = base_config()
    C.dataset_name = "MyDataset"               # <- rename
    C.dataset_path = osp.join(C.root_dir, "MyDataset")
    C.rgb_root_folder = osp.join(C.dataset_path, "RGB")
    C.rgb_format = ".jpg"
    C.gt_root_folder = osp.join(C.dataset_path, "Label")
    C.gt_format = ".png"
    C.gt_transform = True
    C.x_root_folder = osp.join(C.dataset_path, "Depth")
    C.x_format = ".png"
    C.x_is_single_channel = True
    C.train_source = osp.join(C.dataset_path, "train.txt")
    C.eval_source = osp.join(C.dataset_path, "test.txt")
    C.is_test = True
    C.num_train_imgs = 795                      # <- your split sizes
    C.num_eval_imgs = 654
    C.num_classes = 40
    C.class_names = [f"class_{i}" for i in range(C.num_classes)]
    C.background = 255
    C.image_height = 480
    C.image_width = 640
    C.norm_mean = np.array([0.485, 0.456, 0.406])
    C.norm_std = np.array([0.229, 0.224, 0.225])
    return C


C = apply_model_section(
    dataset_config(), backbone="DFormer-Large",
    pretrained_name="DFormer_Large.pth.tar", lr=6e-5, batch_size=8,
    nepochs=500, drop_path_rate=0.15, checkpoint_start_epoch=250)
config = C
