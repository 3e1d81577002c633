"""Trav traversability fine-tune config (reference
local_configs/Trav/DFormer_Base.py:4-60): DFormerTrav-Base backbone with the
Attention1Dto2D lidar expansion, binary segmentation, FSS fields."""

import os.path as osp

from local_configs._base_.datasets.Trav import dataset_config
from local_configs._base_.model_section import apply_model_section

C = apply_model_section(
    dataset_config(), backbone="DFormerTrav-Base",
    pretrained_name="DFormerTrav_Base_epoch-1_miou_61.19.pt", lr=6e-5,
    batch_size=2, nepochs=100, drop_path_rate=0.1,
    checkpoint_start_epoch=250)

C.use_wandb = False
C.num_classes = 2
C.shots = 5
C.epochs = 100
C.episodes_per_epoch = 100
C.num_workers = 8
C.warm_up_epoch = 5
C.temperature = 1
C.alpha = 0.5
C.eval_iterations = 1000
C.checkpoint_step = 10
C.save_dir = "output/unlabeled_masks"
C.log_dir_base = osp.abspath(osp.join("checkpoints", "trained", "trav", C.backbone))

config = C
