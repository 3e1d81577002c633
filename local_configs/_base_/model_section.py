"""Shared model/train/eval config section applied by every leaf config
(mirrors the per-model blocks of e.g. reference
local_configs/NYUDepthv2/DFormer_Large.py:4-38)."""

import os.path as osp


def apply_model_section(
    C,
    backbone: str,
    pretrained_name: str,
    lr: float,
    batch_size: int,
    nepochs: int,
    drop_path_rate: float,
    checkpoint_start_epoch: int,
    eval_scale_array=(1,),
    decoder: str = "ham",
    decoder_embed_dim: int = 512,
):
    C.backbone = backbone
    C.pretrained_model = osp.join("checkpoints", "pretrained", pretrained_name)
    C.decoder = decoder
    C.decoder_embed_dim = decoder_embed_dim
    C.optimizer = "AdamW"

    C.lr = lr
    C.lr_power = 0.9
    C.momentum = 0.9
    C.weight_decay = 0.01
    C.batch_size = batch_size
    C.nepochs = nepochs
    C.niters_per_epoch = C.num_train_imgs // C.batch_size + 1
    C.num_workers = 16
    C.train_scale_array = [0.5, 0.75, 1, 1.25, 1.5, 1.75]
    C.warm_up_epoch = 10

    C.fix_bias = True
    C.bn_eps = 1e-3
    C.bn_momentum = 0.1
    C.drop_path_rate = drop_path_rate
    C.aux_rate = 0.0

    C.eval_iter = 25
    C.eval_stride_rate = 2 / 3
    C.eval_scale_array = list(eval_scale_array)
    C.eval_flip = True
    C.eval_crop_size = [C.image_height, C.image_width]

    C.checkpoint_start_epoch = checkpoint_start_epoch
    C.checkpoint_step = 25

    # Pure path config: run dirs are materialized lazily by
    # dformer_tpu.config.finalize_run_dirs, not at import.
    C.log_dir_base = osp.abspath(
        osp.join("checkpoints", f"{C.dataset_name}_{C.backbone}"))
    C.log_dir = C.log_dir_base
    C.tb_dir = osp.join(C.log_dir, "tb")
    C.checkpoint_dir = osp.join(C.log_dir, "checkpoint")
    C.log_dir_link = C.log_dir
    return C
