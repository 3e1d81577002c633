from local_configs._base_.datasets.SUNRGBD import dataset_config
from local_configs._base_.model_section import apply_model_section

C = apply_model_section(
    dataset_config(), backbone="DFormer-Base",
    pretrained_name="DFormer_Base.pth.tar", lr=8e-5, batch_size=16,
    nepochs=300, drop_path_rate=0.1, checkpoint_start_epoch=200)
config = C
