from dformer_tpu.data.augment import device_train_augment, normalize_batch
from dformer_tpu.data.datasets import RGBXDataset, SyntheticRGBXDataset
from dformer_tpu.data.loader import Loader, train_batches, val_batches
