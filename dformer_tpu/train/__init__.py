from dformer_tpu.train.optim import (decay_mask, make_optimizer,
                                     trainable_mask_from_matched)
from dformer_tpu.train.loop import TrainState, make_train_step, Trainer
