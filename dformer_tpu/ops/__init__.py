from dformer_tpu.ops.resize import resize_bilinear, resize_nearest
from dformer_tpu.ops.pool import adaptive_avg_pool2d
from dformer_tpu.ops.loss import softmax_cross_entropy_masked_mean
from dformer_tpu.ops.metrics import confusion_matrix, iou_from_hist, f1_from_hist, pixel_acc_from_hist
from dformer_tpu.ops.schedule import warmup_poly_lr, poly_lr
