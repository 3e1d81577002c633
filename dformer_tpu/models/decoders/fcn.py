"""FCN head — 3x3 conv+BN+ReLU then 1x1 classifier; the FCN-32s fallback
decoder and the auxiliary head (reference models/decoders/fcnhead.py:9-28)."""

from typing import Optional

import jax.numpy as jnp
from flax import linen as fnn

from dformer_tpu.models.nn import Conv, ConvBNReLU


class FCNHead(fnn.Module):
    num_classes: int = 40
    channels: Optional[int] = None  # default in_channels // 4
    kernel_size: int = 3
    bn_eps: float = 1e-3
    bn_momentum: float = 0.1
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x, train: bool = False, **_):
        if isinstance(x, (list, tuple)):
            x = x[-1]
        channels = self.channels or x.shape[-1] // 4
        # plain nn.Conv2d in the reference Sequential -> biased conv even
        # before BN (fcnhead.py:18-22)
        x = ConvBNReLU(channels, self.kernel_size, conv_bias=True,
                       bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                       axis_name=self.bn_axis_name, dtype=self.dtype,
                       name="conv")(x, train)
        x = Conv(self.num_classes, (1, 1), (1, 1), (0, 0), dtype=self.dtype,
                 name="classifier")(x)
        return x
