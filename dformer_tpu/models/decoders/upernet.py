"""UPerNet head: PPM pyramid pooling on the top stage + FPN top-down fusion
(reference models/decoders/UPernet.py:8-145)."""

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as fnn

from dformer_tpu.models.nn import Conv, ConvBNReLU
from dformer_tpu.ops.pool import adaptive_avg_pool2d
from dformer_tpu.ops.resize import resize_bilinear


class UPerHead(fnn.Module):
    num_classes: int = 40
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    align_corners: bool = False
    bn_eps: float = 1e-3
    bn_momentum: float = 0.1
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def _cbr(self, features, kernel, name):
        # reference UPernet.py uses plain nn.Conv2d (biased) before BN in
        # every Sequential (UPernet.py:29-56,126-133)
        return ConvBNReLU(features, kernel, conv_bias=True,
                          bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                          axis_name=self.bn_axis_name, dtype=self.dtype,
                          name=name)

    @fnn.compact
    def __call__(self, inputs, train: bool = False, **_):
        top = inputs[-1]
        size_top = top.shape[1:3]
        # PSP module
        psp_outs = [top]
        for si, scale in enumerate(self.pool_scales):
            p = adaptive_avg_pool2d(top, (scale, scale))
            p = self._cbr(self.channels, 1, f"ppm_{si}")(p, train)
            psp_outs.append(resize_bilinear(p, size_top, self.align_corners))
        psp = self._cbr(self.channels, 3, "bottleneck")(
            jnp.concatenate(psp_outs, axis=-1), train)

        # FPN laterals (skip the top stage)
        laterals = [
            self._cbr(self.channels, 1, f"lateral_{i}")(inputs[i], train)
            for i in range(len(inputs) - 1)
        ]
        laterals.append(psp)
        for i in range(len(laterals) - 1, 0, -1):
            prev_size = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize_bilinear(
                laterals[i], prev_size, self.align_corners)

        fpn_outs = [
            self._cbr(self.channels, 3, f"fpn_{i}")(laterals[i], train)
            for i in range(len(laterals) - 1)
        ]
        fpn_outs.append(laterals[-1])
        size0 = fpn_outs[0].shape[1:3]
        fpn_outs = [fpn_outs[0]] + [
            resize_bilinear(f, size0, self.align_corners) for f in fpn_outs[1:]
        ]
        x = self._cbr(self.channels, 3, "fpn_bottleneck")(
            jnp.concatenate(fpn_outs, axis=-1), train)
        x = Conv(self.num_classes, (1, 1), (1, 1), (0, 0), dtype=self.dtype,
                 name="conv_seg")(x)
        return x
