"""DeepLabV3+ head: ASPP (rates 12/24/36 + image pooling) on the top stage,
48-channel low-level branch on stage 1 (reference
models/decoders/deeplabv3plus.py:6-100)."""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

from dformer_tpu.models.nn import BatchNorm, Conv, Dropout
from dformer_tpu.ops.pool import global_avg_pool2d
from dformer_tpu.ops.resize import resize_bilinear


class _ConvBN(fnn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    use_bias: bool = False
    bn_eps: float = 1e-3
    bn_momentum: float = 0.1
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel // 2) * self.dilation
        kernel = (self.kernel, self.kernel)
        y = jax.lax.conv_general_dilated(
            x, self.param_conv(x), (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", fnn.initializers.zeros, (self.features,))
            y = y + bias
        y = BatchNorm(eps=self.bn_eps, momentum=self.bn_momentum,
                      axis_name=self.bn_axis_name, name="bn")(
            y, use_running_average=not train)
        return jax.nn.relu(y)

    def param_conv(self, x):
        import math

        kh = kw = self.kernel
        in_f = x.shape[-1]
        fan_in = in_f * kh * kw

        def init(key, shape, dtype=jnp.float32):
            bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return self.param("kernel", init, (kh, kw, in_f, self.features))


class DeepLabV3Plus(fnn.Module):
    num_classes: int = 40
    aspp_channels: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    bn_eps: float = 1e-3
    bn_momentum: float = 0.1
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def _cbn(self, features, kernel, dilation, name):
        return _ConvBN(features, kernel, dilation, bn_eps=self.bn_eps,
                       bn_momentum=self.bn_momentum,
                       bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                       name=name)

    @fnn.compact
    def __call__(self, inputs, train: bool = False, **_):
        c1, c4 = inputs[0], inputs[3]
        # ASPP on c4
        feats = [self._cbn(self.aspp_channels, 1, 1, "aspp_b0")(c4, train)]
        for bi, rate in enumerate(self.atrous_rates, start=1):
            feats.append(self._cbn(self.aspp_channels, 3, rate,
                                   f"aspp_b{bi}")(c4, train))
        pool = global_avg_pool2d(c4, keepdims=True)
        pool = self._cbn(self.aspp_channels, 1, 1, "aspp_pool")(pool, train)
        pool = jnp.broadcast_to(pool, c4.shape[:3] + (self.aspp_channels,))
        feats.append(pool)
        x = jnp.concatenate(feats, axis=-1)
        x = self._cbn(self.aspp_channels, 1, 1, "aspp_project")(x, train)
        x = Dropout(0.5, name="aspp_dropout")(x, deterministic=not train)

        # low-level branch + fuse: plain (biased) nn.Conv2d in the reference
        # (deeplabv3plus.py:12-21), unlike the bias=False ASPP convs
        low = _ConvBN(48, 3, 1, use_bias=True, bn_eps=self.bn_eps,
                      bn_momentum=self.bn_momentum,
                      bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                      name="low_level")(c1, train)
        x = resize_bilinear(x, low.shape[1:3], align_corners=True)
        x = jnp.concatenate([x, low], axis=-1)
        x = _ConvBN(256, 3, 1, use_bias=True, bn_eps=self.bn_eps,
                    bn_momentum=self.bn_momentum,
                    bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                    name="block_conv")(x, train)
        x = Dropout(0.1, name="block_dropout")(x, deterministic=not train)
        x = Conv(self.num_classes, (1, 1), (1, 1), (0, 0), dtype=self.dtype,
                 name="block_pred")(x)
        return x
