"""Non-local head: squeeze concat of stages 2-4 -> embedded-gaussian
NonLocal2d block -> align -> classifier (reference
models/decoders/nl_head.py:368-428; NonLocal2d per mmcv, embedded_gaussian
mode with scale)."""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

from dformer_tpu.models.nn import Conv, ConvBNReLU, Dropout
from dformer_tpu.ops.resize import resize_bilinear


class NonLocal2d(fnn.Module):
    """Embedded-gaussian non-local block with residual (mmcv NonLocal2d)."""

    reduction: int = 2
    bn_eps: float = 1e-3
    bn_momentum: float = 0.1
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        inter = max(C // self.reduction, 1)
        g = Conv(inter, (1, 1), (1, 1), (0, 0), dtype=self.dtype, name="g")(x)
        theta = Conv(inter, (1, 1), (1, 1), (0, 0), dtype=self.dtype,
                     name="theta")(x)
        phi = Conv(inter, (1, 1), (1, 1), (0, 0), dtype=self.dtype,
                   name="phi")(x)
        tq = theta.reshape(B, H * W, inter).astype(jnp.float32)
        pk = phi.reshape(B, H * W, inter).astype(jnp.float32)
        logits = jnp.einsum("bqc,bkc->bqk", tq, pk) / jnp.sqrt(float(inter))
        attn = jax.nn.softmax(logits, axis=-1)
        y = jnp.einsum("bqk,bkc->bqc", attn.astype(g.dtype),
                       g.reshape(B, H * W, inter))
        y = y.reshape(B, H, W, inter)
        y = ConvBNReLU(C, 1, with_relu=False, bn_eps=self.bn_eps,
                       bn_momentum=self.bn_momentum,
                       axis_name=self.bn_axis_name, dtype=self.dtype,
                       name="conv_out")(y, train)
        return x + y


class NLHead(fnn.Module):
    in_index: Sequence[int] = (1, 2, 3)
    channels: int = 512
    num_classes: int = 40
    dropout_ratio: float = 0.1
    align_corners: bool = False
    bn_eps: float = 1e-3
    bn_momentum: float = 0.1
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, inputs, train: bool = False, **_):
        feats = [inputs[i] for i in self.in_index]
        size = feats[0].shape[1:3]
        feats = [resize_bilinear(f, size, self.align_corners) for f in feats]
        x = jnp.concatenate(feats, axis=-1)
        x = ConvBNReLU(self.channels, 1, bn_eps=self.bn_eps,
                       bn_momentum=self.bn_momentum,
                       axis_name=self.bn_axis_name, dtype=self.dtype,
                       name="squeeze")(x, train)
        x = NonLocal2d(bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                       bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                       name="nl_block")(x, train)
        x = ConvBNReLU(self.channels, 1, bn_eps=self.bn_eps,
                       bn_momentum=self.bn_momentum,
                       axis_name=self.bn_axis_name, dtype=self.dtype,
                       name="align")(x, train)
        x = Dropout(self.dropout_ratio, name="dropout")(x, deterministic=not train)
        x = Conv(self.num_classes, (1, 1), (1, 1), (0, 0), dtype=self.dtype,
                 name="conv_seg")(x)
        return x
