"""SegFormer-style all-MLP decoder (reference models/decoders/MLPDecoder.py:22-81).

Per-scale linear embed -> bilinear upsample to 1/4 -> concat -> 1x1 conv+BN+ReLU
fuse -> dropout -> 1x1 classifier. NHWC makes the reference's flatten/transpose
dance a plain Linear on the channel axis.
"""

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as fnn

from dformer_tpu.models.nn import Conv, ConvBNReLU, Dropout, Linear
from dformer_tpu.ops.resize import resize_bilinear


class MLPDecoderHead(fnn.Module):
    num_classes: int = 40
    embed_dim: int = 768
    dropout_ratio: float = 0.1
    align_corners: bool = False
    bn_eps: float = 1e-3
    bn_momentum: float = 0.1
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, inputs, train: bool = False, **_):
        c1 = inputs[0]
        size = c1.shape[1:3]
        embedded = []
        # concat order follows the reference: [c4, c3, c2, c1]
        for idx in (3, 2, 1, 0):
            e = Linear(self.embed_dim, dtype=self.dtype,
                       name=f"linear_c{idx + 1}")(inputs[idx])
            if idx != 0:
                e = resize_bilinear(e, size, self.align_corners)
            embedded.append(e)
        x = jnp.concatenate(embedded, axis=-1)
        # plain nn.Conv2d in the reference fuse -> biased conv before BN
        # (MLPDecoder.py:51-55)
        x = ConvBNReLU(self.embed_dim, 1, conv_bias=True, bn_eps=self.bn_eps,
                       bn_momentum=self.bn_momentum,
                       axis_name=self.bn_axis_name, dtype=self.dtype,
                       name="linear_fuse")(x, train)
        x = Dropout(self.dropout_ratio, name="dropout")(x, deterministic=not train)
        x = Conv(self.num_classes, (1, 1), (1, 1), (0, 0), dtype=self.dtype,
                 name="linear_pred")(x)
        return x
