"""Trav (traversability) extensions: the 1-D lidar -> 2-D pseudo-depth
expansion and the DFormerTrav backbone (reference
models/encoders/DFormer.py:308-457).

Attention1Dto2D lifts a 360-beam lidar scan to a [B, 480, 640, 1] pseudo-depth
image via two learned-query multi-head attention stages: 360 beams -> 640
columns, then 1 token -> 480 rows per column.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from dformer_tpu.models.encoder import DFormer, VARIANTS
from dformer_tpu.models.nn import Linear


class MultiHeadAttention(fnn.Module):
    """torch nn.MultiheadAttention equivalent (batch_first, packed in-proj)."""

    embed_dim: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, query, key, value):
        E, nh = self.embed_dim, self.num_heads
        hd = E // nh

        def xavier_packed(rng, shape, dtype=jnp.float32):
            # torch packs q,k,v in-proj as one [3E, E] xavier_uniform matrix.
            bound = math.sqrt(6.0 / (shape[0] + shape[1] // 3))
            return jax.random.uniform(rng, shape, dtype, -bound, bound)

        w_in = self.param("in_proj_weight", xavier_packed, (E, 3 * E))
        b_in = self.param("in_proj_bias", fnn.initializers.zeros, (3 * E,))
        q = query @ w_in[:, :E] + b_in[:E]
        k = key @ w_in[:, E:2 * E] + b_in[E:2 * E]
        v = value @ w_in[:, 2 * E:] + b_in[2 * E:]

        B, Lq, _ = q.shape
        Lk = k.shape[1]
        q = q.reshape(B, Lq, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, nh, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bnqd,bnkd->bnqk",
                            (q / math.sqrt(hd)).astype(jnp.float32),
                            k.astype(jnp.float32))
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        return Linear(E, dtype=self.dtype, name="out_proj")(out)


class Attention1Dto2D(fnn.Module):
    """[B, 360] lidar -> [B, 480, 640, 1] pseudo-depth
    (reference DFormer.py:308-339)."""

    input_len: int = 360
    mid_len: int = 640      # width
    output_len: int = 480   # height
    embed_dim: int = 64
    num_heads: int = 4
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, scan):
        B = scan.shape[0]
        x = scan.reshape(B, self.input_len, 1)
        x = Linear(self.embed_dim, dtype=self.dtype, name="input_proj")(x)

        q1 = self.param("query1", fnn.initializers.normal(1.0),
                        (self.mid_len, self.embed_dim))
        q1 = jnp.broadcast_to(q1[None], (B, self.mid_len, self.embed_dim))
        x = MultiHeadAttention(self.embed_dim, self.num_heads,
                               dtype=self.dtype, name="attn1")(q1, x, x)

        x = x.reshape(B * self.mid_len, 1, self.embed_dim)
        q2 = self.param("query2", fnn.initializers.normal(1.0),
                        (self.output_len, self.embed_dim))
        q2 = jnp.broadcast_to(q2[None],
                              (B * self.mid_len, self.output_len, self.embed_dim))
        x = MultiHeadAttention(self.embed_dim, self.num_heads,
                               dtype=self.dtype, name="attn2")(q2, x, x)

        x = Linear(1, dtype=self.dtype, name="output_proj")(x)[..., 0]
        # [B*W, H] -> [B, W, H] -> [B, H, W, 1]
        x = x.reshape(B, self.mid_len, self.output_len)
        return x.transpose(0, 2, 1)[..., None]


class DFormerTrav(fnn.Module):
    """DFormer-Base body fed by the Attention1Dto2D lidar expansion
    (reference DFormer.py:342-457). `x_e` is a raw [B, 360] lidar scan
    (trailing singleton dims are squeezed). expand_hw sets the pseudo-depth
    resolution (the reference hardwires 480x640; here it follows the
    configured image size so it always matches the rgb stream)."""

    drop_path_rate: float = 0.1
    expand_hw: tuple = (480, 640)
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False

    @fnn.compact
    def __call__(self, x, x_e, train: bool = False):
        if x_e.ndim > 2:
            x_e = x_e.reshape(x_e.shape[0], -1)[:, :360]
        pseudo_depth = Attention1Dto2D(
            mid_len=self.expand_hw[1], output_len=self.expand_hw[0],
            dtype=self.dtype, name="attn_expand_e")(x_e)
        body = DFormer(drop_path_rate=self.drop_path_rate,
                       bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                       use_pallas=self.use_pallas,
                       name="body", **VARIANTS["DFormer-Base"])
        return body(x, pseudo_depth, train)
