"""DFormer dual-branch RGB-D encoder, TPU-native.

Re-derivation of the reference encoder's math (reference:
models/encoders/DFormer.py:48-305) as NHWC Flax modules. Differences from the
reference are purely representational:

  * NHWC everywhere — the reference permutes NCHW<->NHWC at every stage
    boundary (DFormer.py:294-303); here convs run natively in NHWC so the
    permutes vanish.
  * The GAA pooled attention and bilinear upsample are expressed with
    matmul-form pooling/resize (ops/pool.py, ops/resize.py) -> MXU.
  * Compute dtype is configurable (bf16 for training); LayerNorm, BatchNorm,
    softmax and the attention logits stay fp32.

Per-block math (Attention, DFormer.py:102-145):
  x:[B,H,W,C] rgb stream, x_e:[B,H,W,C/2] depth stream, both pre-LayerNormed.
  branch 1 (local enhancement):  q(x) * a(dwconv7x7(gelu(l(x))))
  branch 2 (depth gating):       q_cut(x) * e_back(dwconv7x7(e_fore(x_e)))
  branch 3 (GAA, window!=0):     49 query tokens from a 7x7 adaptive-pool of
      concat[x,x_e]; k,v from full-res gelu(l(x)) via the kv linear; softmax
      cross-attention; result reshaped to 7x7 and bilinearly upsampled to HxW.
  concat(branches) -> proj (rgb out, C) and proj_e (depth out, C/2).
The last block of stage 4 drops the depth stream (drop_depth,
DFormer.py:243), returning the depth-gating tensor unprojected.
"""

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from dformer_tpu.models.nn import (BatchNorm, Conv, DenseP, DropPath,
                                   DWConvP, LayerNorm, LayerNormP, Linear,
                                   gelu)
from dformer_tpu.ops.pool import adaptive_avg_pool2d
from dformer_tpu.ops.resize import resize_bilinear


class MLPBlock(fnn.Module):
    """LN -> fc1 -> depthwise-3x3 positional branch -> GELU -> fc2
    (reference DFormer.py:48-67).

    With use_pallas=True the whole block runs as one Pallas kernel
    (kernels/fused_mlp.py) keeping the ratio-8 hidden activation in VMEM —
    the stock path materializes it to HBM three times. Param tree paths are
    identical either way."""

    dim: int
    mlp_ratio: int = 4
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False

    def setup(self):
        hidden = self.dim * self.mlp_ratio
        self.norm = LayerNormP(self.dim, name="norm")
        self.fc1 = DenseP(self.dim, hidden, name="fc1")
        self.pos = DWConvP(hidden, 3, name="pos")
        self.fc2 = DenseP(hidden, self.dim, name="fc2")

    def __call__(self, x):
        dt = self.dtype or x.dtype
        # The Pallas path is a bf16 HBM-bandwidth optimization; in fp32
        # (parity/--no-amp eval) its larger stack temporaries overflow
        # scoped VMEM and its A&S erf (1.5e-7 abs) is the wrong tool for
        # exact-parity eval — use the XLA path there.
        if (self.use_pallas and dt == jnp.bfloat16
                and not self.is_initializing()):
            from dformer_tpu.kernels.fused_mlp import fused_mlp

            return fused_mlp(
                x.astype(dt), self.norm.weight, self.norm.bias,
                self.fc1.kernel.astype(dt), self.fc1.bias,
                self.pos.kernel[:, :, 0, :].astype(dt), self.pos.bias,
                self.fc2.kernel.astype(dt), self.fc2.bias)
        y = self.norm(x)
        y = self.fc1(y, dtype=dt)
        y = self.pos(y, dtype=dt) + y
        y = gelu(y)
        y = self.fc2(y, dtype=dt)
        return y


class Attention(fnn.Module):
    """DFormer block core: local enhancement + depth gating + GAA
    (reference DFormer.py:70-145).

    Runs as XLA HLO with hand-fused projection matmuls (q/q_cut/l share one
    [C, 2.5C] matmul; proj/proj_e share the concat input). Whole-block
    Pallas fusions of this path were built and benchmarked in round 1 but
    measured at/below XLA's schedule on v5e, so they were removed; only the
    fused MLP kernel (a measured 2x on its op) remains (kernels/fused_mlp)."""

    dim: int
    num_head: int = 8
    window: int = 7
    drop_depth: bool = False
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False

    def setup(self):
        C = self.dim
        self.norm = LayerNormP(C, name="norm")
        self.norm_e = LayerNormP(C // 2, name="norm_e")
        self.q = DenseP(C, C, name="q")
        self.q_cut = DenseP(C, C // 2, name="q_cut")
        self.l = DenseP(C, C, name="l")
        self.conv = DWConvP(C, 7, name="conv")
        self.a = DenseP(C, C, name="a")
        self.e_fore = DenseP(C // 2, C // 2, name="e_fore")
        self.e_conv = DWConvP(C // 2, 7, name="e_conv")
        self.e_back = DenseP(C // 2, C // 2, name="e_back")
        cat = C * 2 if self.window != 0 else C // 2 * 3
        self.proj = DenseP(cat, C, name="proj")
        if not self.drop_depth:
            self.proj_e = DenseP(cat, C // 2, name="proj_e")
        if self.window != 0:
            self.short_cut_linear = DenseP(C // 2 * 3, C // 2,
                                           name="short_cut_linear")
            self.kv = DenseP(C, C, name="kv")

    def __call__(self, x, x_e):
        B, H, W, C = x.shape
        nh = self.num_head
        hd = C // nh // 2
        dt = self.dtype or x.dtype

        x = self.norm(x)
        x_e = self.norm_e(x_e)

        if self.window != 0:
            short_cut = jnp.concatenate([x, x_e], axis=-1)

        # q / q_cut / l all read LN(x): one fused [C, 2.5C] matmul instead
        # of three kernels (per-op latency dominates at the small stage
        # shapes; weight concat is hoisted/fused by XLA)
        qcl_w = jnp.concatenate(
            [self.q.kernel, self.q_cut.kernel, self.l.kernel],
            axis=1).astype(dt)
        qcl_b = jnp.concatenate(
            [self.q.bias, self.q_cut.bias, self.l.bias]).astype(dt)
        qcl = x.astype(dt) @ qcl_w + qcl_b
        q = qcl[..., :C]
        cutted_x = qcl[..., C:C + C // 2]
        t = gelu(qcl[..., C + C // 2:])
        a = self.a(self.conv(t, dtype=dt), dtype=dt)

        if self.window != 0:
            # k/v stay in [B, HW, heads, hd] token-major form — the kv
            # projection's channel layout is (k-heads, v-heads) contiguous,
            # so a channel-group reshape splits them with no [B,HW,...]
            # transpose (XLA materialized those as ~0.7 ms/iter of layout
            # copies at the bench shape); the einsums carry the head dim as
            # a batch dim instead.
            kv = self.kv(t, dtype=dt).reshape(B, H * W, 2 * nh, hd)
            k = kv[:, :, :nh]  # [B, HW, nh, hd]
            v = kv[:, :, nh:]
            pooled = adaptive_avg_pool2d(short_cut, (self.window, self.window))
            m = self.short_cut_linear(pooled, dtype=dt)
            m = m.reshape(B, self.window * self.window, nh, hd)
            # 49 query tokens attend over the full-res keys. Logits in fp32.
            logits = jnp.einsum(
                "bqnd,bknd->bnqk", (m * hd ** -0.5).astype(jnp.float32),
                k.astype(jnp.float32))
            attn = jax.nn.softmax(logits, axis=-1)
            gaa = jnp.einsum("bnqk,bknd->bqnd", attn.astype(v.dtype), v)
            # [B, 49, nh, hd] -> [B, 7, 7, nh*hd]; channel order (head, hd)
            # matches the reference's permute+reshape (DFormer.py:130).
            gaa = gaa.reshape(B, self.window, self.window, C // 2)
            gaa = resize_bilinear(gaa, (H, W), align_corners=False)

        x_e = self.e_back(self.e_conv(self.e_fore(x_e, dtype=dt), dtype=dt),
                          dtype=dt)
        cutted_x = cutted_x * x_e
        x = q * a

        if self.window != 0:
            x = jnp.concatenate([x, gaa, cutted_x], axis=-1)
        else:
            x = jnp.concatenate([x, cutted_x], axis=-1)
        if not self.drop_depth:
            # proj and proj_e share the concat input: one fused matmul
            pw = jnp.concatenate([self.proj.kernel, self.proj_e.kernel],
                                 axis=1).astype(dt)
            pb = jnp.concatenate([self.proj.bias, self.proj_e.bias]).astype(dt)
            out = x.astype(dt) @ pw + pb
            return out[..., :C], out[..., C:]
        x = self.proj(x, dtype=dt)
        return x, x_e


def _layer_scale_init(value):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)
    return init


class Block(fnn.Module):
    """Attention + MLP with LayerScale (1e-6) and per-sample DropPath
    (reference DFormer.py:147-181)."""

    dim: int
    num_head: int
    mlp_ratio: int = 4
    window: int = 7
    drop_prob: float = 0.0
    drop_depth: bool = False
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False

    @fnn.compact
    def __call__(self, x, x_e, deterministic: bool = True):
        ls1 = self.param("layer_scale_1", _layer_scale_init(1e-6), (self.dim,))
        ls2 = self.param("layer_scale_2", _layer_scale_init(1e-6), (self.dim,))
        drop = DropPath(self.drop_prob, name="drop_path")

        res_x, res_e = x, x_e
        x, x_e = Attention(self.dim, self.num_head, self.window,
                           self.drop_depth, dtype=self.dtype,
                           use_pallas=self.use_pallas, name="attn")(x, x_e)
        x = res_x + drop(ls1.astype(x.dtype) * x, deterministic)
        x = x + drop(ls2.astype(x.dtype) *
                     MLPBlock(self.dim, self.mlp_ratio, dtype=self.dtype,
                              use_pallas=self.use_pallas,
                              name="mlp")(x), deterministic)
        if not self.drop_depth:
            ls1e = self.param("layer_scale_1_e", _layer_scale_init(1e-6),
                              (self.dim // 2,))
            ls2e = self.param("layer_scale_2_e", _layer_scale_init(1e-6),
                              (self.dim // 2,))
            x_e = res_e + drop(ls1e.astype(x_e.dtype) * x_e, deterministic)
            x_e = x_e + drop(ls2e.astype(x_e.dtype) *
                             MLPBlock(self.dim // 2, self.mlp_ratio,
                                      dtype=self.dtype,
                                      use_pallas=self.use_pallas,
                                      name="mlp_e2")(x_e),
                             deterministic)
        return x, x_e


class Stem(fnn.Module):
    """Two stride-2 3x3 conv+BN (GELU between), total stride 4
    (reference DFormer.py:194-211)."""

    mid: int
    out: int
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.mid, (3, 3), (2, 2), (1, 1), dtype=self.dtype,
                 name="conv1")(x)
        x = BatchNorm(axis_name=self.bn_axis_name, name="bn1")(
            x, use_running_average=not train)
        x = gelu(x)
        x = Conv(self.out, (3, 3), (2, 2), (1, 1), dtype=self.dtype,
                 name="conv2")(x)
        x = BatchNorm(axis_name=self.bn_axis_name, name="bn2")(
            x, use_running_average=not train)
        return x


class Downsample(fnn.Module):
    """BN then stride-2 3x3 conv (reference DFormer.py:216-228)."""

    out: int
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(axis_name=self.bn_axis_name, name="norm")(
            x, use_running_average=not train)
        x = Conv(self.out, (3, 3), (2, 2), (1, 1), dtype=self.dtype,
                 name="conv")(x)
        return x


class DFormer(fnn.Module):
    """Four-stage dual-branch backbone; returns 4 NHWC RGB feature maps at
    strides 4/8/16/32 (reference DFormer.py:184-305)."""

    depths: Sequence[int] = (2, 2, 8, 2)
    dims: Sequence[int] = (32, 64, 128, 256)
    windows: Sequence[int] = (7, 7, 7, 7)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    num_heads: Sequence[int] = (2, 4, 10, 16)
    last_block: Sequence[int] = (50, 50, 50, 50)
    drop_path_rate: float = 0.1
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False

    @fnn.compact
    def __call__(self, x, x_e, train: bool = False):
        """x: [B,H,W,3] rgb; x_e: [B,H,W,>=1] modality (first channel used,
        matching the fork quirk at DFormer.py:286)."""
        x_e = x_e[..., :1]
        dp_rates = np.linspace(0.0, self.drop_path_rate, sum(self.depths))
        deterministic = not train

        outs = []
        cur = 0
        for i in range(4):
            if i == 0:
                x = Stem(self.dims[0] // 2, self.dims[0],
                         bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                         name="stem")(x, train)
                x_e = Stem(self.dims[0] // 4, self.dims[0] // 2,
                           bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                           name="stem_e")(x_e, train)
            else:
                x = Downsample(self.dims[i], bn_axis_name=self.bn_axis_name,
                               dtype=self.dtype,
                               name=f"downsample_{i}")(x, train)
                x_e = Downsample(self.dims[i] // 2,
                                 bn_axis_name=self.bn_axis_name,
                                 dtype=self.dtype,
                                 name=f"downsample_e_{i}")(x_e, train)
            for j in range(self.depths[i]):
                # window collapses to 0 when block_index > last_block_index
                # (reference DFormer.py:153-154, block_index = depths[i]-j).
                window = self.windows[i]
                if self.depths[i] - j > self.last_block[i]:
                    window = 0
                drop_depth = (i == 3) and (j == self.depths[i] - 1)
                x, x_e = Block(self.dims[i], self.num_heads[i],
                               self.mlp_ratios[i], window,
                               float(dp_rates[cur + j]), drop_depth,
                               dtype=self.dtype, use_pallas=self.use_pallas,
                               name=f"stage_{i}_block_{j}")(x, x_e,
                                                            deterministic)
            outs.append(x)
            cur += self.depths[i]
        return outs


VARIANTS = {
    # name: (dims, depths, num_heads, windows, mlp_ratios)
    # (reference DFormer.py:460-497)
    "DFormer-Tiny": dict(dims=(32, 64, 128, 256), depths=(3, 3, 5, 2),
                         num_heads=(1, 2, 4, 8), windows=(0, 7, 7, 7),
                         mlp_ratios=(8, 8, 4, 4)),
    "DFormer-Small": dict(dims=(64, 128, 256, 512), depths=(2, 2, 4, 2),
                          num_heads=(1, 2, 4, 8), windows=(0, 7, 7, 7),
                          mlp_ratios=(8, 8, 4, 4)),
    "DFormer-Base": dict(dims=(64, 128, 256, 512), depths=(3, 3, 12, 2),
                         num_heads=(1, 2, 4, 8), windows=(0, 7, 7, 7),
                         mlp_ratios=(8, 8, 4, 4)),
    "DFormer-Large": dict(dims=(96, 192, 288, 576), depths=(3, 3, 12, 2),
                          num_heads=(1, 2, 4, 8), windows=(0, 7, 7, 7),
                          mlp_ratios=(8, 8, 4, 4)),
}


def make_encoder(name: str, drop_path_rate: float = 0.1,
                 bn_axis_name: Optional[str] = None,
                 dtype: Optional[jnp.dtype] = None,
                 use_pallas: bool = False) -> DFormer:
    spec = VARIANTS[name]
    return DFormer(drop_path_rate=drop_path_rate, bn_axis_name=bn_axis_name,
                   dtype=dtype, use_pallas=use_pallas, **spec)
