"""Primitive layers (Flax linen), NHWC end-to-end.

Initialization mirrors torch defaults (kaiming-uniform a=sqrt(5) for Linear /
Conv weights, fan-in uniform bias) so from-scratch training matches the
reference's initial statistics. Norm-layer semantics are torch-exact:

  * LayerNorm: eps inside sqrt, channels_last (reference DFormer.py:21-45).
  * BatchNorm: biased variance for normalization, *unbiased* for the running
    update, torch momentum convention (new = (1-m)*old + m*batch). With
    `axis_name` set, batch moments are pmean-reduced across the data mesh —
    exact SyncBN semantics (replacing nn.SyncBatchNorm, utils/train.py:182).

GELU is the exact erf form everywhere: torch nn.GELU() default; jax.nn.gelu
defaults to tanh-approx which would break checkpoint parity.
"""

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn


def gelu(x):
    # bf16 activations: the clamped-polynomial erf is exact to bf16 rounding
    # and transcendental-free (VPU-bound fusions; see ops/activations.py).
    # fp32 (parity eval / CPU tests) keeps XLA's exact erf.
    if x.dtype == jnp.bfloat16:
        from dformer_tpu.ops.activations import poly_gelu

        return poly_gelu(x)
    return jax.nn.gelu(x, approximate=False)


def _kaiming_uniform_linear(key, shape, dtype=jnp.float32):
    """torch nn.Linear weight default; shape is (in, out) in flax convention."""
    fan_in = shape[0]
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _fanin_uniform_bias(fan_in):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Linear(fnn.Module):
    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", _kaiming_uniform_linear,
                            (in_features, self.features))
        y = jnp.dot(x.astype(self.dtype or x.dtype),
                    kernel.astype(self.dtype or x.dtype))
        if self.use_bias:
            bias = self.param("bias", _fanin_uniform_bias(in_features),
                              (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class Conv(fnn.Module):
    """NHWC conv with torch Conv2d defaults (HWIO kernel, zero 'explicit' pad)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Sequence[int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = (in_features // self.groups) * kh * kw

        def kernel_init(key, shape, dtype=jnp.float32):
            bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", kernel_init,
                            (kh, kw, in_features // self.groups, self.features))
        dt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt), kernel.astype(dt),
            window_strides=tuple(self.strides),
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", _fanin_uniform_bias(fan_in),
                              (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class LayerNorm(fnn.Module):
    """Channels-last LayerNorm over the trailing dim, torch-exact."""

    eps: float = 1e-6

    @fnn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        weight = self.param("weight", fnn.initializers.ones, (dim,))
        bias = self.param("bias", fnn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)


class BatchNorm(fnn.Module):
    """torch-semantics BatchNorm over NHWC axis (0,1,2) with optional SyncBN.

    batch_stats collection holds `mean` / `var` running buffers. In training,
    when `axis_name` is set and the module runs under a mapped axis, moments
    are averaged across replicas before use — matching nn.SyncBatchNorm.
    """

    eps: float = 1e-5
    momentum: float = 0.1
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, use_running_average: bool = True):
        dim = x.shape[-1]
        weight = self.param("weight", fnn.initializers.ones, (dim,))
        bias = self.param("bias", fnn.initializers.zeros, (dim,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((dim,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((dim,), jnp.float32))

        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(xf, axis=(0, 1, 2))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            # Under GSPMD jit with a batch-sharded input, these means are
            # already global (XLA inserts the collective) -> SyncBN for free.
            # axis_name is only needed under shard_map/pmap.
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
            # two-pass variance: E[x^2]-E[x]^2 cancels catastrophically in
            # fp32 for large-mean channels and can go negative -> NaN.
            var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
            if self.axis_name is not None:
                var = jax.lax.pmean(var, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)


class DropPath(fnn.Module):
    """Per-sample stochastic depth (mmcv build_dropout DropPath equivalent)."""

    drop_prob: float = 0.0

    @fnn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.drop_prob == 0.0 or deterministic:
            return x
        keep = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Dropout(fnn.Module):
    rate: float = 0.0

    @fnn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class DenseP(fnn.Module):
    """Linear with setup-declared params (same names/shapes/inits as Linear)
    so callers can read .kernel/.bias without running the module — used by
    the Pallas-fused paths."""

    in_features: int
    features: int

    def setup(self):
        self.kernel = self.param("kernel", _kaiming_uniform_linear,
                                 (self.in_features, self.features))
        self.bias = self.param("bias", _fanin_uniform_bias(self.in_features),
                               (self.features,))

    def __call__(self, x, dtype=None):
        dt = dtype or x.dtype
        return jnp.dot(x.astype(dt), self.kernel.astype(dt)) \
            + self.bias.astype(dt)


class LayerNormP(fnn.Module):
    """LayerNorm with setup-declared params (paths match LayerNorm)."""

    dim: int
    eps: float = 1e-6

    def setup(self):
        self.weight = self.param("weight", fnn.initializers.ones, (self.dim,))
        self.bias = self.param("bias", fnn.initializers.zeros, (self.dim,))

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * self.weight.astype(jnp.float32) + self.bias.astype(jnp.float32)
        return y.astype(x.dtype)


class DWConvP(fnn.Module):
    """Depthwise conv with setup-declared params (paths match Conv with
    groups=features): kernel [kh, kw, 1, features]."""

    features: int
    kernel_size: int = 3

    def setup(self):
        kh = kw = self.kernel_size
        fan_in = kh * kw  # in/groups == 1

        def kernel_init(key, shape, dtype=jnp.float32):
            bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        self.kernel = self.param("kernel", kernel_init,
                                 (kh, kw, 1, self.features))
        self.bias = self.param("bias", _fanin_uniform_bias(fan_in),
                               (self.features,))

    def __call__(self, x, dtype=None):
        dt = dtype or x.dtype
        pad = self.kernel_size // 2
        y = jax.lax.conv_general_dilated(
            x.astype(dt), self.kernel.astype(dt), (1, 1),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.features)
        return y + self.bias.astype(dt)


class ConvBNReLU(fnn.Module):
    """mmcv ConvModule(conv + optional BN + optional ReLU) equivalent, 1x1/3x3.

    conv_bias: None follows the ConvModule bias='auto' rule (bias iff no
    norm). The reference's hand-rolled Sequential heads (FCN, MLPDecoder
    fuse, UPerNet, DeepLab low-level/block) use plain nn.Conv2d which keeps
    its bias even before BN — checkpoint-compatible heads must set
    conv_bias=True there (the bias interacts with converted running stats)."""

    features: int
    kernel_size: int = 1
    with_bn: bool = True
    with_relu: bool = True
    conv_bias: Optional[bool] = None
    bn_eps: float = 1e-3
    bn_momentum: float = 0.1
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel_size // 2
        use_bias = self.conv_bias if self.conv_bias is not None \
            else not self.with_bn
        y = Conv(self.features, (self.kernel_size, self.kernel_size), (1, 1),
                 (pad, pad), use_bias=use_bias, dtype=self.dtype,
                 name="conv")(x)
        if self.with_bn:
            y = BatchNorm(eps=self.bn_eps, momentum=self.bn_momentum,
                          axis_name=self.axis_name, name="bn")(
                y, use_running_average=not train)
        if self.with_relu:
            y = jax.nn.relu(y)
        return y
