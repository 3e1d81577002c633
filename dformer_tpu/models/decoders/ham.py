"""LightHamHead — the default decoder (cfg.decoder='ham').

Re-derivation of the reference head (models/decoders/ham_head.py:11-240):
concat stages 2-4 resized to 1/8 -> 1x1 squeeze ConvModule -> Hamburger
(1x1 in -> NMF2D multiplicative updates -> 1x1+BN out, residual relu) ->
1x1 align ConvModule -> dropout + 1x1 classifier.

TPU-native notes:
  * NMF2D's iterative multiplicative updates are a chain of batched matmuls;
    they are unrolled (6 train / 7 eval iterations, static) so XLA fuses the
    elementwise update math into the matmuls. All NMF math runs in fp32 —
    the multiplicative updates are ratio-based and precision-sensitive.
  * The reference draws fresh uniform bases every forward
    (ham_head.py:109-117, torch.rand). Here bases come from a jax PRNG key
    via the 'nmf' rng stream; pass deterministic=True to use a fixed
    seed-0 basis for reproducible evaluation.
  * Data layout is NHWC; the NMF operates on [B, N, D] with N=H*W spatial
    positions and D=channels (equivalent to the reference's spatial mode
    which uses [B, D, N] in NCHW).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

from dformer_tpu.models.nn import Conv, ConvBNReLU, Dropout
from dformer_tpu.ops.resize import resize_bilinear

_P = jax.lax.Precision.HIGHEST


def nmf2d(x, bases, train_steps: int = 6, eval_steps: int = 7,
          train: bool = False, one_step_grad: bool = True,
          precision=_P):
    """Non-negative matrix factorization refinement.

    x: [B, N, D] non-negative features; bases: [B, D, R] initial bases.
    Returns the rank-R reconstruction [B, N, D].

    Matches _MatrixDecomposition2DBase.local_inference + compute_coef
    (ham_head.py:46-57,120-145) with inv_t=1: an initial softmax coef, then
    `steps` multiplicative updates of (coef, bases), then one final coef
    update, and reconstruction bases @ coef^T.

    Training gradient: by default the iterated updates run under
    stop_gradient and only the final coef update + reconstruction are
    differentiated — HamNet's one-step gradient. (The fork comments out
    upstream's @torch.no_grad on local_inference, ham_head.py:45, i.e. it
    backprops through all six unrolled ratio updates; that path is
    numerically explosive — tiny denominators square in the VJP — and
    produces NaNs from random init, so it is opt-in via
    one_step_grad=False.)

    precision: HIGHEST (default) for fp32 parity eval; the bf16 model path
    passes DEFAULT — one MXU pass instead of the 6-pass fp32 emulation —
    matching the reference's own fp16-autocast eval conditions
    (train.sh --val_amp). Ratios/eps stay fp32 either way.
    """
    x = x.astype(jnp.float32)
    bases = bases.astype(jnp.float32)
    eps = 1e-6

    def update_coef(x_, bases_, coef):
        numer = jnp.einsum("bnd,bdr->bnr", x_, bases_, precision=precision)
        denom = jnp.einsum("bnr,brs->bns", coef,
                           jnp.einsum("bdr,bds->brs", bases_, bases_,
                                      precision=precision),
                           precision=precision)
        return coef * numer / (denom + eps)

    x_iter = jax.lax.stop_gradient(x) if (train and one_step_grad) else x
    coef = jax.nn.softmax(jnp.einsum("bnd,bdr->bnr", x_iter, bases,
                                     precision=precision), axis=-1)
    steps = train_steps if train else eval_steps
    for _ in range(steps):
        coef = update_coef(x_iter, bases, coef)
        numer = jnp.einsum("bnd,bnr->bdr", x_iter, coef, precision=precision)
        denom = jnp.einsum("bdr,brs->bds", bases,
                           jnp.einsum("bnr,bns->brs", coef, coef,
                                      precision=precision),
                           precision=precision)
        bases = bases * numer / (denom + eps)
    coef = update_coef(x, bases, coef)
    return jnp.einsum("bdr,bnr->bnd", bases, coef, precision=precision)


def _uniform_bases(key, b, d, r):
    """Fresh uniform NMF bases, L2-normalized over the channel dim
    (reference NMF2D._build_bases, ham_head.py:109-117). Module-level so
    parity tests can inject the exact basis the torch oracle uses."""
    bases = jax.random.uniform(key, (b, d, r), jnp.float32)
    return bases / jnp.linalg.norm(bases, axis=1, keepdims=True)


class Hamburger(fnn.Module):
    """ham_in (1x1, no norm/act) -> relu -> NMF2D -> ham_out (1x1+BN) ->
    relu(x + out) (reference ham_head.py:148-180)."""

    ham_channels: int = 512
    md_r: int = 64
    bn_eps: float = 1e-3
    bn_momentum: float = 0.1
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # False = backprop through all unrolled NMF updates, matching the fork's
    # commented-out @torch.no_grad (ham_head.py:45); True = HamNet one-step
    # gradient (see nmf2d docstring for why that is the safer default)
    one_step_grad: bool = True

    @fnn.compact
    def __call__(self, x, train: bool = False, deterministic_bases: bool = True):
        B, H, W, D = x.shape
        enjoy = Conv(self.ham_channels, (1, 1), (1, 1), (0, 0),
                     dtype=self.dtype, name="ham_in")(x)
        enjoy = jax.nn.relu(enjoy)

        if deterministic_bases:
            key = jax.random.PRNGKey(0)
        else:
            key = self.make_rng("nmf")
        bases = _uniform_bases(key, B, self.ham_channels, self.md_r)

        flat = enjoy.reshape(B, H * W, self.ham_channels)
        # bf16 model -> one-pass MXU matmuls (DEFAULT); fp32 parity eval
        # keeps the 6-pass HIGHEST emulation
        prec = _P if self.dtype in (None, jnp.float32) else \
            jax.lax.Precision.DEFAULT
        flat = nmf2d(flat, bases, train=train,
                     one_step_grad=self.one_step_grad, precision=prec)
        enjoy = flat.reshape(B, H, W, self.ham_channels).astype(x.dtype)

        enjoy = ConvBNReLU(self.ham_channels, 1, with_bn=True, with_relu=False,
                           bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                           axis_name=self.bn_axis_name, dtype=self.dtype,
                           name="ham_out")(enjoy, train)
        return jax.nn.relu(x + enjoy)


class LightHamHead(fnn.Module):
    """HamNet light head over backbone stages 2-4 (reference
    ham_head.py:184-240; wiring from models/builder.py:131-137)."""

    in_index: Sequence[int] = (1, 2, 3)
    channels: int = 512          # decoder_embed_dim
    ham_channels: int = 512
    num_classes: int = 40
    dropout_ratio: float = 0.1
    align_corners: bool = False
    bn_eps: float = 1e-3
    bn_momentum: float = 0.1
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    one_step_grad: bool = True  # see Hamburger/nmf2d

    @fnn.compact
    def __call__(self, inputs, train: bool = False,
                 deterministic_bases: bool = True):
        feats = [inputs[i] for i in self.in_index]
        size = feats[0].shape[1:3]
        feats = [resize_bilinear(f, size, self.align_corners) for f in feats]
        x = jnp.concatenate(feats, axis=-1)
        x = ConvBNReLU(self.ham_channels, 1, bn_eps=self.bn_eps,
                       bn_momentum=self.bn_momentum,
                       axis_name=self.bn_axis_name, dtype=self.dtype,
                       name="squeeze")(x, train)
        x = Hamburger(self.ham_channels, bn_eps=self.bn_eps,
                      bn_momentum=self.bn_momentum,
                      bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                      one_step_grad=self.one_step_grad,
                      name="hamburger")(x, train, deterministic_bases)
        x = ConvBNReLU(self.channels, 1, bn_eps=self.bn_eps,
                       bn_momentum=self.bn_momentum,
                       axis_name=self.bn_axis_name, dtype=self.dtype,
                       name="align")(x, train)
        x = Dropout(self.dropout_ratio, name="dropout")(x, deterministic=not train)
        x = Conv(self.num_classes, (1, 1), (1, 1), (0, 0), dtype=self.dtype,
                 name="conv_seg")(x)
        return x
