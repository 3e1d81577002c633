"""Pallas TPU kernel: fused DFormer MLP block.

Computes, in ONE pass over the feature map (reference semantics,
models/encoders/DFormer.py:48-67):

    y   = LayerNorm(x)                      # fp32 stats
    h   = y @ fc1_w + fc1_b                 # [., C] -> [., Ch]
    h   = dwconv3x3(h, pos_w) + pos_b + h   # depthwise positional branch
    h   = gelu(h)                           # exact erf
    out = h @ fc2_w + fc2_b                 # [., Ch] -> [., C]

Why a kernel: stages 0/1 run at high resolution with mlp_ratio 8, so the
hidden activation is 8x the input (e.g. [8,120,160,768] bf16 = 236 MB for
DFormer-L stage 0). XLA materializes it to HBM between the matmuls and the
conv; profiling shows the encoder is memory-bound there (SURVEY.md hot-loop
analysis; measured 35ms of 53ms in stages 0/1). This kernel keeps the hidden
tile in VMEM: HBM traffic drops to x-in + out-out.

Tiling: grid (B, H/Th). The input is pre-padded by 1 pixel in H and W (the
dwconv halo), kept in ANY/HBM memory space, and each program DMAs its
(Th+2, W+2, C) tile into VMEM scratch. The dwconv is 9 shifted
multiply-adds on the VMEM-resident hidden tile (VPU), the two matmuls hit
the MXU with fp32 accumulation.

Training: jax.custom_vjp with the backward pass expressed in plain jnp
(XLA) — forward speed is what matters for inference/serving; the backward
recompute keeps gradients exact vs the reference math.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_row_tile(h: int, w: int, c: int, ch: int, itemsize: int,
                   budget_bytes: int = 13 * 2 ** 20):
    """Largest Th dividing h whose TOTAL scoped-VMEM footprint fits.

    Scoped VMEM (16MB) must hold the declared scratch (x halo tile in the
    input dtype + fp32 hidden tile) AND Mosaic's stack temporaries for the
    9-tap conv accumulation / gelu. Calibration from compiler scoped-vmem
    reports (bf16 inputs): total 18.27M at hidden 5.94M + x 3.05M, i.e.
    stack ~1.6x the hidden tile; model it at 2.0x with a 3MB headroom.
    (fp32 inputs have much larger stacks — the caller only uses this
    kernel for bf16.) Budgeting only the hidden tile overflowed at MSF
    eval scales >1."""
    wp = -(-(w + 2) // 8) * 8
    cp = -(-c // 128) * 128
    best = 1
    for th in range(1, h + 1):
        if h % th:
            continue
        x_tile = 2 * (th + 2) * wp * cp * itemsize  # double-buffered input
        h_tile = (th + 2) * wp * ch * 4
        stack = int(2.0 * h_tile)
        if x_tile + h_tile + stack <= budget_bytes:
            best = th
    return best


# Polynomial erf: Mosaic has no erf lowering, and the exp-based
# Abramowitz-Stegun form used in round 1 is ~2x the VPU ops (divide + exp)
# — this kernel is VPU-bound. GELU-scoped clamped degree-6 fit shared with
# the XLA bf16 path; cutting the round-2 degree-9/[0,3.2] fit to degree 6
# removed 3 Horner FMAs per hidden element: measured 1.792 -> 1.576 ms/call
# at the DFormer-L stage-0 shape (ablation: gelu was 0.61 ms of the 1.79 —
# conv 0.78, matmuls+DMA 0.70).
from dformer_tpu.ops.activations import poly_erf as _erf  # noqa: E402


def _kernel(x_hbm, ln_w, ln_b, fc1_w, fc1_b, pos_w, pos_b, fc2_w, fc2_b,
            out_ref, x_tile, h_tile, sem, *, Th: int, W: int, WP: int,
            C: int, CP: int, Ch: int, eps: float):
    b = pl.program_id(0)
    i = pl.program_id(1)
    ni_total = pl.num_programs(1)

    # Double-buffered halo-tile DMA: grid iterations run sequentially on
    # the core, so each program prefetches the NEXT program's (Th+2, WP, CP)
    # tile while computing on its own — the serial start();wait() version
    # stalled every iteration on HBM latency. WP is W+2 rounded to the
    # 8-sublane DMA granularity and CP is C rounded to the 128-lane
    # granularity (Mosaic requires slice DMAs aligned to tiling); the
    # padding columns/channels are zeros and masked/sliced out below.
    lin = b * ni_total + i
    slot = jax.lax.rem(lin, 2)
    nslot = jax.lax.rem(lin + 1, 2)

    def tile_dma(slot_, b_, i_):
        return pltpu.make_async_copy(
            x_hbm.at[b_, pl.ds(i_ * Th, Th + 2)], x_tile.at[slot_],
            sem.at[slot_])

    @pl.when(lin == 0)
    def _():
        tile_dma(slot, b, i).start()

    @pl.when(lin + 1 < pl.num_programs(0) * ni_total)
    def _():
        nxt_b = jnp.where(i + 1 < ni_total, b, b + 1)
        nxt_i = jnp.where(i + 1 < ni_total, i + 1, 0)
        tile_dma(nslot, nxt_b, nxt_i).start()

    tile_dma(slot, b, i).wait()

    rows = (Th + 2) * WP
    xf = x_tile[slot, :, :, :C].reshape(rows, C).astype(jnp.float32)

    # LayerNorm (fp32, matching models/nn.py LayerNorm)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_w[:].astype(jnp.float32) + ln_b[:].astype(jnp.float32)

    # fc1 on the MXU, fp32 accumulate
    h = jnp.dot(y.astype(fc1_w.dtype), fc1_w[:],
                preferred_element_type=jnp.float32)
    h = h + fc1_b[:].astype(jnp.float32)
    h = h.reshape(Th + 2, WP, Ch)
    # The conv must see ZERO outside the true image (torch zero-padding);
    # tile-local halo pixels that fall outside [0,H)x[0,W) were computed
    # from the x zero-pad (fc1(LN(0)) != 0) — mask them out. Interior-tile
    # halos are real neighbor rows and stay.
    gr = i * Th + jax.lax.broadcasted_iota(
        jnp.int32, (Th + 2, WP, 1), 0) - 1
    gc = jax.lax.broadcasted_iota(jnp.int32, (Th + 2, WP, 1), 1) - 1
    num_rows = pl.num_programs(1) * Th
    # fp32 mask multiply: Mosaic only lowers minor-dim inserts for 32-bit
    # types, so avoid expanding a bool mask
    valid = ((gr >= 0) & (gr < num_rows) & (gc >= 0) & (gc < W))
    h_tile[:] = h * valid.astype(jnp.float32)

    # depthwise 3x3 over the VMEM tile: one sublane shift per column offset
    # (cheap row slices from each), then +bias +residual on the center
    hc = h_tile[1:Th + 1, 1:W + 1, :]
    acc = None
    for dc in (0, 1, 2):
        col = h_tile[:, dc:dc + W, :]
        for dr in (0, 1, 2):
            term = col[dr:dr + Th] * pos_w[dr, dc, :]
            acc = term if acc is None else acc + term
    acc = acc + pos_b[:].astype(jnp.float32) + hc

    # erf-GELU via the in-kernel erf approximation, then fc2 on the MXU
    g = 0.5 * acc * (1.0 + _erf(acc * np.float32(0.7071067811865476)))
    out = jnp.dot(g.reshape(Th * W, Ch).astype(fc2_w.dtype), fc2_w[:],
                  preferred_element_type=jnp.float32)
    out = out + fc2_b[:].astype(jnp.float32)
    out_ref[0] = out.reshape(Th, W, C).astype(out_ref.dtype)


def _forward_pallas(x, ln_w, ln_b, fc1_w, fc1_b, pos_w, pos_b, fc2_w, fc2_b,
                    eps: float, interpret: bool):
    B, H, W, C = x.shape
    Ch = fc1_w.shape[1]
    Th = _pick_row_tile(H, W, C, Ch, x.dtype.itemsize)
    WP = -(-(W + 2) // 8) * 8       # DMA sublane granularity
    CP = -(-C // 128) * 128         # DMA lane granularity
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, WP - W - 1), (0, CP - C)))

    kern = functools.partial(_kernel, Th=Th, W=W, WP=WP, C=C, CP=CP, Ch=Ch,
                             eps=eps)
    flops = 2 * B * H * W * C * Ch * 2 + B * H * W * Ch * 9 * 2
    return pl.pallas_call(
        kern,
        grid=(B, H // Th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fc1_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fc1_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pos_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pos_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fc2_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fc2_b
        ],
        out_specs=pl.BlockSpec((1, Th, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, Th + 2, WP, CP), x.dtype),  # double-buffered
            pltpu.VMEM((Th + 2, WP, Ch), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=B * H * W * Ch),
        interpret=interpret,
    )(xp, ln_w, ln_b, fc1_w, fc1_b, pos_w, pos_b, fc2_w, fc2_b)


def fused_mlp_reference(x, ln_w, ln_b, fc1_w, fc1_b, pos_w, pos_b, fc2_w,
                        fc2_b, eps: float = 1e-6):
    """Plain-XLA reference of the same math (used for the backward pass and
    as the numerical oracle in tests)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_w + ln_b
    h = jnp.dot(y.astype(x.dtype), fc1_w,
                preferred_element_type=jnp.float32) + fc1_b
    conv = jax.lax.conv_general_dilated(
        h.astype(x.dtype), pos_w[:, :, None, :].astype(x.dtype),
        (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=h.shape[-1])
    h = conv.astype(jnp.float32) + pos_b + h
    g = jax.nn.gelu(h, approximate=False)
    out = jnp.dot(g.astype(x.dtype), fc2_w,
                  preferred_element_type=jnp.float32) + fc2_b
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_mlp(x, ln_w, ln_b, fc1_w, fc1_b, pos_w, pos_b, fc2_w, fc2_b,
              eps: float = 1e-6, interpret: bool = False):
    """Fused MLP block. pos_w is the depthwise kernel as [3, 3, Ch]."""
    return _forward_pallas(x, ln_w, ln_b, fc1_w, fc1_b, pos_w, pos_b,
                           fc2_w, fc2_b, eps, interpret)


def _fwd(x, ln_w, ln_b, fc1_w, fc1_b, pos_w, pos_b, fc2_w, fc2_b, eps,
         interpret):
    out = _forward_pallas(x, ln_w, ln_b, fc1_w, fc1_b, pos_w, pos_b, fc2_w,
                          fc2_b, eps, interpret)
    return out, (x, ln_w, ln_b, fc1_w, fc1_b, pos_w, pos_b, fc2_w, fc2_b)


def _bwd(eps, interpret, res, g):
    """Hand-written backward in the kernel's compute dtype.

    Round 2 differentiated fused_mlp_reference with jax.vjp; XLA's backward
    materialized the ratio-8 hidden FOUR ways per stage-0 block ((bf16,f32)
    recompute pairs, a u8 predicate stash, and f32 operands feeding the
    dW matmuls) — 12.5 ms/block on the DFormer-L train profile. This
    version keeps every hidden-sized tensor in x.dtype (bf16 in training),
    accumulates all matmuls in fp32 on the MXU, and takes the depthwise
    grads through conv-grad HLOs. Same math: with fp32 inputs it reduces to
    the exact reference VJP (tests/test_kernels.py grad parity)."""
    x, ln_w, ln_b, fc1_w, fc1_b, pos_w, pos_b, fc2_w, fc2_b = res
    cd = x.dtype
    f32 = jnp.float32
    C = x.shape[-1]
    Ch = fc1_w.shape[1]

    # --- recompute the forward, hidden tensors held in cd ---
    xf = x.astype(f32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y0 = (xf - mean) * rstd
    y = (y0 * ln_w + ln_b).astype(cd)
    h1 = (jnp.dot(y, fc1_w, preferred_element_type=f32) + fc1_b).astype(cd)

    def conv_fn(h, w):
        return jax.lax.conv_general_dilated(
            h, w[:, :, None, :], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=Ch)

    conv, conv_vjp = jax.vjp(conv_fn, h1, pos_w)
    hc = conv + pos_b.astype(cd) + h1

    # gelu(hc) and gelu'(hc); the f32 elementwise chain fuses into its
    # consumers, only the cd casts are materialized
    hcf = hc.astype(f32)
    inner = 0.5 * (1.0 + jax.lax.erf(hcf * np.float32(0.7071067811865476)))
    gact = (hcf * inner).astype(cd)
    pdf = jnp.exp(-0.5 * hcf * hcf) * np.float32(0.3989422804014327)
    gp = inner + hcf * pdf

    gout = g.astype(cd)
    go2d = gout.reshape(-1, C)
    dfc2_w = jnp.dot(gact.reshape(-1, Ch).T, go2d,
                     preferred_element_type=f32).astype(fc2_w.dtype)
    dfc2_b = jnp.sum(go2d.astype(f32), 0).astype(fc2_b.dtype)
    dg = jnp.dot(gout, fc2_w.T, preferred_element_type=f32)
    dhc = (dg * gp).astype(cd)

    dconv_h1, dpos_w = conv_vjp(dhc)
    dpos_b = jnp.sum(dhc.astype(f32), (0, 1, 2)).astype(pos_b.dtype)
    dh1 = dhc + dconv_h1  # +residual branch (pos(x)+x)
    dh1_2d = dh1.reshape(-1, Ch)
    dfc1_w = jnp.dot(y.reshape(-1, C).T, dh1_2d,
                     preferred_element_type=f32).astype(fc1_w.dtype)
    dfc1_b = jnp.sum(dh1_2d.astype(f32), 0).astype(fc1_b.dtype)

    # LayerNorm backward (fp32 — C-sized tensors are cheap)
    dy = jnp.dot(dh1, fc1_w.T, preferred_element_type=f32)
    dln_w = jnp.sum(dy * y0, (0, 1, 2)).astype(ln_w.dtype)
    dln_b = jnp.sum(dy, (0, 1, 2)).astype(ln_b.dtype)
    dyn = dy * ln_w
    dx = (rstd * (dyn - jnp.mean(dyn, -1, keepdims=True)
                  - y0 * jnp.mean(dyn * y0, -1, keepdims=True))).astype(x.dtype)
    return (dx, dln_w, dln_b, dfc1_w, dfc1_b, dpos_w.astype(pos_w.dtype),
            dpos_b, dfc2_w, dfc2_b)


fused_mlp.defvjp(_fwd, _bwd)
