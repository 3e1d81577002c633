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


def _max_row_tile(h, w, c, ch, cc, itemsize, budget_bytes):
    """Largest Th (≤8, dividing h) whose backward VMEM footprint fits for a
    Cc-wide hidden-channel chunk of a Ch-wide hidden layer.

    Buffers: h1 tile (Th+4 rows, fp32), dg/dhc tile (Th+2, fp32), y0
    (Th+4, C fp32), rstd, the two DMA-staged input tiles, the weight
    operand chunks (Cc-wide), the fp32 weight-grad accumulator windows
    (FULL Ch-wide: they use constant index maps so their blocks persist
    across every grid step — see _bwd_kernel), and ~6 live row-sized fp32
    temporaries from the unrolled per-row chains (the row chunking is what
    bounds the Mosaic stack — whole-tile elementwise chains tripled the
    footprint).

    Th is capped at 8: the per-row passes are Python-unrolled (Th+2
    iterations), and Mosaic's *stack* grows with the unroll count beyond
    what the buffer model sees — a Th=30 tile at (30,40,144→576) measured
    19.25M of scoped allocation against this model's 11.5M (> the 16M
    limit), while every Th≤8 config tried fits. The cap costs nothing:
    the kernel is bandwidth/VPU-bound per row, and more grid steps over
    the same rows do the same work."""
    wpx = -(-(w + 4) // 8) * 8
    cp = -(-c // 128) * 128
    fixed = (2 * c * cc + 9 * cc) * itemsize          # fc1_w, fc2_w, pos_w
    fixed += (2 * c * ch + 11 * ch + 3 * c) * 4        # f32 acc windows
    fixed += 6 * wpx * cc * 4                          # row temporaries
    best = None
    for th in range(1, min(h, 8) + 1):
        if h % th:
            continue
        total = fixed
        total += (th + 4) * wpx * cc * 4               # h1
        total += (th + 2) * wpx * cc * 4               # dg/dhc
        total += (th + 4) * wpx * (c + 1) * 4          # y0 + rstd
        total += 2 * (th + 4) * wpx * cp * itemsize    # x DMA tile (2 slots)
        total += 2 * (th + 2) * wpx * cp * itemsize    # g DMA tile (2 slots)
        if total <= budget_bytes:
            best = th
    return best


def _pick_bwd_tiling(h: int, w: int, c: int, ch: int, itemsize: int,
                     budget_bytes: int = 12 * 2 ** 20):
    """Pick (Th, Cc): row tile and hidden-channel chunk for the backward.

    The hidden pipeline (fc1 → depthwise 3x3 → gelu → fc2) is separable in
    the hidden channel: chunks are independent through the dwconv/gelu, and
    every gradient — including the LayerNorm dx, whose means are linear in
    dy — is additive over chunks. So when the full-Ch tile only fits at a
    tiny Th (stage-1 main: Ch=1536 forces Th=1, where the 2-row halo
    quintuples the x traffic and the kernel measured 5.75 vs XLA's 3.71 ms),
    halving Cc trades one extra pass over the x/g tiles (bf16, C-sized —
    cheap) for a real row tile over the fp32 Ch-sized buffers (expensive).

    Preference order: full Ch at Th>=4 (the proven config), then the
    largest power-of-two fraction of Ch (lane-aligned: multiple of 128)
    that reaches Th>=4, else the best full-Ch tile (caller gates on Th)."""
    full = _max_row_tile(h, w, c, ch, ch, itemsize, budget_bytes)
    if full is not None and full >= 4:
        return full, ch
    cc = ch // 2
    while cc >= 128 and ch % cc == 0 and cc % 128 == 0:
        th = _max_row_tile(h, w, c, ch, cc, itemsize, budget_bytes)
        if th is not None and th >= 4:
            return th, cc
        cc //= 2
    if full is None:
        return None
    return full, ch


_AS_ERF = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _bwd_kernel(x_hbm, g_hbm, ln_w, ln_b, fc1_w, fc1_b, pos_w, pos_b, fc2_w,
                dx_ref, dlnw_ref, dlnb_ref, dfc1w_ref, dfc1b_ref, dposw_ref,
                dposb_ref, dfc2w_ref, dfc2b_ref,
                x_tile, g_tile, h1_ref, dhc_ref, semx, semg,
                *, Th: int, W: int, WPX: int, C: int, CP: int, Ch: int,
                eps: float):
    """Backward of the fused MLP, one (B, H/Th, Ch/Cc) tile per program.

    Every hidden-sized tensor lives in VMEM: h1 is recomputed from the x
    halo tile (2 rows/cols of halo — dhc needs 1 and the dwconv another),
    dhc is computed in place over dg, and the per-row chains (gelu', the
    9 conv-transpose / weight-grad taps, LayerNorm backward) run row-chunked
    so Mosaic's stack stays bounded.

    The third grid dim walks Cc-wide hidden-channel chunks (see
    _pick_bwd_tiling for why separability makes this exact): the weight
    OPERANDS arrive as BlockSpec chunks (inputs are re-fetched per program,
    safe), but every weight-GRAD output is a FULL-width block with a
    constant index map — all grid steps map to the same block, so its VMEM
    contents are guaranteed to persist (consecutive revisits, the Pallas
    reduction pattern). Each chunk program accumulates into its
    pl.ds(c*Cc, Cc) slice of those windows. A chunk-indexed out block
    (round-3 design) was WRONG with nc>1: block c was revisited
    non-consecutively across (b, i) tiles, where Pallas does not guarantee
    the block survives (it worked at nc=2 only by double-buffer
    coincidence). dx accumulates across chunks in its (b, i) block —
    c is the innermost grid dim, so those revisits ARE consecutive — and
    the chunk-independent dlnw/dlnb/dfc2b contributions are gated to c==0.
    Ch here is the *chunk* width; the full hidden width is nc * Ch."""
    f32 = jnp.float32
    b = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    c_idx = pl.program_id(2)
    nc = pl.num_programs(2)
    first_tile = (b == 0) & (i == 0)

    # Double-buffered, chunk-aware x/g staging. One (b, i) spatial tile is
    # shared by all nc chunk programs: only the c==0 program waits for its
    # slot's DMA (started by the previous tile's LAST chunk program, or by
    # the bootstrap below), c>0 programs reuse the resident tile, and the
    # last chunk prefetches the NEXT tile into the other slot while this
    # tile's compute runs — the serial per-program start();wait() version
    # both stalled on HBM latency every program and re-transferred the same
    # tile once per chunk (same finding as the forward kernel's DMA).
    tile_lin = b * ni + i
    slot = jax.lax.rem(tile_lin, 2)
    nslot = jax.lax.rem(tile_lin + 1, 2)

    def x_dma(s, b_, i_):
        return pltpu.make_async_copy(x_hbm.at[b_, pl.ds(i_ * Th, Th + 4)],
                                     x_tile.at[s], semx.at[s])

    def g_dma(s, b_, i_):
        return pltpu.make_async_copy(g_hbm.at[b_, pl.ds(i_ * Th, Th + 2)],
                                     g_tile.at[s], semg.at[s])

    off = c_idx * Ch  # this chunk's slice of the full-width grad windows

    @pl.when(first_tile & (c_idx == 0))
    def _():
        x_dma(slot, b, i).start()
        g_dma(slot, b, i).start()
        for ref in (dlnw_ref, dlnb_ref, dfc2b_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    @pl.when(first_tile)
    def _():
        # zero THIS chunk's slice of the full-width accumulator windows
        dfc1w_ref[:, pl.ds(off, Ch)] = jnp.zeros((C, Ch), f32)
        dfc1b_ref[0, pl.ds(off, Ch)] = jnp.zeros((Ch,), f32)
        dposw_ref[:, pl.ds(off, Ch)] = jnp.zeros((9, Ch), f32)
        dposb_ref[0, pl.ds(off, Ch)] = jnp.zeros((Ch,), f32)
        dfc2w_ref[pl.ds(off, Ch), :] = jnp.zeros((Ch, C), f32)

    @pl.when((c_idx == nc - 1) & (tile_lin + 1 < pl.num_programs(0) * ni))
    def _():
        nxt_b = jnp.where(i + 1 < ni, b, b + 1)
        nxt_i = jnp.where(i + 1 < ni, i + 1, 0)
        x_dma(nslot, nxt_b, nxt_i).start()
        g_dma(nslot, nxt_b, nxt_i).start()

    @pl.when(c_idx == 0)
    def _():
        x_dma(slot, b, i).wait()

    # --- recompute LayerNorm (fp32, matching the forward kernel); the
    # per-row stats needed again in pass 2 are recomputed there (cheaper
    # than a (Th+4, WPX, C) y0 stash at C-sized cost) ---
    rows = (Th + 4) * WPX
    xf = x_tile[slot, :, :, :C].reshape(rows, C).astype(f32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y0 = (xf - mean) * jax.lax.rsqrt(var + eps)

    lnw = ln_w[:].astype(f32)
    lnb = ln_b[:].astype(f32)
    y = (y0 * lnw + lnb).astype(fc1_w.dtype)

    # --- recompute h1 = fc1(y), zero outside the true image ---
    h = jnp.dot(y, fc1_w[:], preferred_element_type=f32)
    h = (h + fc1_b[0].astype(f32)).reshape(Th + 4, WPX, Ch)
    gr = i * Th + jax.lax.broadcasted_iota(jnp.int32, (Th + 4, WPX, 1), 0) - 2
    gc = jax.lax.broadcasted_iota(jnp.int32, (Th + 4, WPX, 1), 1) - 2
    num_rows = ni * Th
    valid = ((gr >= 0) & (gr < num_rows) & (gc >= 0) & (gc < W))
    h1_ref[...] = h * valid.astype(f32)

    @pl.when(c_idx == 0)
    def _():
        g_dma(slot, b, i).wait()

    # --- dg = g @ fc2_w^T over the whole g tile (zero halo rows/cols of g
    # make the out-of-image dhc exactly zero, as the real computation has
    # no such outputs) ---
    g2 = g_tile[slot, :, :, :C].reshape((Th + 2) * WPX, C)
    dg = jax.lax.dot_general(g2, fc2_w[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dhc_ref[...] = dg.reshape(Th + 2, WPX, Ch)

    posw = pos_w[:].astype(f32)
    posb = pos_b[0].astype(f32)
    c_half = np.float32(0.7071067811865476)
    c_pdf = np.float32(0.3989422804014327)
    We = W + 2

    # --- row pass 1: hc recompute + gelu' -> dhc (in place over dg);
    # center rows also feed dfc2_w and the dwconv weight-grad taps ---
    for r in range(Th + 2):
        acc = None
        for dr in range(3):
            for dc in range(3):
                term = h1_ref[r + dr, dc:dc + We, :] * posw[dr, dc]
                acc = term if acc is None else acc + term
        hc = acc + posb + h1_ref[r + 1, 1:We + 1, :]
        # gelu'(hc): inner + hc*pdf with the A&S-7.1.26 erf — its exp(-s^2)
        # IS the gaussian pdf term (s^2 = hc^2/2), so one exp serves both.
        s = hc * c_half
        e = jnp.exp(-s * s)
        t = 1.0 / (1.0 + np.float32(0.3275911) * jnp.abs(s))
        p = np.float32(_AS_ERF[4])
        for coef in _AS_ERF[3::-1]:
            p = p * t + np.float32(coef)
        erf_abs = 1.0 - p * t * e
        inner = 0.5 * (1.0 + jnp.where(s >= 0, erf_abs, -erf_abs))
        dhc = dhc_ref[r, :We, :] * (inner + hc * (e * c_pdf))
        dhc_ref[r, :We, :] = dhc
        if 1 <= r <= Th:
            gact = (hc * inner).astype(fc2_w.dtype)
            grow = g_tile[slot, r, 1:W + 1, :C]
            dfc2w_ref[pl.ds(off, Ch), :] += jax.lax.dot_general(
                gact[1:W + 1], grow, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            for k in range(3):
                for l in range(3):
                    dposw_ref[k * 3 + l, pl.ds(off, Ch)] += jnp.sum(
                        dhc[1:W + 1] * h1_ref[r + k, 1 + l:1 + l + W, :],
                        axis=0)
            dposb_ref[0, pl.ds(off, Ch)] += jnp.sum(dhc[1:W + 1], axis=0)

    @pl.when(c_idx == 0)
    def _():
        # dfc2_b = sum(g): independent of the hidden chunk — add once
        dfc2b_ref[...] += jnp.sum(
            g_tile[slot, 1:Th + 1, 1:W + 1, :C].astype(f32), axis=(0, 1))

    # --- row pass 2: conv-transpose -> dh1, fc1/LN backward -> dx ---
    for p in range(Th):
        dh1 = dhc_ref[p + 1, 1:W + 1, :]
        for k in range(3):
            for l in range(3):
                dh1 = dh1 + dhc_ref[p + 2 - k, 2 - l:2 - l + W, :] * posw[k, l]
        # per-row LN stats recompute (x_tile is still resident)
        xrow = x_tile[slot, p + 2, 2:W + 2, :C].astype(f32)
        mu = jnp.mean(xrow, axis=-1, keepdims=True)
        va = jnp.mean(jnp.square(xrow - mu), axis=-1, keepdims=True)
        rst = jax.lax.rsqrt(va + eps)
        y0p = (xrow - mu) * rst
        yp = (y0p * lnw + lnb).astype(fc1_w.dtype)
        dh1c = dh1.astype(fc1_w.dtype)
        dfc1w_ref[:, pl.ds(off, Ch)] += jax.lax.dot_general(
            yp, dh1c, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        dfc1b_ref[0, pl.ds(off, Ch)] += jnp.sum(dh1, axis=0)
        dy = jax.lax.dot_general(dh1c, fc1_w[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)
        dlnw_ref[...] += jnp.sum(dy * y0p, axis=0)
        dlnb_ref[...] += jnp.sum(dy, axis=0)
        dyn = dy * lnw
        m1 = jnp.mean(dyn, axis=-1, keepdims=True)
        m2 = jnp.mean(dyn * y0p, axis=-1, keepdims=True)
        dx = rst * (dyn - m1 - y0p * m2)
        # dx is linear in dy, so per-chunk contributions sum exactly; the
        # c>0 read of an already-written block is safe (innermost grid dim
        # revisits the same dx block consecutively)
        prev = jnp.where(c_idx > 0, dx_ref[0, p].astype(f32), 0.0)
        dx_ref[0, p] = (prev + dx).astype(dx_ref.dtype)


def _backward_pallas(x, ln_w, ln_b, fc1_w, fc1_b, pos_w, pos_b, fc2_w, fc2_b,
                     g, eps: float, Th: int, Cc: int, interpret: bool):
    B, H, W, C = x.shape
    Ch = fc1_w.shape[1]
    WPX = -(-(W + 4) // 8) * 8
    CP = -(-C // 128) * 128
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, WPX - W - 2), (0, CP - C)))
    gp = jnp.pad(g.astype(x.dtype),
                 ((0, 0), (1, 1), (1, WPX - W - 1), (0, CP - C)))

    kern = functools.partial(_bwd_kernel, Th=Th, W=W, WPX=WPX, C=C, CP=CP,
                             Ch=Cc, eps=eps)
    f32 = jnp.float32
    acc_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, i, c: (0,) * len(shape), memory_space=pltpu.VMEM)
    flops = 5 * 2 * B * H * W * C * Ch + 27 * 2 * B * H * W * Ch
    outs = pl.pallas_call(
        kern,
        grid=(B, H // Th, Ch // Cc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x (manual DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),   # g (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_b
            pl.BlockSpec((C, Cc), lambda b, i, c: (0, c),
                         memory_space=pltpu.VMEM),  # fc1_w chunk
            pl.BlockSpec((1, Cc), lambda b, i, c: (0, c),
                         memory_space=pltpu.VMEM),  # fc1_b chunk (2-D: 1-D
            # chunked operands trip Mosaic's 1024-element 1-D tiling check)
            pl.BlockSpec((3, 3, Cc), lambda b, i, c: (0, 0, c),
                         memory_space=pltpu.VMEM),  # pos_w chunk
            pl.BlockSpec((1, Cc), lambda b, i, c: (0, c),
                         memory_space=pltpu.VMEM),  # pos_b chunk
            pl.BlockSpec((Cc, C), lambda b, i, c: (c, 0),
                         memory_space=pltpu.VMEM),  # fc2_w chunk
        ],
        out_specs=[
            pl.BlockSpec((1, Th, W, C), lambda b, i, c: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            acc_spec((C,)), acc_spec((C,)),
            # Weight grads: FULL-width constant-map blocks — chunk programs
            # accumulate into pl.ds slices inside the kernel. Chunk-indexed
            # blocks here would be revisited non-consecutively across
            # (b, i), which Pallas does not guarantee to preserve.
            acc_spec((C, Ch)),
            acc_spec((1, Ch)),
            acc_spec((9, Ch)),
            acc_spec((1, Ch)),
            acc_spec((Ch, C)),
            acc_spec((C,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((C,), f32),
            jax.ShapeDtypeStruct((C,), f32),
            jax.ShapeDtypeStruct((C, Ch), f32),
            jax.ShapeDtypeStruct((1, Ch), f32),
            jax.ShapeDtypeStruct((9, Ch), f32),
            jax.ShapeDtypeStruct((1, Ch), f32),
            jax.ShapeDtypeStruct((Ch, C), f32),
            jax.ShapeDtypeStruct((C,), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Th + 4, WPX, CP), x.dtype),  # double-buffered x
            pltpu.VMEM((2, Th + 2, WPX, CP), x.dtype),  # double-buffered g
            pltpu.VMEM((Th + 4, WPX, Cc), f32),
            pltpu.VMEM((Th + 2, WPX, Cc), f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=3 * x.size * x.dtype.itemsize,
            transcendentals=B * H * W * Ch),
        interpret=interpret,
    )(xp, gp, ln_w, ln_b, fc1_w, fc1_b.reshape(1, Ch), pos_w,
      pos_b.reshape(1, Ch), fc2_w)
    (dx, dlnw, dlnb, dfc1w, dfc1b, dposw, dposb, dfc2w, dfc2b) = outs
    return (dx, dlnw.astype(ln_w.dtype), dlnb.astype(ln_b.dtype),
            dfc1w.astype(fc1_w.dtype),
            dfc1b.reshape(Ch).astype(fc1_b.dtype),
            dposw.reshape(3, 3, Ch).astype(pos_w.dtype),
            dposb.reshape(Ch).astype(pos_b.dtype),
            dfc2w.astype(fc2_w.dtype), dfc2b.astype(fc2_b.dtype))


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

    bf16 (the training path) dispatches to the Pallas backward kernel
    (_bwd_kernel) only at shapes where it measured faster than the XLA
    backward (fwd+grad ms/call, bs8 DFormer-L stages, v5e):

        120x160 C96/768   6.36 vs 8.87   pallas   (stage-0 main, Th=8xCc384)
        120x160 C48/384   3.23 vs 4.34   pallas   (stage-0 e,    Th=8)
         60x80  C96/768   1.61 vs 1.75   pallas   (stage-1 e,    Th=6)
         60x80  C192/1536 3.54 vs 3.71   pallas   (Th=6 x Cc=768 chunks;
                                                   5.75 at full-Ch Th=1)
         30x40  C288/1152 0.88 vs 0.60   XLA      (small grid, MXU-bound)
         30x40  C144/576  0.43 vs 0.34   XLA
         15x20  C288/1152 0.32 vs 0.17   XLA

    The pattern: the kernel wins where the hidden tensor's HBM traffic
    dominates (large spatial) AND the row tile is big enough that the
    2-row halo isn't the traffic (Th>=4); at small spatial XLA's one-shot
    batched matmuls win. Shapes whose full-Ch tile only fits at Th<4
    (stage-1 main) run with the hidden channel split into Cc-wide chunks
    instead (see _pick_bwd_tiling). Gate: Th>=4 and H*W>=4800. fp32
    (parity tests) keeps the XLA backward."""
    x = res[0]
    if x.dtype == jnp.bfloat16:
        B, H, W, C = x.shape
        Ch = res[3].shape[1]
        tiling = _pick_bwd_tiling(H, W, C, Ch, x.dtype.itemsize)
        if tiling is not None and tiling[0] >= 4 and H * W >= 4800:
            return _backward_pallas(*res, g, eps, *tiling, interpret)
    return _bwd_xla(eps, res, g)


def _bwd_xla(eps, res, g):
    """XLA fallback backward (exact reference VJP math).

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
