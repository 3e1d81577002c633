"""Pallas TPU kernel: fused DFormer local attention (window==0 path).

One pass computing the whole stage-0 Attention body (reference
models/encoders/DFormer.py:102-145 with window==0):

    xn  = LN(x);  en = LN(x_e)
    q   = xn @ q_w + q_b
    cut = xn @ qcut_w + qcut_b
    t   = gelu(xn @ l_w + l_b)
    a   = dwconv7x7(t) @ a_w + a_b
    eb  = dwconv7x7(en @ efore) @ eback
    out   = concat[q*a, cut*eb] @ proj   (+ bias)
    out_e = concat[q*a, cut*eb] @ proj_e (+ bias)

The stock XLA path materializes ~10 HxW intermediates to HBM per block at
the highest-resolution stage; here everything lives in VMEM per row-tile.
The 7x7 depthwise convs need a halo of 3 rows/cols, provided by padding the
inputs and DMAing overlapping tiles (same scheme as kernels/fused_mlp.py).

Backward: custom_vjp with a plain-jnp recompute (fused_local_attention_reference).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dformer_tpu.kernels.fused_mlp import _erf

_HALO = 3  # 7x7 depthwise conv


def _round8(v):
    return -(-v // 8) * 8


def _round128(v):
    return -(-v // 128) * 128


def _ln(x2d, w, b, eps=1e-6):
    mean = jnp.mean(x2d, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x2d - mean), axis=-1, keepdims=True)
    y = (x2d - mean) * jax.lax.rsqrt(var + eps)
    return y * w.astype(jnp.float32) + b.astype(jnp.float32)


def _dwconv(tile_ref, weight, Th, W, K=7):
    """K*K depthwise conv over a VMEM tile [Th+2*HALO, WP, C] -> [Th, W, C].

    Column slices at offsets 1..K-1 are sublane shifts (W is the sublane
    dim), which Mosaic lowers as relayout passes — do only K of them (one
    per column offset) and take the K row slices (major dim, free) from
    each shifted copy, instead of K*K shifted reads."""
    acc = None
    for dc in range(K):
        col = tile_ref[:, dc:dc + W, :]  # one sublane shift
        for dr in range(K):
            term = col[dr:dr + Th] * weight[dr, dc, :]
            acc = term if acc is None else acc + term
    return acc


def _kernel(x_hbm, e_hbm, ln_w, ln_b, lne_w, lne_b, q_w, q_b, qcut_w, qcut_b,
            l_w, l_b, conv_w, conv_b, a_w, a_b, ef_w, ef_b, econv_w, econv_b,
            eb_w, eb_b, proj_w, proj_b, proje_w, proje_b,
            out_ref, oute_ref, x_tile, e_tile, t_tile, ef_tile, sem1, sem2,
            *, Th, W, WP, C, CP, Ce, CeP, eps):
    b = pl.program_id(0)
    i = pl.program_id(1)
    halo = _HALO
    rows = (Th + 2 * halo) * WP

    cp1 = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * Th, Th + 2 * halo)],
                                x_tile, sem1)
    cp2 = pltpu.make_async_copy(e_hbm.at[b, pl.ds(i * Th, Th + 2 * halo)],
                                e_tile, sem2)
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    # validity mask over the tile (out-of-image halo pixels must contribute
    # ZERO to the convs, like torch zero-padding of the conv *inputs* t/ef)
    gr = i * Th + jax.lax.broadcasted_iota(
        jnp.int32, (Th + 2 * halo, WP, 1), 0) - halo
    gc = jax.lax.broadcasted_iota(jnp.int32, (Th + 2 * halo, WP, 1), 1) - halo
    num_rows = pl.num_programs(1) * Th
    valid = ((gr >= 0) & (gr < num_rows) & (gc >= 0) & (gc < W))
    maskf = valid.astype(jnp.float32)

    # rgb stream: LN -> t = gelu(l(xn)) on the full halo tile
    xn = _ln(x_tile[:, :, :C].reshape(rows, C).astype(jnp.float32),
             ln_w[:], ln_b[:], eps)
    t = jnp.dot(xn.astype(l_w.dtype), l_w[:],
                preferred_element_type=jnp.float32) + l_b[:].astype(jnp.float32)
    t = 0.5 * t * (1.0 + _erf(t * np.float32(0.7071067811865476)))
    t_tile[:] = t.reshape(Th + 2 * halo, WP, C) * maskf

    # depth stream: LN -> e_fore on the full halo tile
    en = _ln(e_tile[:, :, :Ce].reshape(rows, Ce).astype(jnp.float32),
             lne_w[:], lne_b[:], eps)
    ef = jnp.dot(en.astype(ef_w.dtype), ef_w[:],
                 preferred_element_type=jnp.float32) \
        + ef_b[:].astype(jnp.float32)
    ef_tile[:] = ef.reshape(Th + 2 * halo, WP, Ce) * maskf

    # 7x7 depthwise convs on the VMEM tiles (VPU), center region only
    conv_t = _dwconv(t_tile, conv_w[:].astype(jnp.float32), Th, W) \
        + conv_b[:].astype(jnp.float32)
    conv_e = _dwconv(ef_tile, econv_w[:].astype(jnp.float32), Th, W)

    # center-region linears
    cn = xn.reshape(Th + 2 * halo, WP, C)[halo:halo + Th, halo:halo + W, :]
    cn = cn.reshape(Th * W, C)
    q = jnp.dot(cn.astype(q_w.dtype), q_w[:],
                preferred_element_type=jnp.float32) + q_b[:].astype(jnp.float32)
    cut = jnp.dot(cn.astype(qcut_w.dtype), qcut_w[:],
                  preferred_element_type=jnp.float32) \
        + qcut_b[:].astype(jnp.float32)
    a = jnp.dot(conv_t.reshape(Th * W, C).astype(a_w.dtype), a_w[:],
                preferred_element_type=jnp.float32) + a_b[:].astype(jnp.float32)
    eb = jnp.dot(conv_e.reshape(Th * W, Ce).astype(eb_w.dtype), eb_w[:],
                 preferred_element_type=jnp.float32) \
        + eb_b[:].astype(jnp.float32)

    ga = q * a                       # [Th*W, C]
    ce = cut * eb                    # [Th*W, Ce]
    # concat([ga, ce]) @ proj == ga @ proj[:C] + ce @ proj[C:]
    out = jnp.dot(ga.astype(proj_w.dtype), proj_w[:C],
                  preferred_element_type=jnp.float32) \
        + jnp.dot(ce.astype(proj_w.dtype), proj_w[C:],
                  preferred_element_type=jnp.float32) \
        + proj_b[:].astype(jnp.float32)
    oute = jnp.dot(ga.astype(proje_w.dtype), proje_w[:C],
                   preferred_element_type=jnp.float32) \
        + jnp.dot(ce.astype(proje_w.dtype), proje_w[C:],
                  preferred_element_type=jnp.float32) \
        + proje_b[:].astype(jnp.float32)
    out_ref[0] = out.reshape(Th, W, C).astype(out_ref.dtype)
    oute_ref[0] = oute.reshape(Th, W, Ce).astype(oute_ref.dtype)


def _pick_row_tile(h, w, C, Ce, budget_bytes=3 * 2 ** 20):
    # budget counts explicit scratch only; Mosaic stack temporaries
    # (xn/q/cut/a/... tiles) roughly triple it, and scoped vmem is 16M.
    best = 1
    for th in range(1, h + 1):
        if h % th:
            continue
        wp = _round8(w + 2 * _HALO)
        tile_bytes = (th + 2 * _HALO) * wp * (C + Ce) * 4 * 2
        if tile_bytes <= budget_bytes:
            best = th
    return best


def _forward_pallas(x, x_e, params, eps, interpret):
    (ln_w, ln_b, lne_w, lne_b, q_w, q_b, qcut_w, qcut_b, l_w, l_b, conv_w,
     conv_b, a_w, a_b, ef_w, ef_b, econv_w, econv_b, eb_w, eb_b, proj_w,
     proj_b, proje_w, proje_b) = params
    B, H, W, C = x.shape
    Ce = x_e.shape[-1]
    halo = _HALO
    WP = _round8(W + 2 * halo)
    CP, CeP = _round128(C), _round128(Ce)
    Th = _pick_row_tile(H, W, C, Ce)
    xp = jnp.pad(x, ((0, 0), (halo, halo), (halo, WP - W - halo),
                     (0, CP - C)))
    ep = jnp.pad(x_e, ((0, 0), (halo, halo), (halo, WP - W - halo),
                       (0, CeP - Ce)))

    kern = functools.partial(_kernel, Th=Th, W=W, WP=WP, C=C, CP=CP, Ce=Ce,
                             CeP=CeP, eps=eps)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out, oute = pl.pallas_call(
        kern,
        grid=(B, H // Th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2
        + [vmem] * 24,
        out_specs=(
            pl.BlockSpec((1, Th, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Th, W, Ce), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
                   jax.ShapeDtypeStruct((B, H, W, Ce), x.dtype)),
        scratch_shapes=[
            pltpu.VMEM((Th + 2 * halo, WP, CP), x.dtype),
            pltpu.VMEM((Th + 2 * halo, WP, CeP), x.dtype),
            pltpu.VMEM((Th + 2 * halo, WP, C), jnp.float32),
            pltpu.VMEM((Th + 2 * halo, WP, Ce), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * C * 8,
            bytes_accessed=(x.size + x_e.size) * x.dtype.itemsize * 2,
            transcendentals=B * H * W * C),
        interpret=interpret,
    )(xp, ep, ln_w, ln_b, lne_w, lne_b, q_w, q_b, qcut_w, qcut_b, l_w, l_b,
      conv_w, conv_b, a_w, a_b, ef_w, ef_b, econv_w, econv_b, eb_w, eb_b,
      proj_w, proj_b, proje_w, proje_b)
    return out, oute


def fused_local_attention_reference(x, x_e, *params, eps=1e-6):
    """Plain-XLA reference (backward pass + numerical oracle)."""
    (ln_w, ln_b, lne_w, lne_b, q_w, q_b, qcut_w, qcut_b, l_w, l_b, conv_w,
     conv_b, a_w, a_b, ef_w, ef_b, econv_w, econv_b, eb_w, eb_b, proj_w,
     proj_b, proje_w, proje_b) = params
    C = x.shape[-1]
    Ce = x_e.shape[-1]

    def ln(v, w, b):
        vf = v.astype(jnp.float32)
        mean = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(vf - mean), axis=-1, keepdims=True)
        return ((vf - mean) * jax.lax.rsqrt(var + eps)) * w + b

    def dw(v, w, k=7):
        return jax.lax.conv_general_dilated(
            v.astype(x.dtype), w[:, :, None, :].astype(x.dtype), (1, 1),
            [(k // 2, k // 2)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=v.shape[-1])

    xn = ln(x, ln_w, ln_b)
    en = ln(x_e, lne_w, lne_b)
    q = xn.astype(x.dtype) @ q_w + q_b
    cut = xn.astype(x.dtype) @ qcut_w + qcut_b
    t = xn.astype(x.dtype) @ l_w + l_b
    t = jax.nn.gelu(t.astype(jnp.float32), approximate=False)
    a = dw(t, conv_w).astype(jnp.float32) + conv_b
    a = a.astype(x.dtype) @ a_w + a_b
    ef = en.astype(x.dtype) @ ef_w + ef_b
    eb = dw(ef, econv_w).astype(x.dtype) @ eb_w + eb_b
    ga = (q.astype(jnp.float32) * a.astype(jnp.float32)).astype(x.dtype)
    ce = (cut.astype(jnp.float32) * eb.astype(jnp.float32)).astype(x.dtype)
    cat = jnp.concatenate([ga, ce], axis=-1)
    out = cat @ proj_w + proj_b
    oute = cat @ proje_w + proje_b
    return out.astype(x.dtype), oute.astype(x.dtype)


def _gaa_front_kernel(x_hbm, e_hbm, ln_w, ln_b, lne_w, lne_b, qcl_w, qcl_b,
                      conv_w, conv_b, a_w, a_b, ef_w, ef_b, econv_w, econv_b,
                      eb_w, eb_b,
                      xa_ref, ce_ref, t_ref, pooled_ref,
                      x_tile, e_tile, t_tile, ef_tile, sem1, sem2,
                      *, Th, H, W, WP, C, Ce, eps):
    """Front half of a GAA attention block (everything except the global
    attention): ln, fused q/q_cut/l matmul, gelu, both 7x7 dwconvs, the a /
    e_back linears, the two gating products, plus per-tile accumulation of
    the 7x7 adaptive-pooled concat[ln_x, ln_e] used for the GAA queries."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    halo = _HALO
    rows = (Th + 2 * halo) * WP

    cp1 = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * Th, Th + 2 * halo)],
                                x_tile, sem1)
    cp2 = pltpu.make_async_copy(e_hbm.at[b, pl.ds(i * Th, Th + 2 * halo)],
                                e_tile, sem2)
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    gr = i * Th + jax.lax.broadcasted_iota(
        jnp.int32, (Th + 2 * halo, WP, 1), 0) - halo
    gc = jax.lax.broadcasted_iota(jnp.int32, (Th + 2 * halo, WP, 1), 1) - halo
    num_rows = pl.num_programs(1) * Th
    maskf = ((gr >= 0) & (gr < num_rows) & (gc >= 0)
             & (gc < W)).astype(jnp.float32)

    xn = _ln(x_tile[:, :, :C].reshape(rows, C).astype(jnp.float32),
             ln_w[:], ln_b[:], eps)
    en = _ln(e_tile[:, :, :Ce].reshape(rows, Ce).astype(jnp.float32),
             lne_w[:], lne_b[:], eps)

    # fused q/q_cut/l matmul: [rows, C] @ [C, 2.5C]
    qcl = jnp.dot(xn.astype(qcl_w.dtype), qcl_w[:],
                  preferred_element_type=jnp.float32) \
        + qcl_b[:].astype(jnp.float32)
    t = qcl[:, C + Ce:]
    t = 0.5 * t * (1.0 + _erf(t * np.float32(0.7071067811865476)))
    t_tile[:] = t.reshape(Th + 2 * halo, WP, C) * maskf

    ef = jnp.dot(en.astype(ef_w.dtype), ef_w[:],
                 preferred_element_type=jnp.float32) \
        + ef_b[:].astype(jnp.float32)
    ef_tile[:] = ef.reshape(Th + 2 * halo, WP, Ce) * maskf

    conv_t = _dwconv(t_tile, conv_w[:].astype(jnp.float32), Th, W) \
        + conv_b[:].astype(jnp.float32)
    conv_e = _dwconv(ef_tile, econv_w[:].astype(jnp.float32), Th, W)

    a = jnp.dot(conv_t.reshape(Th * W, C).astype(a_w.dtype), a_w[:],
                preferred_element_type=jnp.float32) + a_b[:].astype(jnp.float32)
    eb = jnp.dot(conv_e.reshape(Th * W, Ce).astype(eb_w.dtype), eb_w[:],
                 preferred_element_type=jnp.float32) \
        + eb_b[:].astype(jnp.float32)

    qcl3 = qcl.reshape(Th + 2 * halo, WP, C + Ce + C)
    qc = qcl3[halo:halo + Th, halo:halo + W, :].reshape(Th * W, C + Ce + C)
    xa = qc[:, :C] * a
    ce = qc[:, C:C + Ce] * eb
    xa_ref[0] = xa.reshape(Th, W, C).astype(xa_ref.dtype)
    ce_ref[0] = ce.reshape(Th, W, Ce).astype(ce_ref.dtype)
    # t at the center region, for the kv linear outside
    tc = t_tile[halo:halo + Th, halo:halo + W, :]
    t_ref[0] = tc.astype(t_ref.dtype)

    # adaptive-pool partials: rows of this tile weighted by the pooling
    # matrices; accumulated across the sequential i-grid into one block
    xnc = xn.reshape(Th + 2 * halo, WP, C)[halo:halo + Th, halo:halo + W, :]
    enc = en.reshape(Th + 2 * halo, WP, Ce)[halo:halo + Th, halo:halo + W, :]
    cat = jnp.concatenate([xnc, enc], axis=-1)           # [Th, W, 1.5C]
    # row pooling weights for THIS tile, built from the static adaptive-pool
    # bucket bounds as masked elementwise terms (no gathers / dynamic lane
    # slicing, which Mosaic can't lower). Row bucket 7 is zero padding so
    # shapes stay 8-aligned; the pad rows are sliced off outside.
    r_glob = (i * Th + jax.lax.broadcasted_iota(jnp.int32, (Th, 8), 0)) \
        .astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (Th, 8), 1)
    wh = jnp.zeros((Th, 8), jnp.float32)
    for p in range(7):
        rs = (p * H) // 7
        re_ = -((-(p + 1) * H) // 7)
        wh += jnp.where((r_glob >= rs) & (r_glob < re_) & (col == p),
                        np.float32(1.0 / (re_ - rs)), 0.0)

    @pl.when(i == 0)
    def _():
        pooled_ref[:] = jnp.zeros_like(pooled_ref)

    # column pooling: 7 static bucket mean-reductions (plain sublane-slice
    # sums; a [7,W]x[Th,W,CC] dot_general needs a transpose Mosaic can't
    # shape-cast), each followed by a [Th,8]^T x [Th,CC] matmul for the rows
    for pc in range(7):
        cs = (pc * W) // 7
        ce_col = -((-(pc + 1) * W) // 7)
        colsum = jnp.sum(cat[:, cs:ce_col, :], axis=1)   # [Th, CC]
        term = jax.lax.dot_general(
            wh, colsum, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [8, CC]
        pooled_ref[0, :, pc, :] += term * np.float32(1.0 / (ce_col - cs))


def fused_gaa_front_reference(x, x_e, ln_w, ln_b, lne_w, lne_b, qcl_w, qcl_b,
                              conv_w, conv_b, a_w, a_b, ef_w, ef_b, econv_w,
                              econv_b, eb_w, eb_b, eps=1e-6):
    """Plain-XLA reference of the front half (backward + oracle)."""
    from dformer_tpu.ops.pool import adaptive_avg_pool2d

    C = x.shape[-1]
    Ce = x_e.shape[-1]

    def ln(v, w, b):
        vf = v.astype(jnp.float32)
        mean = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(vf - mean), axis=-1, keepdims=True)
        return ((vf - mean) * jax.lax.rsqrt(var + eps)) * w + b

    def dw(v, w, k=7):
        return jax.lax.conv_general_dilated(
            v.astype(x.dtype), w[:, :, None, :].astype(x.dtype), (1, 1),
            [(k // 2, k // 2)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=v.shape[-1])

    xn = ln(x, ln_w, ln_b)
    en = ln(x_e, lne_w, lne_b)
    qcl = xn.astype(x.dtype) @ qcl_w + qcl_b
    q, cut, t = qcl[..., :C], qcl[..., C:C + Ce], qcl[..., C + Ce:]
    t = jax.nn.gelu(t.astype(jnp.float32), approximate=False)
    a = dw(t, conv_w).astype(jnp.float32) + conv_b
    a = a.astype(x.dtype) @ a_w + a_b
    ef = en.astype(x.dtype) @ ef_w + ef_b
    eb = dw(ef, econv_w).astype(x.dtype) @ eb_w + eb_b
    xa = (q.astype(jnp.float32) * a.astype(jnp.float32)).astype(x.dtype)
    ce = (cut.astype(jnp.float32) * eb.astype(jnp.float32)).astype(x.dtype)
    pooled = adaptive_avg_pool2d(
        jnp.concatenate([xn, en], axis=-1).astype(jnp.float32), (7, 7))
    B = x.shape[0]
    return xa, ce, t.astype(x.dtype), pooled.reshape(B, 49, C + Ce)


@functools.partial(jax.custom_vjp, nondiff_argnums=(18, 19))
def fused_gaa_front(x, x_e, ln_w, ln_b, lne_w, lne_b, qcl_w, qcl_b, conv_w,
                    conv_b, a_w, a_b, ef_w, ef_b, econv_w, econv_b, eb_w,
                    eb_b, eps: float = 1e-6, interpret: bool = False):
    """Fused GAA-front: returns (xa=q*a, ce=cut*eb, t, pooled[B,49,1.5C]).

    Normalization note: the kernel accumulates SUMS weighted by the exact
    adaptive-pool averaging matrices, so `pooled` equals
    adaptive_avg_pool2d(concat(ln_x, ln_e)) exactly."""
    return _gaa_front_pallas(
        x, x_e, (ln_w, ln_b, lne_w, lne_b, qcl_w, qcl_b, conv_w, conv_b,
                 a_w, a_b, ef_w, ef_b, econv_w, econv_b, eb_w, eb_b),
        eps, interpret)


def _gaa_front_pallas(x, x_e, params, eps, interpret):

    (ln_w, ln_b, lne_w, lne_b, qcl_w, qcl_b, conv_w, conv_b, a_w, a_b,
     ef_w, ef_b, econv_w, econv_b, eb_w, eb_b) = params
    B, H, W, C = x.shape
    Ce = x_e.shape[-1]
    halo = _HALO
    WP = _round8(W + 2 * halo)
    CP, CeP = _round128(C), _round128(Ce)
    Th = _pick_row_tile(H, W, C, Ce)
    xp = jnp.pad(x, ((0, 0), (halo, halo), (halo, WP - W - halo),
                     (0, CP - C)))
    ep = jnp.pad(x_e, ((0, 0), (halo, halo), (halo, WP - W - halo),
                       (0, CeP - Ce)))
    kern = functools.partial(_gaa_front_kernel, Th=Th, H=H, W=W, WP=WP, C=C,
                             Ce=Ce, eps=eps)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    xa, ce, t, pooled = pl.pallas_call(
        kern,
        grid=(B, H // Th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2 + [vmem] * 16,
        out_specs=(
            pl.BlockSpec((1, Th, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Th, W, Ce), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Th, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 7, C + Ce), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
                   jax.ShapeDtypeStruct((B, H, W, Ce), x.dtype),
                   jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
                   jax.ShapeDtypeStruct((B, 8, 7, C + Ce), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((Th + 2 * halo, WP, CP), x.dtype),
            pltpu.VMEM((Th + 2 * halo, WP, CeP), x.dtype),
            pltpu.VMEM((Th + 2 * halo, WP, C), jnp.float32),
            pltpu.VMEM((Th + 2 * halo, WP, Ce), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * C * 6,
            bytes_accessed=(x.size + x_e.size) * x.dtype.itemsize * 3,
            transcendentals=B * H * W * C),
        interpret=interpret,
    )(xp, ep, ln_w, ln_b, lne_w, lne_b, qcl_w, qcl_b, conv_w, conv_b,
      a_w, a_b, ef_w, ef_b, econv_w, econv_b, eb_w, eb_b)
    # [B, 8(pr), 7(pc), CC] -> [B, 49, CC] dropping the pr=7 pad bucket
    return xa, ce, t, pooled[:, :7].reshape(B, 49, C + Ce)


def _gaa_fwd(*args):
    x, x_e = args[0], args[1]
    params = args[2:18]
    eps, interpret = args[18], args[19]
    out = _gaa_front_pallas(x, x_e, params, eps, interpret)
    return out, (x, x_e) + tuple(params)


def _gaa_bwd(eps, interpret, res, g):
    x, x_e = res[0], res[1]
    params = res[2:]
    _, vjp = jax.vjp(
        lambda *a: fused_gaa_front_reference(*a, eps=eps), x, x_e, *params)
    return vjp(g)


fused_gaa_front.defvjp(_gaa_fwd, _gaa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(26, 27))
def fused_local_attention(x, x_e, ln_w, ln_b, lne_w, lne_b, q_w, q_b, qcut_w,
                          qcut_b, l_w, l_b, conv_w, conv_b, a_w, a_b, ef_w,
                          ef_b, econv_w, econv_b, eb_w, eb_b, proj_w, proj_b,
                          proje_w, proje_b, eps: float = 1e-6,
                          interpret: bool = False):
    params = (ln_w, ln_b, lne_w, lne_b, q_w, q_b, qcut_w, qcut_b, l_w, l_b,
              conv_w, conv_b, a_w, a_b, ef_w, ef_b, econv_w, econv_b, eb_w,
              eb_b, proj_w, proj_b, proje_w, proje_b)
    return _forward_pallas(x, x_e, params, eps, interpret)


def _fwd(*args):
    x, x_e = args[0], args[1]
    params = args[2:26]
    eps, interpret = args[26], args[27]
    out = _forward_pallas(x, x_e, params, eps, interpret)
    return out, (x, x_e) + tuple(params)


def _bwd(eps, interpret, res, g):
    x, x_e = res[0], res[1]
    params = res[2:]
    _, vjp = jax.vjp(
        lambda *a: fused_local_attention_reference(*a, eps=eps),
        x, x_e, *params)
    return vjp(g)


fused_local_attention.defvjp(_fwd, _bwd)
