"""Device-side training augmentation.

The reference augments on CPU workers with OpenCV (utils/dataloader/
dataloader.py:40-76: mirror -> random scale from train_scale_array ->
normalize -> random crop+pad to (H,W), pad 0 for images / 255 for labels).
Per the BASELINE north star, this moves on-device: decode feeds raw uint8
arrays to HBM and ONE jitted gather performs scale+crop+flip+normalize per
batch with static output shapes.

Key trick: "random-scale then random-crop-pad" is a single affine resample —
output pixel (i, j) of sample b reads source coordinate
    src = (crop_origin + idx + 0.5) / scale - 0.5          (cv2 INTER_LINEAR)
so no intermediate variable-size tensor ever exists (dynamic shapes would
defeat jit). Labels use the same grid with cv2's INTER_NEAREST floor rule.
Out-of-canvas coordinates produce the pad value, reproducing
random_crop_pad_to_shape (utils/transforms.py:27-42,61-75).
"""

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sample_coords(out_size: int, inv_ratio, origin):
    """Source coords for each output index given the inverse scale ratio
    (in_size / floor(in_size*scale) — cv2 computes the resize factor from
    the rounded target size, not the nominal scale) and the crop origin in
    scaled-image space."""
    idx = jnp.arange(out_size, dtype=jnp.float32)
    # cv2.resize INTER_LINEAR half-pixel rule, inverted from dst->src:
    pos = idx + origin
    src = (pos + 0.5) * inv_ratio - 0.5
    return src


def _bilinear_gather_1d(img, src, axis, pad_value, n_true=None):
    """Sample img along `axis` at fractional positions src, with constant pad.

    n_true: valid extent when img is a padded canvas (defaults to shape)."""
    n = img.shape[axis] if n_true is None else n_true
    # cv2 clamps the source coordinate at the borders (edge replicate)
    src = jnp.clip(src, 0.0, n - 1.0)
    lo = jnp.floor(src)
    frac = src - lo
    lo_i = jnp.clip(lo.astype(jnp.int32), 0,
                    jnp.asarray(n - 1, jnp.int32))
    hi_i = jnp.clip(lo_i + 1, 0, jnp.asarray(n - 1, jnp.int32))
    a = jnp.take(img, lo_i, axis=axis)
    b = jnp.take(img, hi_i, axis=axis)
    shape = [1] * img.ndim
    shape[axis] = src.shape[0]
    frac = frac.reshape(shape)
    out = a * (1.0 - frac) + b * frac
    return out


def _apply_pad_mask(out, pos_h, pos_w, sh, sw, pad_value):
    """Constant-pad where the crop position leaves the scaled image extent
    [0, sh) x [0, sw) (random_crop_pad_to_shape semantics)."""
    valid_h = (pos_h >= 0) & (pos_h < sh)
    valid_w = (pos_w >= 0) & (pos_w < sw)
    mask = valid_h[:, None] & valid_w[None, :]
    mask = mask.reshape((1,) * (out.ndim - 3) + mask.shape + (1,))
    return jnp.where(mask, out, pad_value)


def scale_crop_sample(img, scale, origin_hw, out_hw, pad_value,
                      nearest: bool = False, true_hw=None):
    """One sample: affine scale+crop resample of [H,W,C] (or [H,W]) to out_hw.

    true_hw: optional per-sample valid extent when `img` is a padded canvas
    (variable-size datasets like SUNRGBD are padded to one canvas on the
    host; sampling and pad masks use the true extent)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    if true_hw is None:
        h_in, w_in = img.shape[0], img.shape[1]
    else:
        h_in = true_hw[0].astype(jnp.float32)
        w_in = true_hw[1].astype(jnp.float32)
    # cv2 resizes to the FLOORED target size and derives the sampling ratio
    # from it (in/floor(in*scale)), not from the nominal scale
    sh = jnp.floor(h_in * scale)
    sw = jnp.floor(w_in * scale)
    inv_h = h_in / jnp.maximum(sh, 1.0)
    inv_w = w_in / jnp.maximum(sw, 1.0)
    src_h = _sample_coords(out_hw[0], inv_h, origin_hw[0])
    src_w = _sample_coords(out_hw[1], inv_w, origin_hw[1])
    if nearest:
        # cv2 INTER_NEAREST: sx = floor(dx * ifx) with ifx = 1/(out/in),
        # both divisions rounded (cv2 computes them in float64; here f32
        # under jit — can flip a boundary source pixel at pathological
        # ratios, exact for the reference train_scale_array on NYU/SUNRGBD
        # canvas sizes, see tests/test_augment_cv2_parity.py)
        def nn_idx(out_size, origin, n_in, n_scaled):
            ifx = 1.0 / (n_scaled / n_in)
            dx = jnp.arange(out_size, dtype=jnp.float32) + origin
            sx = jnp.floor(dx * ifx).astype(jnp.int32)
            return jnp.clip(sx, 0, jnp.asarray(n_in - 1, jnp.int32))

        ih = nn_idx(out_hw[0], origin_hw[0], h_in, sh)
        iw = nn_idx(out_hw[1], origin_hw[1], w_in, sw)
        out = jnp.take(jnp.take(img, ih, axis=0), iw, axis=1)
        # pad region: crop position outside the scaled image extent
        ph = jnp.arange(out_hw[0], dtype=jnp.float32) + origin_hw[0]
        pw = jnp.arange(out_hw[1], dtype=jnp.float32) + origin_hw[1]
        vh = (ph >= 0) & (ph < sh)
        vw = (pw >= 0) & (pw < sw)
        mask = (vh[:, None] & vw[None, :])[..., None]
        out = jnp.where(mask, out, pad_value)
    else:
        imgf = img.astype(jnp.float32)
        out = _bilinear_gather_1d(imgf, src_h, axis=0, pad_value=pad_value,
                                  n_true=h_in)
        out = _bilinear_gather_1d(out, src_w, axis=1, pad_value=pad_value,
                                  n_true=w_in)
        pos_h = jnp.arange(out_hw[0], dtype=jnp.float32) + origin_hw[0]
        pos_w = jnp.arange(out_hw[1], dtype=jnp.float32) + origin_hw[1]
        out = _apply_pad_mask(out, pos_h, pos_w, sh, sw, pad_value)
    return out[..., 0] if squeeze else out


@partial(jax.jit, static_argnames=("out_hw", "scales"))
def device_train_augment(rgb, gt, modal_x, key, out_hw: Tuple[int, int],
                         scales: Tuple[float, ...],
                         rgb_mean, rgb_std, x_mean, x_std, true_hw=None):
    """Batched train augmentation, all on device.

    rgb: [B,H,W,3] uint8; gt: [B,H,W] int32; modal_x: [B,H,W,Cx] (uint8 or
    float); returns normalized float32 (rgb, gt, modal_x) at out_hw.
    Matches TrainPre (dataloader.py:47-76): mirror(p=.5) -> random scale from
    `scales` -> /255-normalize -> random crop+pad(0 / 255-for-gt).

    true_hw: optional [B, 2] int array of per-sample valid extents when the
    batch is a padded canvas of variable-size images (SUNRGBD); the flip,
    scale ratios, crop range and pad masks all use the true extents.
    """
    B, H, W = rgb.shape[0], rgb.shape[1], rgb.shape[2]
    k_flip, k_scale, k_crop = jax.random.split(key, 3)
    flips = jax.random.bernoulli(k_flip, 0.5, (B,))
    scale_idx = jax.random.randint(k_scale, (B,), 0, len(scales))
    scale = jnp.asarray(scales, jnp.float32)[scale_idx]

    if true_hw is None:
        th = jnp.full((B,), H, jnp.float32)
        tw = jnp.full((B,), W, jnp.float32)
    else:
        th = true_hw[:, 0].astype(jnp.float32)
        tw = true_hw[:, 1].astype(jnp.float32)

    # crop origin in scaled space (generate_random_crop_pos semantics):
    # python random.randint(0, excess+1) is INCLUSIVE both ends, so the
    # reference draws from [0, excess+1] — the extra position yields a 1px
    # bottom/right pad row (transforms.py:53-57). When scaled <= crop, the
    # reference center-pads — origin = -(pad_top).
    u = jax.random.uniform(k_crop, (B, 2))
    sh, sw = jnp.floor(th * scale), jnp.floor(tw * scale)

    def origin(scaled, crop, uu):
        excess = scaled - crop
        rand_o = jnp.minimum(jnp.floor(uu * (excess + 2.0)), excess + 1.0)
        pad_o = jnp.ceil(excess / 2.0)  # negative when padding
        return jnp.where(excess > 0, rand_o, pad_o)

    oh = origin(sh, out_hw[0], u[:, 0])
    ow = origin(sw, out_hw[1], u[:, 1])

    # Normalize BEFORE the resample so the constant pad is 0 in normalized
    # space, exactly like TrainPre (normalize at dataloader.py:54-60, then
    # crop+pad with 0). Bilinear resampling commutes with the affine
    # normalize, so fusing scale+crop after it is exact.
    rgb_n = (rgb.astype(jnp.float32) / 255.0 - rgb_mean) / rgb_std
    x_n = (modal_x.astype(jnp.float32) / 255.0 - x_mean) / x_std

    def flip_valid(img, fl, w_i):
        """Mirror within the valid extent: x -> w_i-1-x for x < w_i."""
        iw = jnp.arange(img.shape[1])
        src = jnp.where(iw < w_i, jnp.clip(w_i - 1 - iw, 0, img.shape[1] - 1),
                        iw).astype(jnp.int32)
        return jnp.where(fl, jnp.take(img, src, axis=1), img)

    def one(rgb_i, gt_i, x_i, fl, sc, o_h, o_w, th_i, tw_i):
        rgb_i = flip_valid(rgb_i, fl, tw_i)
        gt_i = flip_valid(gt_i, fl, tw_i)
        x_i = flip_valid(x_i, fl, tw_i)
        hw = (th_i, tw_i)
        r = scale_crop_sample(rgb_i, sc, (o_h, o_w), out_hw, 0.0,
                              true_hw=hw)
        g = scale_crop_sample(gt_i, sc, (o_h, o_w), out_hw, 255,
                              nearest=True, true_hw=hw)
        x = scale_crop_sample(x_i, sc, (o_h, o_w), out_hw, 0.0,
                              true_hw=hw)
        return r, g, x

    rgb_o, gt_o, x_o = jax.vmap(one)(rgb_n, gt, x_n, flips, scale, oh, ow,
                                     th, tw)
    return rgb_o.astype(jnp.float32), gt_o.astype(jnp.int32), \
        x_o.astype(jnp.float32)


@partial(jax.jit, static_argnames=())
def normalize_batch(rgb, modal_x, rgb_mean, rgb_std, x_mean, x_std):
    """Val preprocessing: normalize only (ValPre, dataloader.py:112-122)."""
    rgb = (rgb.astype(jnp.float32) / 255.0 - rgb_mean) / rgb_std
    modal_x = (modal_x.astype(jnp.float32) / 255.0 - x_mean) / x_std
    return rgb.astype(jnp.float32), modal_x.astype(jnp.float32)


# -- standalone aug primitives (reference utils/transforms.py:61-157) -------
#
# The reference ships these in its transforms library but its TrainPre never
# calls rotation/blur/pad-to-multiple/shortest-edge; they exist for users
# composing custom pipelines. Device-side equivalents with cv2-parity
# semantics (static shapes — pad/resize targets derive from the static input
# shape, so each distinct geometry is one compile).


def pad_to_shape(img, shape: Tuple[int, int], pad_value):
    """Centered constant pad to at least `shape`
    (pad_image_to_shape, transforms.py:61-75). Returns (img, margin) with
    margin = [top, bottom, left, right] like the reference."""
    h, w = img.shape[:2]
    ph, pw = max(shape[0] - h, 0), max(shape[1] - w, 0)
    margin = (ph // 2, ph - ph // 2, pw // 2, pw - pw // 2)
    pads = [(margin[0], margin[1]), (margin[2], margin[3])] + \
        [(0, 0)] * (img.ndim - 2)
    return jnp.pad(img, pads, constant_values=pad_value), \
        np.asarray(margin, np.uint32)


def pad_to_multiple(img, multiple: int, pad_value):
    """Centered pad so H and W are multiples of `multiple`
    (pad_image_size_to_multiples_of, transforms.py:77-87)."""
    h, w = img.shape[:2]
    th = -(-h // multiple) * multiple
    tw = -(-w // multiple) * multiple
    return pad_to_shape(img, (th, tw), pad_value)


def resize_shortest_edge(img, edge_length: int):
    """Scale so the shortest edge equals edge_length, cv2 INTER_LINEAR
    geometry (resize_ensure_shortest_edge, transforms.py:89-100)."""
    from dformer_tpu.ops.resize import resize_bilinear

    h, w = img.shape[:2]
    if h < w:
        th, tw = edge_length, max(1, int(edge_length / h * w))
    else:
        th, tw = max(1, int(edge_length / w * h)), edge_length
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    out = resize_bilinear(x.astype(jnp.float32)[None], (th, tw),
                          align_corners=False)[0]
    return out[..., 0] if squeeze else out


def center_crop(img, shape: Tuple[int, int]):
    """(transforms.py:158-162)."""
    y = (img.shape[0] - shape[0]) // 2
    x = (img.shape[1] - shape[1]) // 2
    return img[y:y + shape[0], x:x + shape[1]]


def rotate(img, angle_deg, nearest: bool = False, pad_value: float = 0.0):
    """Rotate about the image center like cv2.warpAffine with
    getRotationMatrix2D(center, angle, 1) (transforms.py:139-147): positive
    angle is counter-clockwise in image coordinates, constant 0 border,
    INTER_LINEAR (or INTER_NEAREST for labels). angle may be a traced
    scalar — one compile covers all angles."""
    from jax.scipy.ndimage import map_coordinates

    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    h, w = x.shape[0], x.shape[1]
    cx, cy = w / 2.0, h / 2.0  # cv2 center=(w/2, h/2), transforms.py:142
    th = -angle_deg * np.pi / 180.0  # dst->src is the inverse rotation
    cos, sin = jnp.cos(th), jnp.sin(th)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # cv2 rotates with y pointing DOWN: CCW on screen is CW in (x, y-down)
    sx = cos * (xx - cx) + sin * (yy - cy) + cx
    sy = -sin * (xx - cx) + cos * (yy - cy) + cy
    order = 0 if nearest else 1
    out = jax.vmap(
        lambda ch: map_coordinates(ch, [sy, sx], order=order,
                                   mode="constant", cval=pad_value),
        in_axes=-1, out_axes=-1)(x.astype(jnp.float32))
    return out[..., 0] if squeeze else out


def random_rotation(key, img, gt):
    """angle ~ U(-10, 10) deg, bilinear image / nearest labels
    (random_rotation, transforms.py:139-147)."""
    angle = jax.random.uniform(key) * 20.0 - 10.0
    return rotate(img, angle), rotate(gt, angle, nearest=True)


# cv2's hardcoded small-sigma kernels (getGaussianKernel with sigma<=0 and
# ksize<=7 returns these fixed taps)
_CV2_GAUSS = {
    1: (1.0,),
    3: (0.25, 0.5, 0.25),
    5: (0.0625, 0.25, 0.375, 0.25, 0.0625),
    7: (0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125),
}


def gaussian_blur(img, ksize: int):
    """cv2.GaussianBlur(img, (k, k), 0) parity: cv2's fixed small-kernel
    taps, BORDER_REFLECT_101 (= jnp.pad mode='reflect'), separable passes
    (random_gaussian_blur, transforms.py:149-155)."""
    if ksize <= 1:
        return img
    taps = jnp.asarray(_CV2_GAUSS[ksize], jnp.float32)
    r = ksize // 2
    squeeze = img.ndim == 2
    x = (img[..., None] if squeeze else img).astype(jnp.float32)

    def pass_axis(a, axis):
        pads = [(0, 0)] * a.ndim
        pads[axis] = (r, r)
        ap = jnp.pad(a, pads, mode="reflect")
        out = None
        for i in range(ksize):
            sl = [slice(None)] * a.ndim
            sl[axis] = slice(i, i + a.shape[axis])
            term = taps[i] * ap[tuple(sl)]
            out = term if out is None else out + term
        return out

    out = pass_axis(pass_axis(x, 0), 1)
    return out[..., 0] if squeeze else out


def random_gaussian_blur(key, img):
    """ksize ~ choice([1, 3, 5, 7]) (transforms.py:149-155); lax.switch so
    the draw stays on device."""
    idx = jax.random.randint(key, (), 0, 4)
    fns = [lambda a: a.astype(jnp.float32)] + \
        [partial(gaussian_blur, ksize=k) for k in (3, 5, 7)]
    return jax.lax.switch(idx, fns, img)
