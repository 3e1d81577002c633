"""Numerical parity of the evaluation pipelines against the reference
semantics (utils/val_mm.py), using a small fake segmentation model shared by
both sides:

  * evaluate_msf: per-scale ceil-to-32 resize with align_corners=True
    (torch F.interpolate on the reference side), logits resized back with
    align_corners=True, softmax accumulation, horizontal flip.
  * slide_inference: overlapping crop grid at stride 2/3, pad-accumulate,
    count-matrix average (reference val_mm.py:257-321 loop, reimplemented
    here in numpy as the oracle).
"""

import math

import numpy as np
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp
from flax import linen as fnn

from dformer_tpu.config import AttrDict
from dformer_tpu.eval.evaluate import Evaluator


class FakeSeg(fnn.Module):
    """Tiny deterministic seg model: 3x3 conv over concat(rgb, modal)."""

    num_classes: int = 5

    @fnn.compact
    def __call__(self, rgb, modal, train=False, deterministic_bases=True):
        x = jnp.concatenate([rgb, modal], axis=-1)
        return fnn.Conv(self.num_classes, (3, 3), padding="SAME")(x)


def _setup():
    cfg = AttrDict(num_classes=5, background=255, eval_crop_size=[16, 24],
                   eval_stride_rate=2 / 3, dataset_name="NYUDepthv2")
    model = FakeSeg(num_classes=5)
    rgb = jnp.zeros((1, 32, 48, 3))
    variables = model.init(jax.random.PRNGKey(0), rgb, rgb)
    rng = np.random.RandomState(0)
    batch = dict(
        rgb=rng.rand(2, 32, 48, 3).astype(np.float32),
        modal_x=rng.rand(2, 32, 48, 3).astype(np.float32),
        gt=rng.randint(0, 5, (2, 32, 48)).astype(np.int32),
    )
    return cfg, model, variables, batch


def _fwd_np(model, variables, rgb_np, modal_np):
    out = model.apply(variables, jnp.asarray(rgb_np), jnp.asarray(modal_np))
    return np.asarray(out)


def _t_resize(x_np_nhwc, size, align):
    t = torch.from_numpy(x_np_nhwc.transpose(0, 3, 1, 2))
    t = tF.interpolate(t, size=size, mode="bilinear", align_corners=align)
    return t.numpy().transpose(0, 2, 3, 1)


def test_msf_matches_torch_reference_loop():
    cfg, model, variables, batch = _setup()
    H, W = 32, 48
    scales, flip = [0.75, 1.0, 1.25], True

    # reference-semantics MSF with torch interpolation (val_mm.py:359-397)
    acc = np.zeros((2, H, W, cfg.num_classes), np.float32)
    for scale in scales:
        nh = int(math.ceil(int(scale * H) / 32)) * 32
        nw = int(math.ceil(int(scale * W) / 32)) * 32
        r = _t_resize(batch["rgb"], (nh, nw), True)
        m = _t_resize(batch["modal_x"], (nh, nw), True)
        logits = _fwd_np(model, variables, r, m)
        logits = _t_resize(logits, (H, W), True)
        acc += np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        if flip:
            rf, mf = r[:, :, ::-1].copy(), m[:, :, ::-1].copy()
            logits = _fwd_np(model, variables, rf, mf)[:, :, ::-1]
            logits = _t_resize(logits.copy(), (H, W), True)
            acc += np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    want_pred = acc.argmax(-1)

    ev = Evaluator(model, variables, cfg)
    metrics = ev.evaluate_msf([batch], scales=scales, flip=flip)

    keep = batch["gt"] != 255
    want_hist = np.bincount(
        (batch["gt"][keep] * 5 + want_pred[keep]).astype(np.int64),
        minlength=25).reshape(5, 5)
    np.testing.assert_array_equal(metrics.hist, want_hist)


def test_slide_matches_reference_loop():
    cfg, model, variables, batch = _setup()
    H, W = 32, 48
    h_crop, w_crop = cfg.eval_crop_size
    h_stride = int(cfg.eval_stride_rate * h_crop)
    w_stride = int(cfg.eval_stride_rate * w_crop)

    # reference slide loop (val_mm.py:295-319) in numpy
    preds = np.zeros((2, H, W, cfg.num_classes), np.float32)
    count = np.zeros((2, H, W, 1), np.float32)
    h_grids = max(H - h_crop + h_stride - 1, 0) // h_stride + 1
    w_grids = max(W - w_crop + w_stride - 1, 0) // w_stride + 1
    for hi in range(h_grids):
        for wi in range(w_grids):
            y2 = min(hi * h_stride + h_crop, H)
            x2 = min(wi * w_stride + w_crop, W)
            y1, x1 = max(y2 - h_crop, 0), max(x2 - w_crop, 0)
            r = batch["rgb"][:, y1:y2, x1:x2]
            m = batch["modal_x"][:, y1:y2, x1:x2]
            logits = _fwd_np(model, variables, r, m)
            preds[:, y1:y2, x1:x2] += logits
            count[:, y1:y2, x1:x2] += 1
    assert (count == 0).sum() == 0
    want = preds / count
    want_pred = np.asarray(
        jax.nn.softmax(jnp.asarray(want), axis=-1)).argmax(-1)

    ev = Evaluator(model, variables, cfg, sliding=True)
    metrics = ev.evaluate([batch])
    keep = batch["gt"] != 255
    want_hist = np.bincount(
        (batch["gt"][keep] * 5 + want_pred[keep]).astype(np.int64),
        minlength=25).reshape(5, 5)
    np.testing.assert_array_equal(metrics.hist, want_hist)


def test_slide_upscales_small_inputs():
    """Inputs smaller than the crop are upscaled with align_corners=True
    (val_mm.py:280-287)."""
    cfg, model, variables, batch = _setup()
    cfg.eval_crop_size = [64, 96]  # larger than the 32x48 input
    ev = Evaluator(model, variables, cfg, sliding=True)
    m = ev.evaluate([batch])
    assert m.hist.sum() == 2 * 32 * 48


def test_mesh_sharded_eval_matches_single_device():
    """Evaluator(mesh=8 virtual devices) must produce the identical hist as
    the unsharded path, including a batch that does not divide the device
    count (padded with ignore-label gt)."""
    from dformer_tpu.parallel.mesh import make_mesh

    cfg, model, variables, batch = _setup()
    # odd batch of 3 -> padded to 8 on the mesh
    rng = np.random.RandomState(1)
    batch = dict(
        rgb=rng.rand(3, 32, 48, 3).astype(np.float32),
        modal_x=rng.rand(3, 32, 48, 3).astype(np.float32),
        gt=rng.randint(0, 5, (3, 32, 48)).astype(np.int32),
    )
    single = Evaluator(model, variables, cfg).evaluate([batch])
    mesh = make_mesh()
    assert int(np.prod(list(mesh.shape.values()))) == 8
    sharded = Evaluator(model, variables, cfg, mesh=mesh).evaluate([batch])
    np.testing.assert_array_equal(np.asarray(single.hist),
                                  np.asarray(sharded.hist))

    s_msf = Evaluator(model, variables, cfg).evaluate_msf(
        [batch], scales=[0.75, 1.0], flip=True)
    m_msf = Evaluator(model, variables, cfg, mesh=mesh).evaluate_msf(
        [batch], scales=[0.75, 1.0], flip=True)
    np.testing.assert_array_equal(np.asarray(s_msf.hist),
                                  np.asarray(m_msf.hist))
