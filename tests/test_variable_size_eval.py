"""Variable-size (SUNRGBD-style) evaluation parity.

The reference evaluates mixed-shape datasets one image at a time at each
image's true extent (utils/train.py:162 forces val batch=1 per GPU for
SUNRGBD; the val_mm.py:324-470 MSF loop then sees exact geometries). Our
Loader._collate pads mixed-shape batches to a canvas and records per-sample
extents in batch["hw"]; Evaluator._true_extent_batches must crop each sample
back to its true shape so logits are NEVER computed over pad pixels.

Oracle: the reference MSF+flip loop (torch F.interpolate, bs=1 per image)
run per image at its true extent — same pattern as test_eval_parity.py.
"""

import math

import numpy as np
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from dformer_tpu.config import AttrDict
from dformer_tpu.data.loader import Loader
from dformer_tpu.eval.evaluate import Evaluator
from tests.test_eval_parity import FakeSeg


class _ListDataset:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _t_resize(x_np_nhwc, size, align):
    t = torch.from_numpy(x_np_nhwc.transpose(0, 3, 1, 2))
    t = tF.interpolate(t, size=size, mode="bilinear", align_corners=align)
    return t.numpy().transpose(0, 2, 3, 1)


def _reference_msf_hist(model, variables, items, scales, flip, num_classes):
    """Reference evaluate_msf per image at its true extent (val_mm.py:
    359-397 with the bs=1 loop the reference uses for SUNRGBD)."""
    hist = np.zeros((num_classes, num_classes), np.int64)
    for it in items:
        rgb = it["rgb"][None]
        modal = it["modal_x"][None]
        gt = it["gt"][None]
        H, W = gt.shape[1:3]
        acc = np.zeros((1, H, W, num_classes), np.float32)
        for scale in scales:
            nh = int(math.ceil(int(scale * H) / 32)) * 32
            nw = int(math.ceil(int(scale * W) / 32)) * 32
            r = _t_resize(rgb, (nh, nw), True)
            m = _t_resize(modal, (nh, nw), True)
            logits = np.asarray(model.apply(variables, jnp.asarray(r),
                                            jnp.asarray(m)))
            logits = _t_resize(logits, (H, W), True)
            acc += np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
            if flip:
                rf, mf = r[:, :, ::-1].copy(), m[:, :, ::-1].copy()
                logits = np.asarray(model.apply(variables, jnp.asarray(rf),
                                                jnp.asarray(mf)))[:, :, ::-1]
                logits = _t_resize(logits.copy(), (H, W), True)
                acc += np.asarray(
                    jax.nn.softmax(jnp.asarray(logits), axis=-1))
        pred = acc.argmax(-1)
        keep = gt != 255
        hist += np.bincount(
            (gt[keep] * num_classes + pred[keep]).astype(np.int64),
            minlength=num_classes * num_classes
        ).reshape(num_classes, num_classes)
    return hist


def _mixed_items(seed=0):
    rng = np.random.RandomState(seed)
    shapes = [(32, 48), (24, 40), (32, 48)]  # two share a geometry
    items = []
    for h, w in shapes:
        items.append(dict(
            rgb=rng.rand(h, w, 3).astype(np.float32),
            modal_x=rng.rand(h, w, 3).astype(np.float32),
            gt=rng.randint(0, 5, (h, w)).astype(np.int32),
        ))
    return items


def _setup():
    cfg = AttrDict(num_classes=5, background=255, eval_crop_size=[16, 24],
                   eval_stride_rate=2 / 3, dataset_name="SUNRGBD")
    model = FakeSeg(num_classes=5)
    rgb = jnp.zeros((1, 32, 48, 3))
    variables = model.init(jax.random.PRNGKey(0), rgb, rgb)
    return cfg, model, variables


def test_mixed_shape_msf_matches_reference_bs1_loop():
    cfg, model, variables = _setup()
    items = _mixed_items()
    scales, flip = [0.75, 1.0, 1.25], True

    want = _reference_msf_hist(model, variables, items, scales, flip,
                               cfg.num_classes)

    # drive the REAL collate path: one mixed-shape batch of 3 -> canvas+hw
    loader = Loader(_ListDataset(items), batch_size=3)
    batches = list(loader)
    assert len(batches) == 1 and "hw" in batches[0], \
        "collate should pad mixed shapes and record hw"

    ev = Evaluator(model, variables, cfg)
    m = ev.evaluate_msf(batches, scales=scales, flip=flip)
    np.testing.assert_array_equal(np.asarray(m.hist), want)

    from dformer_tpu.ops.metrics import iou_from_hist

    _, want_miou = iou_from_hist(want)
    _, got_miou = m.compute_iou()
    assert got_miou == want_miou


def test_mixed_shape_single_scale_matches_per_image():
    cfg, model, variables = _setup()
    items = _mixed_items(seed=1)

    # per-image oracle at true extents
    hist = np.zeros((5, 5), np.int64)
    for it in items:
        logits = model.apply(variables, jnp.asarray(it["rgb"][None]),
                             jnp.asarray(it["modal_x"][None]))
        pred = np.asarray(jnp.argmax(logits, -1))[0]
        keep = it["gt"] != 255
        hist += np.bincount(
            (it["gt"][keep] * 5 + pred[keep]).astype(np.int64),
            minlength=25).reshape(5, 5)

    loader = Loader(_ListDataset(items), batch_size=3)
    m = Evaluator(model, variables, cfg).evaluate(list(loader))
    np.testing.assert_array_equal(np.asarray(m.hist), hist)


def test_batch_bucketing_pads_to_pow2_and_hist_is_exact():
    """A group of 3 same-geometry samples is padded to the 4-bucket (last
    sample repeated, gt pad = ignore) — the histogram must still equal the
    per-image oracle, and save hooks must see only the 3 real predictions."""
    cfg, model, variables = _setup()
    rng = np.random.RandomState(3)
    items = []
    for i in range(3):
        items.append(dict(
            rgb=rng.rand(32, 48, 3).astype(np.float32),
            modal_x=rng.rand(32, 48, 3).astype(np.float32),
            gt=rng.randint(0, 5, (32, 48)).astype(np.int32),
            fn=f"img_{i}",
        ))

    hist = np.zeros((5, 5), np.int64)
    for it in items:
        logits = model.apply(variables, jnp.asarray(it["rgb"][None]),
                             jnp.asarray(it["modal_x"][None]))
        pred = np.asarray(jnp.argmax(logits, -1))[0]
        keep = it["gt"] != 255
        hist += np.bincount(
            (it["gt"][keep] * 5 + pred[keep]).astype(np.int64),
            minlength=25).reshape(5, 5)

    # mixed batch (3 + 1 other geometry) so the hw path engages
    items.append(dict(
        rgb=rng.rand(24, 40, 3).astype(np.float32),
        modal_x=rng.rand(24, 40, 3).astype(np.float32),
        gt=np.full((24, 40), 255, np.int32),  # all-ignore: hist contributes 0
        fn="img_3",
    ))
    loader = Loader(_ListDataset(items), batch_size=4)
    ev = Evaluator(model, variables, cfg)

    grouped = list(ev._true_extent_batches(list(loader)))
    by_nb = {g["nb"]: g for g in grouped}
    assert by_nb[3]["rgb"].shape[0] == 4, "group of 3 pads to the 4-bucket"
    assert np.all(np.asarray(by_nb[3]["gt"])[3] == 255), \
        "gt pad must be the ignore label"

    seen = []
    m = ev.evaluate(list(loader),
                    save_hook=lambda preds, b: seen.append(
                        (preds.shape[0], list(b["fn"]))))
    np.testing.assert_array_equal(np.asarray(m.hist), hist)
    assert sorted(n for n, _ in seen) == [1, 3], \
        "hooks see true counts, not bucket sizes"


def test_executable_reuse_across_group_sizes_and_batches():
    """Same-geometry groups of different sizes must share executables via the
    pow2 bucket (VERDICT r3: compile count was unbounded in group size), and
    a second pass over the val set must compile NOTHING new."""
    cfg, model, variables = _setup()
    rng = np.random.RandomState(4)

    def mk(n, h, w):
        return [dict(rgb=rng.rand(h, w, 3).astype(np.float32),
                     modal_x=rng.rand(h, w, 3).astype(np.float32),
                     gt=rng.randint(0, 5, (h, w)).astype(np.int32))
                for _ in range(n)]

    # batch 1: groups of 3 and 1; batch 2: groups of 4 and 4 — same two
    # geometries throughout, group sizes {3,4}->bucket 4 and {1}->bucket 1
    b1 = list(Loader(_ListDataset(mk(3, 32, 48) + mk(1, 24, 40)),
                     batch_size=4))
    b2 = list(Loader(_ListDataset(mk(4, 32, 48) + mk(4, 24, 40)),
                     batch_size=8))

    ev = Evaluator(model, variables, cfg)
    scales, flip = [0.75, 1.0], True

    def n_exec():
        # real executable count: _jitted keys don't include batch size, the
        # per-shape signatures live inside each jit's cache
        return sum(f._cache_size() for f in ev._jitted.values())

    ev.evaluate_msf(b1, scales=scales, flip=flip)
    n1 = n_exec()
    ev.evaluate_msf(b2, scales=scales, flip=flip)
    n2 = n_exec()
    # bound: geometries(2) x buckets(<=2) x (scales x flip)(4) + hist per
    # (geometry, bucket)(<=4); the 32x48@bucket4 programs from b1 (group of
    # 3 -> bucket 4) must be REUSED verbatim by b2's groups of 4
    progs = len(scales) * 2
    assert n2 <= 2 * 2 * progs + 4, f"compile count {n2} unbounded"
    assert n2 - n1 <= progs + 1, \
        "b2 may add only the one new (24x40, bucket-4) geometry's programs"
    ev.evaluate_msf(b2, scales=scales, flip=flip)
    assert n_exec() == n2, "second pass must compile nothing"


def test_tail_of_flushed_geometry_reuses_cap_programs():
    """Round 5: once a geometry has flushed a full `cap` group, its tail
    pads to the cap (programs already compiled — zero new executables)
    instead of a fresh pow2 bucket; an unflushed geometry still pow2-pads.
    Histogram must equal the per-image oracle either way."""
    cfg, model, variables = _setup()
    rng = np.random.RandomState(6)

    def item(h, w):
        return dict(rgb=rng.rand(h, w, 3).astype(np.float32),
                    modal_x=rng.rand(h, w, 3).astype(np.float32),
                    gt=rng.randint(0, 5, (h, w)).astype(np.int32))

    # two mixed canvas batches: A=(32,48) x3 + B=(24,40) x1 each ->
    # cap=4; A flushes one full group (6 >= 4, tail 2), B never (2 < 4)
    def canvas_batch(items):
        H = max(i["rgb"].shape[0] for i in items)
        W = max(i["rgb"].shape[1] for i in items)
        b = dict(rgb=np.zeros((len(items), H, W, 3), np.float32),
                 modal_x=np.zeros((len(items), H, W, 3), np.float32),
                 gt=np.full((len(items), H, W), 255, np.int32),
                 hw=np.asarray([[i["rgb"].shape[0], i["rgb"].shape[1]]
                                for i in items], np.int32))
        for i, it in enumerate(items):
            h, w = it["rgb"].shape[:2]
            b["rgb"][i, :h, :w] = it["rgb"]
            b["modal_x"][i, :h, :w] = it["modal_x"]
            b["gt"][i, :h, :w] = it["gt"]
        return b

    items = [item(32, 48) for _ in range(6)] + [item(24, 40), item(24, 40)]
    batches = [canvas_batch(items[0:3] + items[6:7]),
               canvas_batch(items[3:6] + items[7:8])]

    ev = Evaluator(model, variables, cfg)
    groups = list(ev._true_extent_batches(batches))
    sizes = sorted((g["gt"].shape[1], g["gt"].shape[0], g["nb"])
                   for g in groups)
    assert sizes == [(24, 2, 2), (32, 4, 2), (32, 4, 4)], \
        "A tail (nb=2) pads to cap 4; unflushed B (nb=2) pow2-pads to 2"

    hist = np.zeros((5, 5), np.int64)
    for it in items:
        logits = model.apply(variables, jnp.asarray(it["rgb"][None]),
                             jnp.asarray(it["modal_x"][None]))
        pred = np.asarray(jnp.argmax(logits, -1))[0]
        keep = it["gt"] != 255
        hist += np.bincount(
            (it["gt"][keep] * 5 + pred[keep]).astype(np.int64),
            minlength=25).reshape(5, 5)

    m = ev.evaluate(batches)
    np.testing.assert_array_equal(np.asarray(m.hist), hist)
    try:
        n = sum(f._cache_size() for f in ev._jitted.values())
    except AttributeError:
        n = None
    if n is not None:
        assert n == 2, f"expected 2 executables (A@4 shared by tail, B@2), got {n}"


def test_true_extent_save_hook_gets_cropped_preds():
    """save_hook must see true-extent predictions and the matching subset of
    per-sample metadata (fn) for each geometry group."""
    cfg, model, variables = _setup()
    items = _mixed_items(seed=2)
    for i, it in enumerate(items):
        it["fn"] = f"img_{i}"
    loader = Loader(_ListDataset(items), batch_size=3)

    seen = []

    def hook(preds, batch):
        seen.append((preds.shape, list(batch["fn"])))

    Evaluator(model, variables, cfg).evaluate(list(loader), save_hook=hook)
    # group 1: imgs 0 and 2 at 32x48; group 2: img 1 at 24x40
    shapes = {s for s, _ in seen}
    assert shapes == {(2, 32, 48), (1, 24, 40)}
    fns = sorted(fn for _, f in seen for fn in f)
    assert fns == ["img_0", "img_1", "img_2"]
