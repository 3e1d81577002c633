"""Batching + prefetch loader.

Replaces the reference's torch DataLoader worker processes
(utils/dataloader/dataloader.py:126-226) with a thread-pool decode +
double-buffered prefetch: cv2/numpy release the GIL during decode, and the
heavy augmentation work runs on device (data/augment.py), so host threads
only read files and stack arrays.

Data-parallel sharding: each batch is GLOBAL; under a mesh the train step's
in_shardings split it over the data axis (replacing DistributedSampler +
per-rank batch_size//world_size, dataloader.py:160-163). For multi-host,
`Loader(shard=(rank, world))` reads only this host's slice.
"""

import queue
import threading
from typing import Iterator, Optional

import numpy as np


class Loader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 shard=(0, 1), prefetch: int = 2, num_threads: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard = shard
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self.seed + epoch)

    def __len__(self):
        n = len(self.dataset)
        rank, world = self.shard
        n = (n + world - 1) // world if not self.drop_last else n // world
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            idx = rng.permutation(n)
        rank, world = self.shard
        return idx[rank::world]

    def _collate(self, items):
        batch = {}
        for k in items[0]:
            vals = [it[k] for it in items]
            if isinstance(vals[0], np.ndarray):
                shapes = {v.shape for v in vals}
                if len(shapes) == 1:
                    batch[k] = np.stack(vals)
                else:
                    # variable-size dataset (SUNRGBD): pad to a common
                    # canvas; per-sample true extents go in batch["hw"] for
                    # the device augment (data/augment.py true_hw)
                    maxs = tuple(max(v.shape[d] for v in vals)
                                 for d in range(vals[0].ndim))
                    out = np.zeros((len(vals),) + maxs, vals[0].dtype)
                    if vals[0].dtype != np.uint8:  # labels pad as ignore
                        out[...] = 255
                    for i, v in enumerate(vals):
                        out[(i,) + tuple(slice(0, s) for s in v.shape)] = v
                    batch[k] = out
                    batch.setdefault("hw", np.asarray(
                        [[v.shape[0], v.shape[1]] for v in vals], np.int32))
            else:
                batch[k] = vals
        return batch

    def __iter__(self) -> Iterator[dict]:
        from concurrent.futures import ThreadPoolExecutor

        idx = self._indices()
        nb = len(idx) // self.batch_size if self.drop_last else \
            (len(idx) + self.batch_size - 1) // self.batch_size
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            # per-ITEM parallel decode: cv2/PNG decode releases the GIL, so
            # num_threads items decode concurrently (the reference uses 16
            # DataLoader worker processes, dataloader.py:126-177; a serial
            # per-item loop here fed only ~3 bs8 480x640 batches/s against
            # the train step's 6.7/s consumption; measured post-fix
            # 108.6 img/s = 13.6 bs8 batches/s sustained — BENCH_NOTES
            # 2026-08-19 pipeline_bench loader-only)
            with ThreadPoolExecutor(self.num_threads) as pool:
                try:
                    for b in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(
                            self.dataset.__getitem__, [int(i) for i in b]))
                        q.put(self._collate(items))
                finally:
                    q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


class NativeBatchLoader:
    """Batch loader backed by the C++ decode pool (data/native_loader.py):
    pipelined double-buffered decode of fixed-canvas RGBX datasets straight
    into reusable uint8 batch buffers — zero Python in the decode path.

    Requires every image to decode at the dataset canvas (cfg.image_height/
    width), which holds for NYUDepthv2; fall back to Loader otherwise."""

    def __init__(self, dataset, batch_size: int, hw, shuffle=False,
                 drop_last=False, seed=0, shard=(0, 1), num_threads=4):
        from dformer_tpu.data.native_loader import NativeLoader

        self.dataset = dataset
        self.batch_size = batch_size
        self.hw = hw
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard = shard
        self.epoch = 0
        self._nl = NativeLoader(num_threads)

    set_epoch = Loader.set_epoch
    __len__ = Loader.__len__
    _indices = Loader._indices

    def _paths(self, index):
        """(rgb_path, gt_path, x_path) for a dataset item (RGBXDataset)."""
        import os.path as osp

        item = self.dataset._name(index).split("\t")
        item[-1] = item[-1].strip()
        s = self.dataset._s
        return (osp.join(s["rgb_root"], item[0].replace("RGB/", "")),
                osp.join(s["gt_root"], item[-1].replace("Label/", "")),
                osp.join(s["x_root"], item[-1].replace("Label/", "")))

    def __iter__(self):
        from dformer_tpu.data.datasets import gt_transform

        idx = self._indices()
        nb = len(idx) // self.batch_size if self.drop_last else \
            (len(idx) + self.batch_size - 1) // self.batch_size
        H, W = self.hw
        B = self.batch_size
        # two buffer sets -> decode batch k+1 while batch k trains
        bufs = [dict(rgb=np.empty((B, H, W, 3), np.uint8),
                     gt=np.empty((B, H, W, 1), np.uint8),
                     x=np.empty((B, H, W, 1), np.uint8)) for _ in range(2)]

        def submit(k):
            rows = idx[k * B:(k + 1) * B]
            paths = [self._paths(int(i)) for i in rows]
            slot = bufs[k % 2]
            n = len(rows)
            t1 = self._nl.submit([p[0] for p in paths], slot["rgb"][:n], True)
            t2 = self._nl.submit([p[1] for p in paths], slot["gt"][:n], False)
            t3 = self._nl.submit([p[2] for p in paths], slot["x"][:n], False)
            return (t1, t2, t3, n, slot)

        pending = submit(0) if nb else None
        for k in range(nb):
            t1, t2, t3, n, slot = pending
            pending = submit(k + 1) if k + 1 < nb else None
            for t in (t1, t2, t3):
                self._nl.wait(t)
            gt = slot["gt"][:n, ..., 0].astype(np.int32)
            if self.dataset._s["transform_gt"]:
                gt = gt_transform(gt)
            x = np.repeat(slot["x"][:n], 3, axis=-1)
            yield dict(rgb=slot["rgb"][:n].copy(), gt=gt, modal_x=x,
                       fn=[str(i) for i in idx[k * B:(k + 1) * B]])


def train_batches(cfg, dataset_cls=None, shard=(0, 1), synthetic: bool = False,
                  native: bool = False):
    """Factory mirroring get_train_loader (dataloader.py:126-177): epoch
    length = batch_size * niters_per_epoch via oversampling; under
    multi-host, each host loads batch_size // world rows per step (reference
    per-rank split, dataloader.py:160-163) and the Trainer concatenates the
    slices into the global batch (parallel/mesh.commit_global). native=True
    uses the C++ decode pool (fixed-canvas datasets only)."""
    from dformer_tpu.data.datasets import RGBXDataset, SyntheticRGBXDataset

    rank, world = shard
    assert cfg.batch_size % world == 0, (
        f"batch_size {cfg.batch_size} not divisible by world {world}")
    local_bs = cfg.batch_size // world
    file_length = cfg.batch_size * cfg.niters_per_epoch
    if synthetic:
        ds = SyntheticRGBXDataset(cfg.num_train_imgs,
                                  (cfg.image_height, cfg.image_width),
                                  cfg.num_classes, file_length=file_length)
    else:
        ds = (dataset_cls or RGBXDataset)(_data_setting(cfg), "train",
                                          file_length=file_length)
        if native:
            from dformer_tpu.data import native_loader

            if native_loader.available():
                return NativeBatchLoader(
                    ds, local_bs,
                    (cfg.image_height, cfg.image_width), shuffle=True,
                    drop_last=True, seed=cfg.get("seed", 0), shard=shard)
    return Loader(ds, local_bs, shuffle=True, drop_last=True,
                  seed=cfg.get("seed", 0), shard=shard)


def val_batches(cfg, dataset_cls=None, batch_size: int = 1, shard=(0, 1),
                synthetic: bool = False, n: Optional[int] = None):
    from dformer_tpu.data.datasets import RGBXDataset, SyntheticRGBXDataset

    if synthetic:
        ds = SyntheticRGBXDataset(n or cfg.num_eval_imgs,
                                  (cfg.image_height, cfg.image_width),
                                  cfg.num_classes)
    else:
        ds = (dataset_cls or RGBXDataset)(_data_setting(cfg), "val")
    return Loader(ds, batch_size, shuffle=False, drop_last=False, shard=shard)


def _data_setting(cfg):
    return dict(
        rgb_root=cfg.rgb_root_folder, rgb_format=cfg.rgb_format,
        gt_root=cfg.gt_root_folder, gt_format=cfg.gt_format,
        transform_gt=cfg.gt_transform, x_root=cfg.x_root_folder,
        x_format=cfg.x_format, x_single_channel=cfg.x_is_single_channel,
        class_names=cfg.class_names, train_source=cfg.train_source,
        eval_source=cfg.eval_source,
    )
