"""Prediction colorization + saving (reference utils/val_mm.py:399-457 and
utils/visualize.py).

The NYU/SUNRGBD palette is generated procedurally with the VOC-style
bit-interleave colormap (the same construction as RGBXDataset.
get_class_colors, RGBXDataset.py:121-140) instead of shipping the
reference's nyucmap.npy binary.
"""

import os
import pathlib

import numpy as np

KITTI_PALETTE = np.array([
    [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
    [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
    [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
    [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100], [0, 80, 100],
    [0, 0, 230], [119, 11, 32]], dtype=np.uint8)

MFNET_PALETTE = np.array([
    [0, 0, 0], [64, 0, 128], [64, 64, 0], [0, 128, 192], [0, 0, 192],
    [128, 128, 0], [64, 64, 128], [192, 128, 128], [192, 64, 0]],
    dtype=np.uint8)


def voc_colormap(n: int = 256) -> np.ndarray:
    """Bit-interleave colormap (VOC convention)."""
    cmap = np.zeros((n, 3), dtype=np.uint8)
    for i in range(n):
        r = g = b = 0
        cid = i
        for j in range(8):
            r |= ((cid >> 0) & 1) << (7 - j)
            g |= ((cid >> 1) & 1) << (7 - j)
            b |= ((cid >> 2) & 1) << (7 - j)
            cid >>= 3
        cmap[i] = (r, g, b)
    return cmap


def palette_for(cfg) -> np.ndarray:
    name = cfg.get("dataset_name", "")
    if name in ("KITTI-360", "EventScape"):
        return KITTI_PALETTE
    if name == "MFNet":
        return MFNET_PALETTE
    return voc_colormap(max(cfg.num_classes + 1, 41))


def save_pred_png(pred: np.ndarray, path: str, palette: np.ndarray):
    import cv2

    colored = palette[np.clip(pred, 0, len(palette) - 1)]
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor(colored, cv2.COLOR_RGB2BGR))


def make_save_hook(cfg, save_dir: str):
    """Hook for Evaluator: colorize argmax predictions and save PNGs
    (val_mm.py:399-457 semantics)."""
    palette = palette_for(cfg)

    def hook(preds: np.ndarray, batch: dict):
        fns = batch.get("fn") or [str(i) for i in range(len(preds))]
        for i, pred in enumerate(preds):
            name = str(fns[i]).replace(".jpg", "").replace(".png", "") \
                .replace("datasets/", "")
            save_pred_png(pred.astype(np.uint8),
                          os.path.join(save_dir, name + "_pred.png"), palette)
    return hook


def print_iou(ious, accs, class_names, logger=None):
    """Tabular per-class report (reference utils/visualize.py print_iou)."""
    lines = ["%-22s IoU     Acc" % "class"]
    for name, iou, acc in zip(class_names, ious, accs):
        lines.append("%-22s %-7.2f %-7.2f" % (str(name), iou, acc))
    out = "\n".join(lines)
    (logger.info if logger else print)(out)
    return out
