"""Pseudo-label generation for the semi-supervised Trav pipeline
(reference utils/val_mm.py:473-511 infer_unlabeled_masks): run the model on
unlabeled RGB+lidar pairs, dump argmax masks as .npy, and write a CSV
manifest usable as a labeled training source."""

import os
import os.path as osp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def infer_unlabeled_masks(model, variables, batches, save_dir: str,
                          logger=None) -> str:
    os.makedirs(save_dir, exist_ok=True)

    @jax.jit
    def forward(rgb, laser):
        logits = model.apply(variables, rgb, laser, train=False,
                             deterministic_bases=True)
        return jnp.argmax(logits, axis=-1)

    rows = []
    for batch in batches:
        masks = np.asarray(forward(batch["rgb"], batch["laser"]))
        for i in range(masks.shape[0]):
            rgb_path = batch["rgb_path"][i]
            depth_path = batch["depth_path"][i]
            name = f"{Path(rgb_path).stem}_{Path(depth_path).stem}"
            mask_path = osp.join(save_dir, f"{name}.npy")
            np.save(mask_path, masks[i].astype(np.uint8))
            rows.append(dict(image=rgb_path, depth=depth_path,
                             label=mask_path))
    import pandas as pd

    csv_path = osp.join(save_dir, "unlabeled_masks.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    if logger:
        logger.info(f"wrote {len(rows)} pseudo-labels -> {csv_path}")
    return csv_path
