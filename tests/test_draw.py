"""Report drawing: training curves, prediction grids, and the epoch-comparison
deck (reference utils/draw.py compare_inferred_masks / draw_selected_0912)."""

import os
import os.path as osp
import pickle

import numpy as np

from dformer_tpu.eval import draw


def _count_pdf_pages(path):
    data = open(path, "rb").read()
    # each page object carries "/Type /Page"; "/Pages" is the tree node
    return data.count(b"/Type /Page") - data.count(b"/Type /Pages")


def _write_fixture(root):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img_dir = osp.join(root, "images")
    lab_dir = osp.join(root, "labels")
    os.makedirs(img_dir)
    os.makedirs(lab_dir)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        img = rng.uniform(size=(24, 32, 3)).astype(np.float32)
        img_path = osp.join(img_dir, f"im{i}.png")
        plt.imsave(img_path, img)
        np.save(osp.join(lab_dir, f"im{i}.npy"),
                (rng.uniform(size=(24, 32)) > 0.5).astype(np.uint8))
        laser_path = osp.join(root, f"laser{i}.pkl")
        with open(laser_path, "wb") as f:
            pickle.dump({"ranges": rng.uniform(0.2, 5.0, 1080).tolist()}, f)
        rows.append((img_path, laser_path))
    return rows


def test_epoch_comparison_deck(tmp_path):
    root = str(tmp_path / "data")
    rows = _write_fixture(root)
    rng = np.random.default_rng(1)
    epoch_dirs = []
    for name in ("epoch-2", "epoch-5"):
        d = str(tmp_path / name)
        os.makedirs(d)
        for img_path, _ in rows:
            stem = osp.splitext(osp.basename(img_path))[0]
            np.save(osp.join(d, f"{stem}.npy"),
                    (rng.uniform(size=(24, 32)) > 0.5).astype(np.uint8))
        epoch_dirs.append((name, d))

    entries = [dict(image=i, laser=l) for i, l in rows]
    out = draw.epoch_comparison_deck(
        entries, epoch_dirs, str(tmp_path / "out" / "deck.pdf"))
    assert osp.exists(out)
    assert _count_pdf_pages(out) == len(rows)


def test_deck_from_csv(tmp_path):
    import pandas as pd

    root = str(tmp_path / "data")
    rows = _write_fixture(root)
    d = str(tmp_path / "ep")
    os.makedirs(d)
    # predictions intentionally missing for one image: panel says "missing"
    for img_path, _ in rows[:2]:
        stem = osp.splitext(osp.basename(img_path))[0]
        np.save(osp.join(d, f"{stem}.npy"), np.ones((24, 32), np.uint8))
    csv = str(tmp_path / "df.csv")
    pd.DataFrame({"img": [r[0] for r in rows],
                  "laser": [r[1] for r in rows]}).to_csv(csv)
    out = draw.deck_from_csv(csv, [("ep", d)], str(tmp_path / "deck.pdf"))
    assert _count_pdf_pages(out) == len(rows)


def test_curves_and_grid(tmp_path):
    log = tmp_path / "train.log"
    log.write_text("x INFO epoch 1/5 loss 3.9357 (390.5s)\n"
                   "x INFO epoch 1 mIoU 41.32 mAcc 52.5 mF1 55.64\n"
                   "x INFO epoch 2/5 loss 2.1 (390.5s)\n"
                   "x INFO epoch 2 mIoU 44.10 mAcc 53.5 mF1 56.00\n")
    out = draw.plot_training_curves(str(log), str(tmp_path / "curves.png"))
    assert osp.exists(out)

    rows = _write_fixture(str(tmp_path / "data"))
    out = draw.prediction_grid([r[0] for r in rows],
                               str(tmp_path / "grid.png"),
                               titles=["a", "b", "c"], cols=2)
    assert osp.exists(out)
