"""Training-report plotting (reference utils/draw.py): loss/mIoU curves from
the engine's log history, epoch-comparison grids of prediction PNGs, and
multi-page epoch-comparison decks (reference compare_inferred_masks /
draw_selected_0912, utils/draw.py:14-216 — those emit .pptx; here the deck is
a multi-page PDF, with a .pptx also written when python-pptx is importable)."""

import os
import os.path as osp
import re
from typing import Optional, Sequence


def parse_log_metrics(log_path: str):
    """Extract (epoch, loss) and (epoch, miou) series from a train log."""
    losses, mious = [], []
    loss_re = re.compile(r"epoch (\d+)/\d+ loss ([0-9.]+)")
    miou_re = re.compile(r"epoch (\d+) mIoU ([0-9.]+)")
    with open(log_path) as f:
        for line in f:
            m = loss_re.search(line)
            if m:
                losses.append((int(m.group(1)), float(m.group(2))))
            m = miou_re.search(line)
            if m:
                mious.append((int(m.group(1)), float(m.group(2))))
    return losses, mious


def plot_training_curves(log_path: str, out_png: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    losses, mious = parse_log_metrics(log_path)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    if losses:
        axes[0].plot(*zip(*losses))
    axes[0].set_title("train loss")
    axes[0].set_xlabel("epoch")
    if mious:
        axes[1].plot(*zip(*mious))
    axes[1].set_title("val mIoU")
    axes[1].set_xlabel("epoch")
    fig.tight_layout()
    os.makedirs(osp.dirname(osp.abspath(out_png)), exist_ok=True)
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return out_png


def prediction_grid(image_paths: Sequence[str], out_png: str,
                    titles: Optional[Sequence[str]] = None, cols: int = 4):
    """Tile prediction PNGs into one comparison figure
    (reference draw.py epoch-comparison decks)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.image as mpimg
    import matplotlib.pyplot as plt

    n = len(image_paths)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 2.5 * rows),
                             squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i < n:
            ax.imshow(mpimg.imread(image_paths[i]))
            if titles:
                ax.set_title(titles[i], fontsize=8)
    fig.tight_layout()
    os.makedirs(osp.dirname(osp.abspath(out_png)), exist_ok=True)
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return out_png


def _load_mask(path):
    import matplotlib.image as mpimg
    import numpy as np

    if path.endswith(".npy"):
        return np.load(path)
    return mpimg.imread(path)


def _derive_gt_path(image_path: str) -> str:
    # reference convention: images/ -> labels/, .npy mask
    # (utils/draw.py:29-30, RGBXDataset.py:143-185)
    return osp.splitext(image_path.replace("/images/", "/labels/"))[0] + ".npy"


def _polar_lidar_panel(ax_pos, fig, laser, title: str):
    """Polar front-sector lidar panel (reference draw.py:171-181)."""
    import numpy as np

    sector = np.deg2rad(45.0)
    ax = fig.add_subplot(*ax_pos, projection="polar")
    angles = np.linspace(-sector, sector, len(laser), endpoint=False)
    ax.plot(angles, laser)
    ax.set_thetamin(-45)
    ax.set_thetamax(45)
    ax.set_theta_zero_location("N")
    ax.set_title(title, fontsize=9)
    ax.set_xticks([])
    ax.set_yticks([])
    return ax


def epoch_comparison_deck(entries: Sequence[dict], epoch_dirs: Sequence,
                          out_path: str, alpha: float = 0.6,
                          overlay_color: str = "lime"):
    """Per-image epoch-comparison deck (reference compare_inferred_masks,
    utils/draw.py:14-88): one page per entry showing the RGB image, the
    ground-truth overlay, an optional lidar polar panel, and one overlay per
    epoch's predicted mask.

    entries: dicts with "image" (RGB path), optional "label" (mask .npy/png;
      derived via images/->labels/ when absent), optional "laser" (pickled
      LaserScan). epoch_dirs: (name, dir) pairs; predictions are read from
      <dir>/<image stem>.npy. out_path: .pdf target (multi-page); a sibling
      .pptx is also written when python-pptx is available.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.image as mpimg
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages
    from matplotlib.colors import ListedColormap

    epoch_dirs = list(epoch_dirs)
    cmap = ListedColormap(["#00000000", overlay_color])
    os.makedirs(osp.dirname(osp.abspath(out_path)), exist_ok=True)
    page_pngs = []
    with PdfPages(out_path) as pdf:
        for entry in entries:
            img_path = entry["image"]
            stem = osp.splitext(osp.basename(img_path))[0]
            img = mpimg.imread(img_path)
            gt_path = entry.get("label") or _derive_gt_path(img_path)
            gt = _load_mask(gt_path) if osp.exists(gt_path) else None
            laser = None
            if entry.get("laser"):
                from ..data.trav import read_lidar

                laser = read_lidar(entry["laser"])

            n_panels = 2 + (laser is not None) + len(epoch_dirs)
            cols = max(3, -(-n_panels // 2))
            fig = plt.figure(figsize=(4.5 * cols, 7))
            panel = 1

            ax = fig.add_subplot(2, cols, panel)
            panel += 1
            ax.imshow(img)
            ax.set_title("img", fontsize=9)
            ax.axis("off")

            ax = fig.add_subplot(2, cols, panel)
            panel += 1
            ax.imshow(img)
            if gt is not None:
                ax.imshow(gt, cmap=cmap, alpha=alpha)
            ax.set_title("target", fontsize=9)
            ax.axis("off")

            if laser is not None:
                _polar_lidar_panel((2, cols, panel), fig, laser, "depth")
                panel += 1

            for name, pred_dir in epoch_dirs:
                ax = fig.add_subplot(2, cols, panel)
                panel += 1
                ax.imshow(img)
                pred_path = osp.join(pred_dir, f"{stem}.npy")
                if osp.exists(pred_path):
                    ax.imshow(_load_mask(pred_path), cmap=cmap, alpha=alpha)
                    ax.set_title(name, fontsize=9)
                else:
                    ax.set_title(f"{name} (missing)", fontsize=9)
                ax.axis("off")

            fig.suptitle(img_path, fontsize=8)
            fig.tight_layout()
            pdf.savefig(fig)
            png = osp.join(osp.dirname(osp.abspath(out_path)),
                           f"_deck_{stem}.png")
            fig.savefig(png, dpi=100)
            page_pngs.append(png)
            plt.close(fig)

    try:  # optional .pptx alongside, matching the reference's output format
        from pptx import Presentation
        from pptx.util import Inches

        prs = Presentation()
        blank = prs.slide_layouts[6]
        for png in page_pngs:
            slide = prs.slides.add_slide(blank)
            slide.shapes.add_picture(png, Inches(0.1), Inches(0.1),
                                     width=Inches(9.8))
        prs.save(osp.splitext(out_path)[0] + ".pptx")
    except ImportError:
        pass
    return out_path


def deck_from_csv(csv_path: str, epoch_dirs: Sequence, out_path: str,
                  alpha: float = 0.6):
    """Deck over a Trav CSV manifest (reference draw.py:26-34 reads df2.csv
    with img/laser columns)."""
    import pandas as pd

    df = pd.read_csv(csv_path, index_col=0)
    img_col = "image" if "image" in df.columns else "img"
    laser_col = ("laser" if "laser" in df.columns
                 else "depth" if "depth" in df.columns else None)
    entries = []
    for _, row in df.iterrows():
        e = {"image": row[img_col]}
        if "label" in df.columns:
            e["label"] = row["label"]
        if laser_col and isinstance(row[laser_col], str):
            e["laser"] = row[laser_col]
        entries.append(e)
    return epoch_comparison_deck(entries, epoch_dirs, out_path, alpha=alpha)
