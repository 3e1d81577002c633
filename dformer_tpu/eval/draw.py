"""Training-report plotting (reference utils/draw.py, minus the pptx decks):
loss/mIoU curves from the engine's log history and epoch-comparison grids of
prediction PNGs."""

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
