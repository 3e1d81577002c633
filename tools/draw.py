#!/usr/bin/env python
"""Report drawing CLI — counterpart of reference utils/draw.py: training
curves from a log, prediction grids, and per-image epoch-comparison decks
(multi-page PDF; .pptx too when python-pptx is installed)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_epoch_dirs(specs):
    """"name=dir" pairs, or bare dirs (name = basename)."""
    out = []
    for s in specs:
        name, _, d = s.partition("=")
        if not d:
            name, d = os.path.basename(s.rstrip("/")), s
        out.append((name, d))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("curves", help="loss/mIoU curves from a train log")
    p.add_argument("log")
    p.add_argument("--out", default="output/curves.png")

    p = sub.add_parser("grid", help="tile prediction PNGs into one figure")
    p.add_argument("images", nargs="+")
    p.add_argument("--out", default="output/grid.png")
    p.add_argument("--cols", type=int, default=4)

    p = sub.add_parser("deck", help="per-image epoch-comparison deck "
                       "(reference compare_inferred_masks/draw_selected_0912)")
    p.add_argument("--csv", required=True,
                   help="manifest with image/img (+ optional label, laser)")
    p.add_argument("--epochs", nargs="+", required=True,
                   help="prediction dirs as name=dir (or bare dirs); "
                   "each holds <image-stem>.npy masks")
    p.add_argument("--out", default="output/deck.pdf")
    p.add_argument("--alpha", type=float, default=0.6)

    args = ap.parse_args()
    from dformer_tpu.eval import draw

    if args.cmd == "curves":
        print(draw.plot_training_curves(args.log, args.out))
    elif args.cmd == "grid":
        print(draw.prediction_grid(args.images, args.out, cols=args.cols))
    else:
        print(draw.deck_from_csv(args.csv, _parse_epoch_dirs(args.epochs),
                                 args.out, alpha=args.alpha))


if __name__ == "__main__":
    main()
