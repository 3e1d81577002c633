#!/usr/bin/env python
"""Generate a synthetic ON-DISK NYUDepthv2-shaped dataset (real JPEG/PNG
encode) so the input pipeline can be measured end-to-end without the real
data mount: RGB/*.jpg, Label/*.png (class+1 encoding, 0 = invalid, matching
gt_transform semantics), Depth/*.png 8-bit, train.txt/test.txt.

Images are low-frequency random fields (upsampled coarse noise + fine grain)
so JPEG files land in the realistic 60-150 KB range — pure white noise
inflates files 5x and overstates decode cost; flat fields understate it.

Usage: python tools/make_synth_dataset.py --root /tmp/synth_nyu \
           [--n-train 795] [--n-val 64]
Then:  DFORMER_DATA_ROOT=/tmp/synth_nyu python tools/train.py \
           --config=local_configs.NYUDepthv2.DFormer_Large ...
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def _field(rng, hw, coarse=(30, 40), channels=3):
    """Natural-ish image: bicubic-upsampled coarse noise + light grain."""
    import cv2

    base = rng.rand(*coarse, channels).astype(np.float32)
    img = cv2.resize(base, (hw[1], hw[0]), interpolation=cv2.INTER_CUBIC)
    if channels == 1 and img.ndim == 2:
        img = img[..., None]
    img = img + rng.normal(0, 0.04, img.shape).astype(np.float32)
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def _label(rng, hw, num_classes, coarse=(15, 20)):
    """Blobby label map in the ON-DISK encoding: class index + 1, a few
    zero (invalid) blobs — gt_transform shifts down and maps 0 -> 255."""
    import cv2

    base = rng.randint(0, num_classes + 1, coarse).astype(np.uint8)  # 0=inv
    return cv2.resize(base, (hw[1], hw[0]), interpolation=cv2.INTER_NEAREST)


def generate(root, n_train=795, n_val=64, hw=(480, 640), num_classes=40,
             seed=0, quiet=False):
    import cv2

    ds = osp.join(root, "NYUDepthv2")
    for sub in ("RGB", "Label", "Depth"):
        os.makedirs(osp.join(ds, sub), exist_ok=True)
    rng = np.random.RandomState(seed)
    names = {"train": [], "test": []}
    sizes = []
    for split, n in (("train", n_train), ("test", n_val)):
        for i in range(n):
            name = f"{split}_{i:05d}"
            rgb = _field(rng, hw, channels=3)
            dep = _field(rng, hw, coarse=(24, 32), channels=1)
            lab = _label(rng, hw, num_classes)
            cv2.imwrite(osp.join(ds, "RGB", name + ".jpg"), rgb,
                        [cv2.IMWRITE_JPEG_QUALITY, 90])
            cv2.imwrite(osp.join(ds, "Label", name + ".png"), lab)
            cv2.imwrite(osp.join(ds, "Depth", name + ".png"), dep[..., 0])
            sizes.append(os.path.getsize(osp.join(ds, "RGB", name + ".jpg")))
            # split files use the reference's "RGB/<n>.jpg\tLabel/<n>.png"
            # two-column form (RGBXDataset strips the prefixes)
            names[split].append(f"RGB/{name}.jpg\tLabel/{name}.png")
    with open(osp.join(ds, "train.txt"), "w") as f:
        f.write("\n".join(names["train"]) + "\n")
    with open(osp.join(ds, "test.txt"), "w") as f:
        f.write("\n".join(names["test"]) + "\n")
    if not quiet:
        print(f"wrote {n_train}+{n_val} imgs to {ds}; "
              f"median jpg {int(np.median(sizes)) // 1024} KB")
    return ds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_nyu")
    ap.add_argument("--n-train", type=int, default=795)
    ap.add_argument("--n-val", type=int, default=64)
    args = ap.parse_args()
    generate(args.root, args.n_train, args.n_val)


if __name__ == "__main__":
    main()
