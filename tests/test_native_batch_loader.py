"""NativeBatchLoader end-to-end over a tiny on-disk RGBX dataset."""

import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dformer_tpu.data import native_loader
from dformer_tpu.data.datasets import RGBXDataset
from dformer_tpu.data.loader import NativeBatchLoader


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    if not native_loader.available():
        pytest.skip(f"native loader unavailable: {native_loader._LIB_ERR}")
    root = tmp_path_factory.mktemp("nyu")
    for sub in ("RGB", "Label", "Depth"):
        (root / sub).mkdir()
    rng = np.random.RandomState(0)
    names = []
    for i in range(5):
        rgb = rng.randint(0, 256, (32, 48, 3), np.uint8)
        gt = rng.randint(0, 41, (32, 48), np.uint8)
        depth = rng.randint(0, 256, (32, 48), np.uint8)
        cv2.imwrite(str(root / "RGB" / f"{i}.png"), rgb)
        cv2.imwrite(str(root / "Label" / f"{i}.png"), gt)
        cv2.imwrite(str(root / "Depth" / f"{i}.png"), depth)
        names.append(f"RGB/{i}.png\tLabel/{i}.png")
    (root / "train.txt").write_text("\n".join(names) + "\n")
    setting = dict(
        rgb_root=str(root / "RGB"), gt_root=str(root / "Label"),
        x_root=str(root / "Depth"), transform_gt=True, x_single_channel=True,
        rgb_format=".png", gt_format=".png", x_format=".png",
        class_names=list(range(40)),
        train_source=str(root / "train.txt"),
        eval_source=str(root / "train.txt"),
    )
    return setting


def test_native_batches_match_python_reader(mini_dataset):
    ds = RGBXDataset(mini_dataset, "train")
    native = NativeBatchLoader(ds, 2, (32, 48))
    batches = list(native)
    assert len(batches) == 3
    assert batches[0]["rgb"].shape == (2, 32, 48, 3)
    assert batches[-1]["rgb"].shape == (1, 32, 48, 3)

    # byte-identical to the cv2-based python reader
    item0 = ds[0]
    np.testing.assert_array_equal(batches[0]["rgb"][0], item0["rgb"])
    np.testing.assert_array_equal(batches[0]["gt"][0], item0["gt"])
    np.testing.assert_array_equal(batches[0]["modal_x"][0], item0["modal_x"])
    # gt transform applied (0 -> 255)
    assert batches[0]["gt"].max() <= 255 and batches[0]["gt"].min() >= 0
