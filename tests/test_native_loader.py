"""Native C++ loader: build, decode parity vs cv2, async batch fill."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dformer_tpu.data import native_loader


@pytest.fixture(scope="module")
def lib_ok():
    if not native_loader.available():
        pytest.skip(f"native loader unavailable: {native_loader._LIB_ERR}")
    return True


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = {}
    # color decode parity target is cv2-native BGR (what cv2.imread returns,
    # and what the reference pipeline actually feeds its models)
    bgr = rng.randint(0, 256, (48, 64, 3), np.uint8)
    cv2.imwrite(str(d / "a.png"), bgr)
    cv2.imwrite(str(d / "a.jpg"), bgr, [cv2.IMWRITE_JPEG_QUALITY, 95])
    gray = rng.randint(0, 40, (48, 64), np.uint8)
    cv2.imwrite(str(d / "label.png"), gray)
    paths["png"] = str(d / "a.png")
    paths["jpg"] = str(d / "a.jpg")
    paths["label"] = str(d / "label.png")
    paths["bgr_array"] = bgr
    paths["gray_array"] = gray
    return paths


def test_png_decode_exact(lib_ok, images):
    nl = native_loader.NativeLoader(2)
    got = nl.decode(images["png"], want_color=True)
    np.testing.assert_array_equal(got, images["bgr_array"])
    lab = nl.decode(images["label"], want_color=False)
    np.testing.assert_array_equal(lab[..., 0], images["gray_array"])


def test_jpeg_decode_close(lib_ok, images):
    nl = native_loader.NativeLoader(2)
    got = nl.decode(images["jpg"], want_color=True)
    want = cv2.imread(images["jpg"])
    assert got.shape == want.shape
    # different IDCT paths: allow small per-pixel deviation
    assert np.mean(np.abs(got.astype(int) - want.astype(int))) < 3.0


def test_async_batch(lib_ok, images):
    nl = native_loader.NativeLoader(2)
    out = np.zeros((4, 48, 64, 3), np.uint8)
    t = nl.submit([images["png"]] * 4, out, want_color=True)
    nl.wait(t)
    for i in range(4):
        np.testing.assert_array_equal(out[i], images["bgr_array"])


def test_batch_error_on_missing_file(lib_ok, images):
    nl = native_loader.NativeLoader(2)
    out = np.zeros((2, 48, 64, 3), np.uint8)
    t = nl.submit([images["png"], "/nonexistent/x.png"], out)
    with pytest.raises(IOError):
        nl.wait(t)
