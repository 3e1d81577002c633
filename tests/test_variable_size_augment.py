"""Variable-size (SUNRGBD-style) batches: canvas padding in the collate and
per-sample true-extent handling in the device augment."""

import numpy as np

import jax
import jax.numpy as jnp

from dformer_tpu.data.augment import device_train_augment, scale_crop_sample
from dformer_tpu.data.loader import Loader

RNG = np.random.RandomState(0)


class VarSizeDataset:
    sizes = [(40, 56), (32, 48), (44, 60)]

    def __len__(self):
        return 3

    def set_epoch(self, seed):
        pass

    def __getitem__(self, i):
        h, w = self.sizes[i]
        return dict(rgb=RNG.randint(0, 256, (h, w, 3), np.uint8),
                    gt=RNG.randint(0, 5, (h, w)).astype(np.int32),
                    modal_x=RNG.randint(0, 256, (h, w, 3), np.uint8))


def test_collate_pads_to_canvas_with_extents():
    batch = next(iter(Loader(VarSizeDataset(), 3)))
    assert batch["rgb"].shape == (3, 44, 60, 3)
    assert batch["gt"].shape == (3, 44, 60)
    np.testing.assert_array_equal(batch["hw"],
                                  [[40, 56], [32, 48], [44, 60]])
    # gt pad is ignore (255), image pad is 0
    assert batch["gt"][1, 40, 0] == 255
    assert batch["rgb"][1, 40, 0, 0] == 0


def test_device_augment_respects_true_extent():
    batch = next(iter(Loader(VarSizeDataset(), 3)))
    out_hw = (32, 48)
    r, g, x = device_train_augment(
        jnp.asarray(batch["rgb"]), jnp.asarray(batch["gt"]),
        jnp.asarray(batch["modal_x"]), jax.random.PRNGKey(0), out_hw,
        (1.0,), jnp.asarray([0.5] * 3), jnp.asarray([0.25] * 3),
        jnp.asarray([0.5] * 3), jnp.asarray([0.25] * 3),
        true_hw=jnp.asarray(batch["hw"]))
    assert r.shape == (3, 32, 48, 3) and g.shape == (3, 32, 48)
    # sample 1 is exactly out_hw at scale 1: crop covers the full valid
    # extent; no 255-pad should appear beyond what the gt itself contains
    g = np.asarray(g)
    assert set(np.unique(g[1])).issubset(set(range(5)))


def test_canvas_sample_matches_unpadded_sample():
    """scale_crop_sample on a padded canvas with true_hw equals the same op
    on the unpadded image."""
    img = RNG.rand(32, 48, 3).astype(np.float32)
    canvas = np.zeros((44, 60, 3), np.float32)
    canvas[:32, :48] = img
    args = (jnp.float32(1.25), (jnp.float32(3), jnp.float32(5)), (32, 48),
            0.0)
    want = np.asarray(scale_crop_sample(jnp.asarray(img), *args))
    got = np.asarray(scale_crop_sample(
        jnp.asarray(canvas), *args,
        true_hw=(jnp.float32(32), jnp.float32(48))))
    np.testing.assert_allclose(got, want, atol=1e-5)
