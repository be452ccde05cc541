"""Tests for the photometric augmentation policies."""

import numpy as np

from selfpose3d_tpu.data.randaugment import RandAugmentCutout, cutout, rand_augment


class TestRandAugment:
    def test_photometric_only_shape_preserved(self, rng):
        img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
        rs = np.random.RandomState(0)
        out = rand_augment(img, rs)
        assert out.shape == img.shape and out.dtype == np.uint8

    def test_cutout_fills_gray(self, rng):
        img = np.zeros((100, 100, 3), np.uint8)
        rs = np.random.RandomState(1)
        out = cutout(img, rs, min_holes=3, max_holes=3)
        assert (out == 127).any()
        # original untouched
        assert img.max() == 0

    def test_wrapper_deterministic_per_seed(self, rng):
        img = (rng.rand(80, 80, 3) * 255).astype(np.uint8)
        aug = RandAugmentCutout()
        a = aug(img, np.random.RandomState(7))
        b = aug(img, np.random.RandomState(7))
        np.testing.assert_array_equal(a, b)

    def test_float_input_handled(self, rng):
        img = rng.rand(32, 32, 3).astype(np.float32) * 255
        aug = RandAugmentCutout(use_randaug=False, use_cutout=True)
        out = aug(img, np.random.RandomState(2))
        assert out.dtype == np.uint8
