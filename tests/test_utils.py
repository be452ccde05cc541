"""Tests for zipreader and flip utilities."""

import os
import zipfile

import numpy as np
import pytest

from selfpose3d_tpu.utils.flip import flip_back, fliplr_joints, flip_pairs_from_order
from selfpose3d_tpu.utils import zipreader


class TestFlip:
    def test_flip_back_roundtrip(self, rng):
        hm = rng.rand(2, 4, 8, 10).astype(np.float32)
        pairs = [(1, 2)]
        once = flip_back(hm, pairs)
        twice = flip_back(once, pairs)
        np.testing.assert_allclose(twice, hm)

    def test_fliplr_joints(self, rng):
        joints = rng.rand(4, 2) * 100
        vis = np.ones((4, 2))
        fl, flv = fliplr_joints(joints.copy(), vis.copy(), 100, [(0, 1)])
        assert fl[0, 0] == pytest.approx(100 - joints[1, 0] - 1)
        assert fl[1, 0] == pytest.approx(100 - joints[0, 0] - 1)

    def test_pairs_from_order(self):
        order = [0, 1, 2, 9, 10, 11, 12, 13, 14, 3, 4, 5, 6, 7, 8]
        pairs = flip_pairs_from_order(order)
        assert (3, 9) in pairs and (8, 14) in pairs
        assert all(a < b for a, b in pairs)
        assert len(pairs) == 6


class TestZipReader:
    def test_roundtrip(self, tmp_path, rng):
        import cv2

        img = (rng.rand(16, 20, 3) * 255).astype(np.uint8)
        png = cv2.imencode(".png", img)[1].tobytes()
        zpath = tmp_path / "archive.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            z.writestr("imgs/a.png", png)
        uri = f"{zpath}@imgs/a.png"
        assert zipreader.is_zip_path(uri)
        out = zipreader.imread(uri)
        np.testing.assert_array_equal(out, img)

    def test_imread_any_plain_file(self, tmp_path, rng):
        import cv2

        img = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
        p = str(tmp_path / "x.png")
        cv2.imwrite(p, img)
        out = zipreader.imread_any(p)
        np.testing.assert_array_equal(out, img)
