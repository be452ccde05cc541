"""Data layer tests: targets, collate, loaders, synthetic datasets,
pseudo-label pipeline."""

import json
import os
import pickle

import numpy as np
import pytest

from selfpose3d_tpu.config import load_config
from selfpose3d_tpu.data.loader import PrefetchLoader, collate_branch
from selfpose3d_tpu.data.synthetic_dataset import SyntheticSceneDataset
from selfpose3d_tpu.data.targets import (
    generate_3d_target,
    generate_input_heatmap,
    generate_target_heatmap,
)


def tiny_cfg():
    return load_config(overrides={
        "DATASET": {"TRAIN_DATASET": "synthetic", "CAMERA_NUM": 2,
                    "ROT_FACTOR1": 20, "ROT_FACTOR2": 20,
                    "SCALE_FACTOR1": 0.2, "SCALE_FACTOR2": 0.2},
        "NETWORK": {"NUM_JOINTS": 15, "IMAGE_SIZE": [128, 64],
                    "HEATMAP_SIZE": [32, 16], "SIGMA": 2},
        "MULTI_PERSON": {"INITIAL_CUBE_SIZE": [8, 8, 4], "MAX_PEOPLE_NUM": 5},
    })


class TestTargets:
    def test_target_heatmap_peak(self, rng):
        joints = [np.array([[64.0, 32.0]] * 15)]
        vis = [np.ones((15, 3))]
        t, w = generate_target_heatmap(joints, vis, (128, 64), (32, 16), 2.0, 15)
        assert t.shape == (15, 16, 32)
        # peak at the joint's heatmap cell
        assert t[0, 8, 16] == pytest.approx(1.0)
        assert w.sum() == 15

    def test_invisible_joints_skipped(self):
        joints = [np.array([[64.0, 32.0]] * 15)]
        vis = [np.zeros((15, 3))]
        t, w = generate_target_heatmap(joints, vis, (128, 64), (32, 16), 2.0, 15)
        assert t.max() == 0 and w.sum() == 0

    def test_input_heatmap_confidence(self):
        joints = [np.concatenate([np.full((15, 2), 32.0), np.full((15, 1), 0.5)], 1)]
        t = generate_input_heatmap(joints, (128, 64), (32, 16), 2.0)
        assert t.max() == pytest.approx(0.5, abs=1e-6)

    def test_3d_target(self):
        t = generate_3d_target(
            [np.array([0.0, -500.0, 800.0])],
            (8000, 8000, 2000), (0, -500, 800), (80, 80, 20),
        )
        assert t.shape == (80, 80, 20)
        assert t.max() <= 1.0 and t.max() > 0.5  # ~voxel-pitch from the root


class TestSyntheticDataset:
    def test_frame_and_collate(self):
        cfg = tiny_cfg()
        ds = SyntheticSceneDataset(cfg, "train", True, num_frames=8)
        f = ds.get_frame(0, load_images=True)
        assert len(f["views"]) == 2
        br = collate_branch([ds.get_frame(i)["views"] for i in (0, 1)])
        assert br.views.shape[0] == 2 and br.views.shape[1] == 2
        assert br.target_2d.shape == (2, 2, 16, 32, 15)
        assert br.cam.R.shape == (2, 2, 3, 3)
        assert int(br.num_person[0]) >= 1

    def test_ssv_frame_branches_differ(self):
        cfg = tiny_cfg()
        ds = SyntheticSceneDataset(cfg, "train", True, num_frames=4)
        b1, b2, b3 = ds.get_ssv_frame(0, seed=1)
        t1 = b1[0]["trans"]
        t3 = b3[0]["trans"]
        assert not np.allclose(t1, t3)  # aug1 is rotated/scaled; branch3 not

    def test_evaluate_protocol_roundtrip(self):
        cfg = tiny_cfg()
        ds = SyntheticSceneDataset(cfg, "validation", False, num_frames=4)
        preds, roots = [], []
        for i in range(4):
            poses = ds._frame_poses(i)
            P = poses.shape[0]
            pr = np.zeros((P, 15, 5))
            pr[:, :, :3] = poses
            pr[:, :, 3] = 0.0
            pr[:, :, 4] = 0.9
            preds.append(pr)
            rt = np.zeros((P, 5))
            rt[:, :3] = poses[:, ds.root_id]
            rt[:, 3] = 0.0
            rt[:, 4] = 0.9
            roots.append(rt)
        m = ds.evaluate(preds, roots)
        assert m["aps"][0] == pytest.approx(1.0, abs=1e-3)
        assert m["mpjpe"] == pytest.approx(0.0, abs=1e-6)
        assert m["mpjpe_root"] == pytest.approx(0.0, abs=1e-6)


class TestPrefetchLoader:
    def test_order_and_content(self):
        loader = PrefetchLoader(
            20, 4, lambda idxs: list(idxs), shuffle=False, num_workers=3
        )
        batches = list(loader)
        assert len(batches) == 5
        assert batches[0] == [0, 1, 2, 3]
        assert batches[-1] == [16, 17, 18, 19]

    def test_shuffles_by_epoch(self):
        loader = PrefetchLoader(
            16, 4, lambda idxs: list(idxs), shuffle=True, num_workers=2, seed=1
        )
        e1 = [tuple(b) for b in loader]
        e2 = [tuple(b) for b in loader]
        assert e1 != e2

    def test_error_propagation(self):
        def boom(idxs):
            raise RuntimeError("bad batch")

        loader = PrefetchLoader(4, 2, boom, num_workers=2)
        with pytest.raises(RuntimeError, match="bad batch"):
            list(loader)


class TestPseudoLabelPipeline:
    def test_full_pipeline(self, tmp_path, rng):
        from selfpose3d_tpu.pseudo_labels import pipeline as P

        # fabricate a 2-record train DB
        db = {
            "interval": 3,
            "cam_list": [(0, 3)],
            "sequence_list": ["seq"],
            "db": [
                {"key": f"k{i}", "image": f"img{i}.jpg",
                 "camera": {"R": np.eye(3)}} for i in range(2)
            ],
        }
        db_path = tmp_path / "db.pkl"
        pickle.dump(db, open(db_path, "wb"))

        img_list = tmp_path / "images.json"
        P.create_image_list(
            str(db_path), str(img_list),
            image_sizes={f"img{i}.jpg": (1080, 1920) for i in range(2)},
        )

        # fake detections: 2 good, 1 low-score, 1 non-person
        dets = [
            {"image_id": 0, "category_id": 1, "score": 0.9,
             "bbox": [100, 100, 200, 400], "keypoints": [150.0, 150.0, 0.9] * 17},
            {"image_id": 1, "category_id": 1, "score": 0.8,
             "bbox": [50, 50, 100, 300], "keypoints": [80.0, 80.0, 0.8] * 17},
            {"image_id": 1, "category_id": 1, "score": 0.3,
             "bbox": [0, 0, 10, 10], "keypoints": [0.0] * 51},
            {"image_id": 0, "category_id": 2, "score": 0.99,
             "bbox": [0, 0, 10, 10], "keypoints": [0.0] * 51},
        ]
        det_path = tmp_path / "dets.json"
        json.dump(dets, open(det_path, "w"))
        bbox_json = tmp_path / "bboxes.json"
        out = P.create_pseudo_bboxes(str(img_list), str(det_path), str(bbox_json))
        assert len(out["annotations"]) == 2

        # fake HRNet keypoints matching ann ids
        kps = [
            {"original_id": 1, "keypoints": [150.0, 200.0, 0.9] * 17,
             "center": [200, 300], "scale": [1, 2]},
            {"original_id": 2, "keypoints": [90.0, 90.0, 0.7] * 17,
             "center": [100, 200], "scale": [1, 2]},
        ]
        kp_path = tmp_path / "kps.json"
        json.dump(kps, open(kp_path, "w"))
        merged_path = tmp_path / "merged.json"
        merged = P.merge_keypoints(str(bbox_json), str(kp_path), str(merged_path))
        assert all(a["delete"] == 0 for a in merged["annotations"])
        assert merged["annotations"][0]["num_keypoints"] == 17

        paths = P.create_db_pickles(str(db_path), str(merged_path), str(tmp_path))
        assert len(paths) == 4
        hard = pickle.load(open(paths["hrnet_hard"], "rb"))
        assert len(hard["db"]) == 2
        rec = hard["db"][0]
        assert len(rec["joints_2d"]) == 1  # one person on image 0
        assert rec["joints_2d"][0].shape == (15, 2)
        # neck synthesized as shoulder midpoint: both at same fake coords
        np.testing.assert_allclose(rec["joints_2d"][0][0], [150.0, 200.0])
