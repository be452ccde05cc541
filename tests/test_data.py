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

    def test_host_projection_matches_device_camera(self):
        """The host data path projects with the numpy camera twin (the jax
        projection cost ~5 s/step over the axon tunnel); pin it against
        the device camera model on the dataset's own ring cameras so the
        two can never drift (ref: lib/utils/cameras_cpu.py vs cameras.py)."""
        import jax
        import jax.numpy as jnp

        from selfpose3d_tpu.geometry.cameras import project_points

        cfg = tiny_cfg()
        ds = SyntheticSceneDataset(cfg, "train", True, num_frames=4)
        poses = ds._frame_poses(2)
        P, J, _ = poses.shape
        for v in range(cfg.DATASET.CAMERA_NUM):
            host = ds._project(poses, v)
            cam_v = jax.tree.map(lambda x: x[0, v], ds._cam_params)
            dev = np.asarray(
                project_points(jnp.asarray(poses.reshape(P * J, 3)), cam_v)
            ).reshape(P, J, 2)
            np.testing.assert_allclose(host, dev, atol=2e-3)

    def test_rendered_images_carry_signal(self):
        """SYNTH_IMAGE_MODE='render' draws stick figures at the augmented
        projected joints: energy concentrates at joint pixels, the render
        is deterministic per frame, and targets are unchanged vs noise
        mode (only the image differs)."""
        import dataclasses

        cfg = tiny_cfg()
        cfg_r = dataclasses.replace(
            cfg, DATASET=dataclasses.replace(
                cfg.DATASET, SYNTH_IMAGE_MODE="render")
        )
        ds_n = SyntheticSceneDataset(cfg, "train", True, num_frames=4)
        ds_r = SyntheticSceneDataset(cfg_r, "train", True, num_frames=4)
        vn = ds_n.get_frame(1, load_images=True)["views"][0]
        vr = ds_r.get_frame(1, load_images=True)["views"][0]
        vr2 = ds_r.get_frame(1, load_images=True)["views"][0]

        np.testing.assert_array_equal(vr["image"], vr2["image"])
        np.testing.assert_array_equal(vr["target_2d"], vn["target_2d"])
        np.testing.assert_array_equal(vr["joints"], vn["joints"])

        img = vr["image"]
        h, w = img.shape[:2]
        n = int(vr["num_person"])
        joint_vals, hit = [], 0
        for p in range(n):
            for j in range(15):
                if vr["joints_vis"][p, j, 0] > 0:
                    x, y = vr["joints"][p, j]
                    xi, yi = int(round(x)), int(round(y))
                    if 0 <= xi < w and 0 <= yi < h:
                        joint_vals.append(img[yi, xi].max())
                        hit += 1
        assert hit >= 10
        # joints are bright, the background noise floor is dim
        assert np.mean(joint_vals) > 0.5
        assert np.median(img) < 0.1

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


def _fake_panoptic_ssv(cfg, n_frames=3, root_xy=(960.0, 540.0)):
    """A PanopticSSVDataset over an in-memory DB (no pickles on disk)."""
    from selfpose3d_tpu.data.panoptic_ssv import PanopticSSVDataset

    ds = PanopticSSVDataset.__new__(PanopticSSVDataset)
    ds.cfg = cfg
    ds.root_id = cfg.DATASET.ROOTIDX
    ds.num_joints = cfg.NETWORK.NUM_JOINTS
    ds.max_people = cfg.MULTI_PERSON.MAX_PEOPLE_NUM
    ds.camera_num_total = cfg.DATASET.CAMERA_NUM
    ds.cameras_sel = list(range(cfg.DATASET.CAMERA_NUM))
    ds.min_views_check = cfg.MIN_VIEWS_CHECK
    ds.rot1, ds.rot2 = cfg.DATASET.ROT_FACTOR1, cfg.DATASET.ROT_FACTOR2
    ds.scale1, ds.scale2 = cfg.DATASET.SCALE_FACTOR1, cfg.DATASET.SCALE_FACTOR2
    ds.flip = cfg.DATASET.FLIP
    ds.apply_randaug = ds.apply_cutout = False
    ds._randaug = None
    J = ds.num_joints
    cam = {
        "R": np.eye(3), "T": np.zeros((3, 1)), "fx": 1000.0, "fy": 1000.0,
        "cx": 960.0, "cy": 540.0, "k": np.zeros((3, 1)), "p": np.zeros((2, 1)),
    }
    rs = np.random.RandomState(0)
    db = []
    for _ in range(n_frames):
        for _ in range(ds.camera_num_total):
            j2 = np.tile(np.array(root_xy), (J, 1)) + rs.uniform(-30, 30, (J, 2))
            db.append({
                "image": "/nonexistent.jpg",
                "joints_2d": [j2.astype(np.float32)],
                "joints_2d_vis": [np.ones((J, 2), np.float32)],
                "joints_3d": [np.zeros((J, 3), np.float32)],
                "camera": cam,
            })
    ds.db = db
    ds.db_size = len(db)
    return ds


class TestSSVRejectionResampling:
    def test_fallback_never_identical(self, monkeypatch):
        """When rejection resampling exhausts its budget, the fallback must
        still emit DISTINCT augmentations (VERDICT r1 weak #4: identical
        branches trivially satisfy the consistency losses; the reference
        loops indefinitely, ref JointsDatasetSSV.py:168-340)."""
        from selfpose3d_tpu.data.panoptic_ssv import PanopticSSVDataset

        ds = _fake_panoptic_ssv(tiny_cfg())
        monkeypatch.setattr(
            PanopticSSVDataset, "_roots_visible",
            lambda self, recs, trans, hflip: False,
        )
        b1, b2, b3 = ds.get_ssv_frame(0, seed=1, load_images=False, max_retries=8)
        t1, t2, t3 = b1[0]["trans"], b2[0]["trans"], b3[0]["trans"]
        assert not np.allclose(t1, t2)
        assert not np.allclose(t1, t3)
        assert not np.allclose(t2, t3)

    def test_damping_converges_on_picky_frames(self, monkeypatch):
        """Progressive magnitude damping converges: a visibility check that
        only accepts near-identity rotations eventually passes with a
        genuinely accepted (non-fallback) draw."""
        from selfpose3d_tpu.data.panoptic_ssv import PanopticSSVDataset

        ds = _fake_panoptic_ssv(tiny_cfg())
        real = PanopticSSVDataset._roots_visible

        def picky(self, recs, trans, hflip):
            return abs(trans[0, 1]) < 2e-3 and real(self, recs, trans, hflip)

        monkeypatch.setattr(PanopticSSVDataset, "_roots_visible", picky)
        b1, _, _ = ds.get_ssv_frame(0, seed=3, load_images=False, max_retries=300)
        assert abs(b1[0]["trans"][0, 1]) < 2e-3

    def test_accepts_visible_frames_first_try(self):
        ds = _fake_panoptic_ssv(tiny_cfg())
        b1, b2, b3 = ds.get_ssv_frame(0, seed=0, load_images=False)
        assert not np.allclose(b1[0]["trans"], b3[0]["trans"])
        assert b1[0]["joints"].shape == (ds.max_people, ds.num_joints, 2)


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

    def test_multihost_stripes_are_disjoint_and_complete(self):
        """Per-host input sharding (SURVEY §2.7): hosts see disjoint data
        covering the dataset, with identical shuffles across hosts."""
        seen = []
        for pi in range(3):
            loader = PrefetchLoader(
                20, 4, lambda idxs: list(idxs), shuffle=True, seed=7,
                num_workers=2, process_index=pi, process_count=3,
            )
            host = [i for b in loader for i in b]
            seen.append(host)
        flat = [i for h in seen for i in h]
        assert sorted(flat) == list(range(20))  # disjoint + complete
        assert len(seen[0]) == 7 and len(seen[2]) == 6  # remainder split

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


class TestPseudoLabelVisualization:
    """s6/s8 headless overlay stages (ref: s6_vis_pseudo_kpt2d.py,
    s8_vis_compare_pseudo_kpt2d.py)."""

    def _merged_json(self, tmp_path):
        data = {
            "images": [
                {"id": i, "key": f"k{i}", "file_name": f"missing{i}.jpg",
                 "width": 64, "height": 48} for i in range(3)
            ],
            "annotations": [
                {"image_id": i, "id": i, "bbox": [4, 4, 30, 30], "score": 0.9,
                 "keypoints": [float(8 + j), float(6 + j), 0.9]
                 * 1 + [v for j2 in range(16) for v in
                        (float(10 + j2), float(8 + j2), 0.9)]}
                for i, j in zip(range(3), range(3))
            ],
        }
        p = tmp_path / "merged.json"
        json.dump(data, open(p, "w"))
        return p

    def test_s6_overlay_writes_images(self, tmp_path):
        from selfpose3d_tpu.pseudo_labels.visualize import vis_pseudo_kpt2d

        p = self._merged_json(tmp_path)
        out = vis_pseudo_kpt2d(str(p), str(tmp_path), str(tmp_path / "vis"),
                               num_samples=2)
        assert len(out) == 2
        import cv2

        img = cv2.imread(out[0])
        assert img is not None and img.shape == (48, 64, 3)
        assert img.max() > 0  # something was drawn on the black canvas

    def test_s8_compare_writes_composites(self, tmp_path, rng):
        from selfpose3d_tpu.pseudo_labels.visualize import (
            vis_compare_pseudo_kpt2d,
        )

        def mk_db(jitter):
            recs = []
            for i in range(2):
                j2d = [rng.rand(15, 2).astype(np.float32) * 40 + jitter]
                vis = [np.ones((15, 3), np.float32)]
                recs.append({
                    "key": f"k{i}", "image": f"missing{i}.jpg",
                    "width": 64, "height": 48,
                    "joints_2d": j2d, "joints_2d_vis": vis,
                })
            return {"db": recs}

        gt_p, ps_p = tmp_path / "gt.pkl", tmp_path / "ps.pkl"
        pickle.dump(mk_db(0.0), open(gt_p, "wb"))
        pickle.dump(mk_db(2.0), open(ps_p, "wb"))
        out = vis_compare_pseudo_kpt2d(
            str(gt_p), str(ps_p), str(tmp_path), str(tmp_path / "cmp"),
            num_samples=2,
        )
        assert len(out) == 2
        import cv2

        img = cv2.imread(out[0])
        assert img is not None and img.shape == (48, 128, 3)  # side by side
        assert img.max() > 0


class TestShelfCampusSSV:
    """Exercise the shelf/campus SSL dataset against a fabricated
    *_mmpose.pkl + calibration json in the reference's released schema
    (ref: lib/dataset/shelf_ssv.py:132-160,280-307 — per-view records with
    variable person counts and 14..17-joint 2D predictions)."""

    def _fabricate(self, tmp_path, J=14, V=3, frames=4):
        rs = np.random.RandomState(0)
        db = []
        for f in range(frames):
            for v in range(V):
                npersons = 1 + (f + v) % 3
                db.append({
                    "key": f"shelf_{f}",
                    "image": f"Camera{v}/img_{f:06d}.png",
                    "joints_2d": [
                        (rs.rand(J, 2) * [700, 500] + 100).astype(np.float64)
                        for _ in range(npersons)
                    ],
                    "joints_2d_vis": [
                        np.ones((J, 3), np.float64) for _ in range(npersons)
                    ],
                })
        pickle.dump({"db": db}, open(tmp_path / "shelf_mmpose.pkl", "wb"))
        calib = {
            str(v): {
                "R": np.eye(3).tolist(),
                "T": [[100.0 * v], [0.0], [0.0]],
                "fx": 1000.0, "fy": 1000.0, "cx": 512.0, "cy": 384.0,
                "k": [[0.0], [0.0], [0.0]], "p": [[0.0], [0.0]],
            }
            for v in range(V)
        }
        json.dump(calib, open(tmp_path / "calibration_shelf.json", "w"))

    def test_get_ssv_frame_from_mmpose_schema(self, tmp_path):
        from selfpose3d_tpu.config import load_config
        from selfpose3d_tpu.data.panoptic_ssv import ShelfCampusSSVDataset

        J, V = 14, 3
        self._fabricate(tmp_path, J=J, V=V)
        cfg = load_config(overrides={
            "DATA_DIR": str(tmp_path),
            "NETWORK": {
                "NUM_JOINTS": J, "IMAGE_SIZE": [800, 608],
                "HEATMAP_SIZE": [200, 152], "IMAGE_SIZE_ORIG": [1032, 776],
                "SIGMA": 3,
            },
            "DATASET": {
                "ROOT": "", "CAMERA_NUM": V, "CAMERA_NUM_TOTAL": V,
                "CAMERAS": list(range(V)), "ROOTIDX": 2,
                "ROT_FACTOR1": 20.0, "ROT_FACTOR2": 20.0,
                "SCALE_FACTOR1": 0.2, "SCALE_FACTOR2": 0.2,
            },
            "MULTI_PERSON": {"MAX_PEOPLE_NUM": 5},
        })
        ds = ShelfCampusSSVDataset(cfg, "shelf")
        assert len(ds) == 4
        b1, b2, b3 = ds.get_ssv_frame(1, seed=3, load_images=False)
        for b in (b1, b2, b3):  # per-view item lists
            assert len(b) == V
            for item in b:
                assert item["target_2d"].shape == (152, 200, J)
                assert item["joints"].shape == (5, J, 2)
                assert np.isfinite(item["trans"]).all()
                assert item["num_person"] >= 1
        # the two augmented branches differ
        assert not np.allclose(b1[0]["trans"], b2[0]["trans"])


class TestSSVEvaluateProtocol:
    def test_ssv_split_evaluate_is_pose_only(self):
        """The SSV train split's evaluate is pose-only AP (ref:
        lib/dataset/panoptic_ssv.py:282-335) — roots passed by a shared
        caller must be dropped, unlike the base Panoptic protocol which
        reports root metrics when given roots."""
        cfg = tiny_cfg()
        ds = _fake_panoptic_ssv(cfg, n_frames=2)
        J = ds.num_joints
        for rec in ds.db:  # the eval protocol needs 3D visibility flags
            rec["joints_3d_vis"] = [np.ones((J, 3), np.float32)]
        gt_num = ds.db_size // ds.camera_num_total
        preds, roots = [], []
        for i in range(gt_num):
            rec = ds.db[ds.camera_num_total * i]
            pr = np.zeros((1, J, 5))
            pr[0, :, :3] = rec["joints_3d"][0]
            pr[0, :, 4] = 0.9
            preds.append(pr)
            rt = np.zeros((1, 5))
            rt[0, :3] = rec["joints_3d"][0][ds.root_id]
            rt[0, 4] = 0.9
            roots.append(rt)
        m = ds.evaluate(preds, roots=roots)
        assert "aps" in m
        assert "aps_root" not in m and "mpjpe_root" not in m
        # base protocol with the same inputs does report root metrics
        from selfpose3d_tpu.data.panoptic import PanopticDataset

        m_base = PanopticDataset.evaluate(ds, preds, roots=roots)
        assert "aps_root" in m_base


class TestPseudoInferenceDrivers:
    """s2/s4 drivers with fake models: the drivers own the dataset walk and
    the crop protocol; these tests pin the result-json contracts that
    s3/s5 consume (ref: s2_det2_bbox_inference.py:127-179,
    s4_hrnet_kpt2d_inference.sh:17-23)."""

    def _image_list(self, tmp_path, n=2, wh=(64, 48)):
        import cv2

        w, h = wh
        images = []
        for i in range(n):
            path = tmp_path / f"img{i}.jpg"
            img = np.zeros((h, w, 3), np.uint8)
            img[:, :, 0] = 40 * (i + 1)
            cv2.imwrite(str(path), img)
            images.append({"id": i, "file_name": f"img{i}.jpg",
                           "width": w, "height": h})
        gt = {"images": images, "annotations": [],
              "categories": [{"id": 1, "name": "person"}]}
        p = tmp_path / "image_list.json"
        json.dump(gt, open(p, "w"))
        return p

    def test_s2_to_s3_contract(self, tmp_path):
        from selfpose3d_tpu.pseudo_labels import pipeline as P
        from selfpose3d_tpu.pseudo_labels.inference import run_person_detector

        img_list = self._image_list(tmp_path)

        def fake_detector(img):
            assert img.ndim == 3 and img.shape[2] == 3
            return {
                "boxes": np.array([[4.0, 6.0, 30.0, 40.0],
                                   [0.0, 0.0, 8.0, 8.0]]),
                "scores": np.array([0.95, 0.02]),  # second below floor
                "keypoints": np.tile(
                    np.array([10.0, 12.0, 0.9]), (2, 17, 1)
                ),
            }

        out_json = tmp_path / "dets.json"
        res = run_person_detector(
            str(img_list), str(tmp_path), str(out_json), model=fake_detector
        )
        # contract: list of category-1 xywh results with 51-float keypoints
        assert len(res) == 2  # one per image; low-score filtered
        for d in res:
            assert d["category_id"] == 1
            assert len(d["bbox"]) == 4 and d["bbox"][2] == 26.0
            assert len(d["keypoints"]) == 51
        # s3 consumes it directly
        bbox_json = tmp_path / "bboxes.json"
        out = P.create_pseudo_bboxes(str(img_list), str(out_json), str(bbox_json))
        assert len(out["annotations"]) == 2
        assert out["annotations"][0]["id"] == 1

    def test_s4_to_s5_contract(self, tmp_path):
        from selfpose3d_tpu.pseudo_labels import pipeline as P
        from selfpose3d_tpu.pseudo_labels.inference import run_topdown_keypoints

        img_list = self._image_list(tmp_path)

        def fake_detector(img):
            return {"boxes": np.array([[10.0, 8.0, 50.0, 40.0]]),
                    "scores": np.array([0.9]),
                    "keypoints": np.zeros((1, 17, 3))}

        from selfpose3d_tpu.pseudo_labels.inference import run_person_detector

        det_json = tmp_path / "dets.json"
        run_person_detector(str(img_list), str(tmp_path), str(det_json),
                            model=fake_detector)
        bbox_json = tmp_path / "bboxes.json"
        P.create_pseudo_bboxes(str(img_list), str(det_json), str(bbox_json))

        crops_seen = []

        def fake_pose(crop):
            crops_seen.append(crop.shape)
            # keypoints at the crop center with high confidence
            kp = np.zeros((17, 3))
            kp[:, 0] = crop.shape[1] / 2.0
            kp[:, 1] = crop.shape[0] / 2.0
            kp[:, 2] = 0.9
            return kp

        kp_json = tmp_path / "kps.json"
        res = run_topdown_keypoints(
            str(bbox_json), str(tmp_path), str(kp_json),
            model=fake_pose, input_wh=(288, 384),
        )
        assert len(res) == 2
        assert all(s == (384, 288, 3) for s in crops_seen)
        for r in res:
            assert len(r["keypoints"]) == 51
            assert "original_id" in r and "center" in r and "scale" in r
            # crop center maps back to the bbox center (xyxy [10,8,50,40])
            kp0 = np.array(r["keypoints"]).reshape(17, 3)
            np.testing.assert_allclose(kp0[0, :2], [30.0, 24.0], atol=0.6)

        # s5 consumes it directly
        merged_json = tmp_path / "merged.json"
        merged = P.merge_keypoints(str(bbox_json), str(kp_json), str(merged_json))
        assert len(merged["annotations"]) == 2
        assert all(a["num_keypoints"] == 17 for a in merged["annotations"])


class TestEpochSeededAug:
    def test_supervised_randaug_varies_by_epoch(self, tmp_path):
        """Supervised-path RandAugment must draw differently across epochs
        (advisor r4: the per-(frame, cam) seed previously had no epoch
        component, applying identical augs every epoch — ref
        JointsDataset.py:148 draws fresh global-RNG augs each call)."""
        import cv2

        from selfpose3d_tpu.data.panoptic import PanopticDataset

        data_root = tmp_path / "panoptic"
        data_root.mkdir()
        img_path = data_root / "img.jpg"
        rs = np.random.RandomState(0)
        cv2.imwrite(str(img_path), rs.randint(0, 255, (64, 128, 3), np.uint8))
        J = 15
        rec = {
            "key": "k", "image": str(img_path),
            "joints_3d": [np.zeros((J, 3))],
            "joints_3d_vis": [np.ones((J, 3))],
            "joints_2d": [np.full((J, 2), 32.0)],
            "joints_2d_vis": [np.ones((J, 2))],
            "camera": {"R": np.eye(3), "T": np.zeros((3, 1)),
                       "fx": 100.0, "fy": 100.0, "cx": 64.0, "cy": 32.0,
                       "k": np.zeros((3, 1)), "p": np.zeros((2, 1))},
        }
        with open(data_root / "group_train_cam1_seedtest.pkl", "wb") as fh:
            pickle.dump({"interval": 3, "db": [rec]}, fh)

        cfg = load_config(overrides={
            "DATA_DIR": str(tmp_path),
            "DATASET": {"ROOT": "panoptic", "SUFFIX": "seedtest",
                        "CAMERA_NUM_TOTAL": 1, "CAMERA_NUM": 1,
                        "CAMERAS": [0], "APPLY_RANDAUG": True,
                        "APPLY_CUTOUT": True},
            "NETWORK": {"NUM_JOINTS": J, "IMAGE_SIZE": [128, 64],
                        "HEATMAP_SIZE": [32, 16], "SIGMA": 2},
        })
        ds = PanopticDataset(cfg, "train", is_train=True)
        img_e0 = ds.get_frame(0, seed=0)["views"][0]["image"]
        img_e0b = ds.get_frame(0, seed=0)["views"][0]["image"]
        img_e1 = ds.get_frame(0, seed=1)["views"][0]["image"]
        np.testing.assert_array_equal(img_e0, img_e0b)  # reproducible
        assert not np.array_equal(img_e0, img_e1)  # fresh augs per epoch


class TestMeshHelpers:
    def test_local_batch_and_rows_single_host(self):
        import jax
        import jax.numpy as jnp

        from selfpose3d_tpu.parallel.mesh import (
            batch_sharding, local_batch_size, local_rows,
            make_mesh, process_allgather_tree,
        )

        mesh = make_mesh()
        # single host: every mesh device is local -> per-host == global batch
        assert local_batch_size(None, 4) == 4
        assert local_batch_size(mesh, 2) == 2 * mesh.size

        x = np.arange(mesh.size * 3 * 5, dtype=np.float32).reshape(
            mesh.size * 3, 5
        )
        gx = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
        np.testing.assert_array_equal(local_rows(gx), x)

        t = (np.arange(4), np.ones((2, 3)))
        out = process_allgather_tree(t)  # identity on one process
        np.testing.assert_array_equal(out[0], t[0])
        np.testing.assert_array_equal(out[1], t[1])
