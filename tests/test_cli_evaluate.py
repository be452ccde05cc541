"""End-to-end CLI integration: sp3d-evaluate's main() over a fabricated
mini Panoptic dataset (reference pickle layout + real image files on disk)
and a fabricated reference .pth.tar checkpoint (convert-on-load).

This drives the exact composition the real-data parity runbook runs
(README "Real-data parity runbook"; ref: tools/evaluate.py:46-153):
  cfg yaml -> dataset pickle -> image read/warp -> backbone -> rootnet ->
  posenet -> dataset.evaluate AP/MPJPE table + predictions dump.
Weights are random (converted from a fabricated torch state dict), so the
assertions are structural — the composition runs, metrics are well-formed,
the dump carries per-frame predictions — not accuracy claims.
"""

import os
import pickle
import sys

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from tests.torch_oracles import TorchPoseResNet, TorchV2V

V = 3
J = 15
ORIG_W, ORIG_H = 480, 270
N_FRAMES = 2


def _person_pose(root, rs):
    """A plausible 15-joint skeleton around a root (world mm)."""
    pose = np.tile(root, (J, 1)).astype(np.float32)
    pose += rs.uniform(-250, 250, (J, 3)).astype(np.float32)
    pose[:, 2] = np.clip(pose[:, 2], 50.0, 1700.0)
    return pose


@pytest.fixture(scope="module")
def mini_panoptic(tmp_path_factory):
    import cv2

    from selfpose3d_tpu.data.synthetic import ring_cameras
    from selfpose3d_tpu.geometry.cameras import project_points

    tmp = tmp_path_factory.mktemp("mini_panoptic")
    data_root = tmp / "panoptic"
    img_dir = data_root / "imgs"
    img_dir.mkdir(parents=True)
    out_dir = tmp / "out"

    cam = ring_cameras(V, image_wh=(ORIG_W, ORIG_H), seed=0)  # (1, V)
    rs = np.random.RandomState(3)

    db = []
    for f in range(N_FRAMES):
        persons = [
            _person_pose(np.array([600.0 * f - 300.0, -500.0, 900.0]), rs),
            _person_pose(np.array([-700.0, 100.0 * f - 200.0, 850.0]), rs),
        ]
        world = np.stack(persons)  # (P, J, 3)
        pix = np.asarray(
            project_points(jnp.asarray(world.reshape(1, 1, -1, 3)), cam)
        ).reshape(V, len(persons), J, 2)
        for v in range(V):
            img_path = img_dir / f"f{f}_c{v}.jpg"
            img = rs.randint(0, 255, (ORIG_H, ORIG_W, 3), np.uint8)
            cv2.imwrite(str(img_path), img)
            db.append({
                "image": str(img_path),
                "joints_2d": [pix[v, p].astype(np.float32)
                              for p in range(len(persons))],
                "joints_2d_vis": [np.ones((J, 2), np.float32)
                                  for _ in persons],
                "joints_3d": [world[p] for p in range(len(persons))],
                "joints_3d_vis": [np.ones((J, 3), np.float32)
                                  for _ in persons],
                "camera": {
                    "R": np.asarray(cam.R[0, v], np.float64),
                    "T": np.asarray(cam.T[0, v], np.float64),
                    "fx": float(cam.f[0, v, 0]),
                    "fy": float(cam.f[0, v, 1]),
                    "cx": float(cam.c[0, v, 0]),
                    "cy": float(cam.c[0, v, 1]),
                    "k": np.zeros((3, 1)),
                    "p": np.zeros((2, 1)),
                },
            })
    with open(data_root / f"group_validation_cam{V}_sub.pkl", "wb") as fh:
        pickle.dump({"sequence_list": [], "interval": 12,
                     "cam_list": list(range(V)), "db": db}, fh)

    # fabricated reference checkpoint: module.-wrapped full-model layout
    # (the released cam5 stage-file format, ref tools/train_3d.py:150-180)
    sd = {}
    for k, v in TorchPoseResNet(num_joints=J).state_dict().items():
        sd[f"module.backbone.{k}"] = v
    for k, v in TorchV2V(1, 1).state_dict().items():
        sd[f"module.root_net.v2v_net.{k}"] = v
    for k, v in TorchV2V(J, J).state_dict().items():
        sd[f"module.pose_net.v2v_net.{k}"] = v
    ckpt_path = tmp / "model_best.pth.tar"
    torch.save({"state_dict": sd}, str(ckpt_path))

    cfg_path = tmp / "mini_eval.yaml"
    cfg_path.write_text(f"""
BACKBONE_MODEL: pose_resnet
MODEL: multi_person_posenet_ssv
DATA_DIR: {tmp}
OUTPUT_DIR: {out_dir}
LOG_DIR: {out_dir}
WORKERS: 1
WITH_SSV: true
WITH_ATTN: false
DTYPE: float32
DATASET:
  TRAIN_DATASET: panoptic
  TEST_DATASET: panoptic
  TEST_SUBSET: validation
  ROOT: panoptic
  ROOTIDX: 2
  CAMERA_NUM: {V}
  CAMERA_NUM_TOTAL: {V}
  CAMERAS: [0, 1, 2]
NETWORK:
  IMAGE_SIZE_ORIG: [{ORIG_W}, {ORIG_H}]
  IMAGE_SIZE: [128, 64]
  HEATMAP_SIZE: [32, 16]
  SIGMA: 3
  NUM_JOINTS: {J}
  USE_GT: false
  ROOTNET_ROOTHM: true
POSE_RESNET:
  NUM_LAYERS: 50
TEST:
  BATCH_SIZE: 2
MULTI_PERSON:
  SPACE_SIZE: [8000.0, 8000.0, 2000.0]
  SPACE_CENTER: [0.0, -500.0, 800.0]
  INITIAL_CUBE_SIZE: [16, 16, 8]
  MAX_PEOPLE_NUM: 5
  THRESHOLD: -100.0
PICT_STRUCT:
  GRID_SIZE: [2000.0, 2000.0, 2000.0]
  CUBE_SIZE: [16, 16, 16]
""")
    return tmp, cfg_path, ckpt_path, out_dir


class TestEvaluateCLI:
    def test_convert_and_evaluate_end_to_end(self, mini_panoptic, monkeypatch):
        tmp, cfg_path, ckpt_path, out_dir = mini_panoptic
        from selfpose3d_tpu.cli import evaluate as eval_cli

        monkeypatch.setattr(sys, "argv", [
            "sp3d-evaluate", "--cfg", str(cfg_path),
            "--test-file", str(ckpt_path), "--platform", "cpu",
        ])
        precision = eval_cli.main()

        assert precision is not None and np.isfinite(precision)
        assert 0.0 <= precision <= 1.0

        # per-run output dir: OUTPUT_DIR/dataset/model/cfg_name
        run_dir = (
            out_dir / "panoptic" / "multi_person_posenet_ssv_50" / "mini_eval"
        )
        dump = run_dir / "predictions_dump.pkl"
        assert dump.exists(), os.listdir(run_dir)
        recs = pickle.load(open(dump, "rb"))
        assert len(recs) == N_FRAMES
        K = 5
        for r in recs:
            assert r["preds_3d"].shape == (K, J, 5)
            assert np.isfinite(r["preds_3d"]).all()
            assert r["roots_3d_pred"].shape == (K, 5)

    def test_dry_assets_preflight(self, mini_panoptic, monkeypatch):
        """--dry-assets validates dataset + checkpoint plumbing without
        running the model, and fails loudly on a wrong checkpoint."""
        tmp, cfg_path, ckpt_path, out_dir = mini_panoptic
        from selfpose3d_tpu.cli import evaluate as eval_cli

        monkeypatch.setattr(sys, "argv", [
            "sp3d-evaluate", "--cfg", str(cfg_path),
            "--test-file", str(ckpt_path), "--platform", "cpu",
            "--dry-assets",
        ])
        with pytest.raises(SystemExit) as ex:
            eval_cli.main()
        assert ex.value.code == 0

        # negative: a checkpoint missing the pose_net must fail preflight
        sd = torch.load(str(ckpt_path), map_location="cpu",
                        weights_only=False)["state_dict"]
        bad = {k: v for k, v in sd.items() if "pose_net" not in k}
        bad_path = tmp / "bad_ckpt.pth.tar"
        torch.save({"state_dict": bad}, str(bad_path))
        monkeypatch.setattr(sys, "argv", [
            "sp3d-evaluate", "--cfg", str(cfg_path),
            "--test-file", str(bad_path), "--platform", "cpu",
            "--dry-assets",
        ])
        with pytest.raises(SystemExit) as ex:
            eval_cli.main()
        assert ex.value.code == 1
