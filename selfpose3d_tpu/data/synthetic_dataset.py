"""Synthetic-scene dataset: runs the full train/eval pipeline with no files.

Generates deterministic random multi-person scenes with the Panoptic camera
geometry (data/synthetic.py) and serves them through the same frame/ssv-frame
interface as PanopticDataset, so the CLI, loops, and bench can run end-to-end
in any environment. Its ``evaluate`` uses the real Panoptic AP protocol.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from selfpose3d_tpu.config import Config
from selfpose3d_tpu.data.targets import generate_3d_target, generate_target_heatmap
from selfpose3d_tpu.data.synthetic import ring_cameras, random_poses
from selfpose3d_tpu.geometry.transforms import (
    get_affine_transform_3x3,
    get_scale,
    affine_transform_point_np,
)

import jax.numpy as jnp


class SyntheticSceneDataset:
    def __init__(self, cfg: Config, image_set: str = "train", is_train: bool = True,
                 num_frames: int = 64):
        self.cfg = cfg
        self.is_train = is_train
        self.num_frames = num_frames
        self.root_id = cfg.DATASET.ROOTIDX
        self.num_joints = cfg.NETWORK.NUM_JOINTS
        self.max_people = cfg.MULTI_PERSON.MAX_PEOPLE_NUM
        self.seed_base = 0 if image_set == "train" else 10_000

        V = cfg.DATASET.CAMERA_NUM
        ow, oh = cfg.NETWORK.IMAGE_SIZE_ORIG
        cam = ring_cameras(V, image_wh=(ow, oh), seed=7)
        self._cams = []
        for v in range(V):
            self._cams.append(
                {
                    "R": np.asarray(cam.R[0, v]),
                    "T": np.asarray(cam.T[0, v]),
                    "fx": np.asarray(cam.f[0, v, 0]),
                    "fy": np.asarray(cam.f[0, v, 1]),
                    "cx": np.asarray(cam.c[0, v, 0]),
                    "cy": np.asarray(cam.c[0, v, 1]),
                    "k": np.zeros((3, 1), np.float32),
                    "p": np.zeros((2, 1), np.float32),
                }
            )
        self._cam_params = cam

    def __len__(self):
        return self.num_frames

    def _frame_poses(self, idx: int) -> np.ndarray:
        n = 1 + (idx % 3)
        return random_poses(n, self.num_joints, seed=self.seed_base + idx,
                            root_idx=self.root_id)

    def _project(self, poses: np.ndarray, v: int) -> np.ndarray:
        # Host data path: use the numpy camera twin. The jax projection
        # here cost ~5 s/step on the axon backend (every tiny op is a
        # device-tunnel round-trip), starving the chip during the
        # magnitude-curriculum runs; numpy is ~1000x cheaper per call.
        from selfpose3d_tpu.geometry.cameras_np import project_pose_np

        P, J, _ = poses.shape
        pix = project_pose_np(poses.reshape(P * J, 3), self._cams[v])
        return np.asarray(pix, np.float32).reshape(P, J, 2)

    def _build_view(self, poses, v, rot, scale_aug, hflip, with_image, rs):
        cfg = self.cfg
        img_w, img_h = cfg.NETWORK.IMAGE_SIZE
        ow, oh = cfg.NETWORK.IMAGE_SIZE_ORIG
        c = np.array([ow / 2.0, oh / 2.0])
        s = get_scale((ow, oh), (img_w, img_h)) * scale_aug
        trans3 = get_affine_transform_3x3(c, s, rot, (img_w, img_h))

        pix = self._project(poses, v)
        P_real, J = pix.shape[:2]
        joints, joints_vis = [], []
        for p in range(P_real):
            jp = np.zeros((J, 2), np.float32)
            jv = np.ones((J, 2), np.float32)
            for j in range(J):
                x, y = affine_transform_point_np(pix[p, j], trans3[:2])
                if hflip:
                    x = img_w - x - 1
                jp[j] = (x, y)
                if not (0 <= x < img_w and 0 <= y < img_h):
                    jv[j] = 0
            joints.append(jp)
            joints_vis.append(jv)

        target, weight = generate_target_heatmap(
            joints, joints_vis, (img_w, img_h), cfg.NETWORK.HEATMAP_SIZE,
            float(cfg.NETWORK.SIGMA), J,
        )
        target_3d = generate_3d_target(
            poses[:, self.root_id],
            cfg.MULTI_PERSON.SPACE_SIZE,
            cfg.MULTI_PERSON.SPACE_CENTER,
            cfg.MULTI_PERSON.INITIAL_CUBE_SIZE,
        )

        P = self.max_people
        joints_u = np.zeros((P, J, 2), np.float32)
        joints_vis_u = np.zeros((P, J, 2), np.float32)
        roots_u = np.zeros((P, 3), np.float32)
        j3_u = np.zeros((P, J, 3), np.float32)
        j3v_u = np.zeros((P, J, 3), np.float32)
        for p in range(P_real):
            joints_u[p] = joints[p]
            joints_vis_u[p] = joints_vis[p]
            roots_u[p] = poses[p, self.root_id]
            j3_u[p] = poses[p]
            j3v_u[p] = 1.0

        image = None
        if with_image:
            if self.cfg.DATASET.SYNTH_IMAGE_MODE == "render":
                image = self._render_image(
                    joints, joints_vis, (img_w, img_h), rs
                )
            else:
                image = rs.rand(img_h, img_w, 3).astype(np.float32)

        return {
            "image": image,
            "target_2d": target.transpose(1, 2, 0),
            "weights_2d": weight,
            "target_3d": target_3d,
            "trans": trans3.astype(np.float32),
            "orig_wh": np.array([ow, oh], np.float32),
            "camera": self._cams[v],
            "joints": joints_u,
            "joints_vis": joints_vis_u,
            "joints_3d": j3_u,
            "joints_3d_vis": j3v_u,
            "roots_3d": roots_u,
            "num_person": P_real,
            "hflip": hflip,
        }

    # joint-type color table: distinct, fixed hues so the backbone can
    # recover joint identity from appearance (built once per process)
    _JOINT_COLORS = None

    @classmethod
    def _joint_colors(cls, J: int) -> np.ndarray:
        if cls._JOINT_COLORS is None or len(cls._JOINT_COLORS) != J:
            hues = np.linspace(0.0, 1.0, J, endpoint=False)
            # simple HSV->RGB at s=1, v=1
            i = (hues * 6).astype(int) % 6
            f = hues * 6 - np.floor(hues * 6)
            rgb = np.zeros((J, 3), np.float32)
            for j in range(J):
                p, q, t = 0.15, 1 - f[j] * 0.85, 0.15 + f[j] * 0.85
                rgb[j] = [
                    (1, q, p, p, t, 1)[i[j]],
                    (t, 1, 1, q, p, p)[i[j]],
                    (p, p, t, 1, 1, q)[i[j]],
                ]
            cls._JOINT_COLORS = rgb
        return cls._JOINT_COLORS

    def _render_image(self, joints, joints_vis, img_wh, rs) -> np.ndarray:
        """Stick-figure render at the AUGMENTED projected joints (post
        affine/flip, so every SSV branch sees the same scene under its own
        geometry — the consistency signal the SSV losses assume). Joint
        blobs carry per-joint-type colors and limbs connect visible pairs;
        a low-amplitude noise floor keeps the backbone from keying on
        exact zeros."""
        import cv2

        from selfpose3d_tpu.utils.vis import PANOPTIC_LIMBS

        w, h = img_wh
        img = (rs.rand(h, w, 3).astype(np.float32)) * 0.08
        J = self.num_joints
        colors = self._joint_colors(J)
        rad = max(1, round(min(w, h) / 48))
        thick = max(1, round(min(w, h) / 96))
        for jp, jv in zip(joints, joints_vis):
            for a, b in PANOPTIC_LIMBS:
                if a < J and b < J and jv[a, 0] > 0 and jv[b, 0] > 0:
                    col = ((colors[a] + colors[b]) / 2 * 0.6).tolist()
                    cv2.line(
                        img,
                        (int(round(jp[a, 0])), int(round(jp[a, 1]))),
                        (int(round(jp[b, 0])), int(round(jp[b, 1]))),
                        col, thick, lineType=cv2.LINE_AA,
                    )
            for j in range(len(jp)):
                if jv[j, 0] > 0:
                    cv2.circle(
                        img,
                        (int(round(jp[j, 0])), int(round(jp[j, 1]))),
                        rad, colors[j].tolist(), -1, lineType=cv2.LINE_AA,
                    )
        return np.clip(img, 0.0, 1.0)

    def get_frame(
        self, idx: int, load_images: bool = True, seed: int = 0
    ) -> Dict:
        poses = self._frame_poses(idx)
        rs = np.random.RandomState(seed * 99991 + idx)
        views = [
            self._build_view(poses, v, 0.0, 1.0, False, load_images, rs)
            for v in range(self.cfg.DATASET.CAMERA_NUM)
        ]
        return {"views": views, "frame_idx": idx}

    def get_ssv_frame(self, idx: int, seed: int = 0, load_images: bool = True):
        poses = self._frame_poses(idx)
        rs = np.random.RandomState(seed * 99991 + idx)
        c = self.cfg

        def branch(rot_factor, scale_factor, allow_flip):
            rot = rs.uniform(-rot_factor, rot_factor) if rot_factor else 0.0
            sc = 1.0 + (rs.uniform(-scale_factor, scale_factor) if scale_factor else 0.0)
            fl = bool(allow_flip and c.DATASET.FLIP and rs.rand() < 0.5)
            return [
                self._build_view(poses, v, rot, sc, fl, load_images, rs)
                for v in range(c.DATASET.CAMERA_NUM)
            ]

        b1 = branch(c.DATASET.ROT_FACTOR1, c.DATASET.SCALE_FACTOR1, True)
        b2 = branch(c.DATASET.ROT_FACTOR2, c.DATASET.SCALE_FACTOR2, True)
        b3 = branch(0.0, 0.0, False)
        return b1, b2, b3

    def evaluate(self, preds, roots=None, output_dir: str = ""):
        from selfpose3d_tpu.eval.metrics import panoptic_metrics

        gt_poses, gt_vis, gt_roots, gt_rv = [], [], [], []
        for i in range(len(preds)):
            poses = self._frame_poses(i)
            gt_poses.append([p for p in poses])
            gt_vis.append([np.ones((self.num_joints, 3)) for _ in poses])
            gt_roots.append([p[self.root_id] for p in poses])
            gt_rv.append([1.0 for _ in poses])
        return panoptic_metrics(
            preds, gt_poses, gt_vis, roots=roots, gt_roots=gt_roots, gt_root_vis=gt_rv
        )
