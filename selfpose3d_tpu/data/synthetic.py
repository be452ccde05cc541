"""Synthetic multi-view scene generation.

Serves three purposes:
  * test/bench fixtures when no Panoptic data is on disk,
  * the synthetic-pose training datasets for Shelf/Campus
    (ref: lib/dataset/shelf_synthetic.py, campus_synthetic.py),
  * deterministic inputs for the driver's compile checks.

Scenes follow the CMU Panoptic configuration: cameras on a ring around the
capture space looking inward, Panoptic 15-joint skeleton scale, space
(8000, 8000, 2000)mm centered (0, -500, 800).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from selfpose3d_tpu.config import Config
from selfpose3d_tpu.data.structures import AugBranch
from selfpose3d_tpu.geometry.cameras import CameraParams
from selfpose3d_tpu.geometry.transforms import (
    get_affine_transform_3x3,
    get_scale,
)


def _look_at_rotation(cam_pos: np.ndarray, target: np.ndarray) -> np.ndarray:
    z = target - cam_pos
    z = z / np.linalg.norm(z)
    up = np.array([0.0, 0.0, 1.0]) if abs(z[2]) < 0.9 else np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=0)


def ring_cameras(
    num_views: int = 5,
    radius: float = 4800.0,
    height: float = 1600.0,
    image_wh: Tuple[int, int] = (1920, 1080),
    focal: float = 1500.0,
    seed: int = 0,
) -> CameraParams:
    """Panoptic-like inward-looking camera ring, batched (1, V)."""
    rs = np.random.RandomState(seed)
    Rs, Ts = [], []
    target = np.array([0.0, -500.0, 800.0])
    for i in range(num_views):
        ang = 2 * np.pi * i / num_views + rs.uniform(-0.15, 0.15)
        pos = np.array(
            [radius * np.cos(ang), radius * np.sin(ang), height + rs.uniform(-200, 200)]
        )
        Rs.append(_look_at_rotation(pos, target))
        Ts.append(pos.reshape(3, 1))
    W, H = image_wh
    return CameraParams(
        R=jnp.asarray(np.stack(Rs)[None].astype(np.float32)),
        T=jnp.asarray(np.stack(Ts)[None].astype(np.float32)),
        f=jnp.full((1, num_views, 2), focal, jnp.float32),
        c=jnp.asarray(np.tile([W / 2.0, H / 2.0], (1, num_views, 1)).astype(np.float32)),
        k=jnp.zeros((1, num_views, 3), jnp.float32),
        p=jnp.zeros((1, num_views, 2), jnp.float32),
    )


def random_poses(
    num_person: int,
    num_joints: int = 15,
    seed: int = 0,
    root_idx: int = 2,
) -> np.ndarray:
    """Random plausible skeletons (P, J, 3) in world mm."""
    rs = np.random.RandomState(seed)
    roots = np.stack(
        [
            rs.uniform(-2000, 2000, num_person),
            rs.uniform(-2500, 1500, num_person),
            rs.uniform(700, 1100, num_person),
        ],
        axis=-1,
    )
    offsets = rs.randn(num_person, num_joints, 3) * np.array([220.0, 220.0, 320.0])
    poses = roots[:, None, :] + offsets
    poses[:, root_idx] = roots
    return poses.astype(np.float32)


def _tile_cam(cam: CameraParams, batch: int) -> CameraParams:
    import jax

    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape[1:]), cam
    )


def make_synthetic_branch(
    cfg: Config,
    batch_size: int = 1,
    num_person: int = 3,
    seed: int = 0,
    with_images: bool = True,
    rot_deg: float = 0.0,
    scale_aug: float = 1.0,
    hflip: bool = False,
) -> Tuple[AugBranch, np.ndarray]:
    """Build a fully-populated AugBranch for a synthetic scene.

    Returns (branch, gt_poses (B, P, J, 3)). Images are random noise (the
    backbone is exercised, not trained); target heatmaps are rendered from
    the GT joints exactly like the dataset's generate_target_heatmap
    (ref: lib/dataset/JointsDataset.py:237-302, sum->clip composite here).
    """
    import jax

    V = cfg.DATASET.CAMERA_NUM
    J = cfg.NETWORK.NUM_JOINTS
    P = cfg.MULTI_PERSON.MAX_PEOPLE_NUM
    img_w, img_h = cfg.NETWORK.IMAGE_SIZE
    hm_w, hm_h = cfg.NETWORK.HEATMAP_SIZE
    orig_w, orig_h = cfg.NETWORK.IMAGE_SIZE_ORIG
    B = batch_size

    cam = _tile_cam(ring_cameras(V, image_wh=(orig_w, orig_h), seed=seed), B)

    center = np.array([orig_w / 2.0, orig_h / 2.0])
    scale = get_scale((orig_w, orig_h), (img_w, img_h)) * scale_aug
    trans = get_affine_transform_3x3(center, scale, rot_deg, (img_w, img_h))
    trans_bv = jnp.asarray(
        np.tile(trans.astype(np.float32), (B, V, 1, 1))
    )
    orig_wh = jnp.asarray(np.tile([orig_w, orig_h], (B, V, 1)).astype(np.float32))

    rs = np.random.RandomState(seed + 1)
    poses = np.stack(
        [random_poses(num_person, J, seed=seed + 10 + b) for b in range(B)]
    )  # (B, P_real, J, 3)
    roots = poses[:, :, cfg.DATASET.ROOTIDX]  # (B, P_real, 3)

    # project GT joints into each view (host-side; build joints/targets)
    from selfpose3d_tpu.geometry.cameras import project_points_with_trans

    pix = project_points_with_trans(
        jnp.asarray(poses.reshape(B, 1, num_person * J, 3)), cam, trans_bv
    ).reshape(B, V, num_person, J, 2)

    from selfpose3d_tpu.ops.gaussian import render_gaussian_heatmaps

    hm = render_gaussian_heatmaps(
        pix, (hm_w, hm_h), sigma=float(cfg.NETWORK.SIGMA), coord_scale=0.25
    )  # (B, V, J, H, W)
    target_2d = jnp.transpose(hm, (0, 1, 3, 4, 2))

    from selfpose3d_tpu.geometry.grid import grid_1d_axes
    from selfpose3d_tpu.ops.gaussian import render_gaussian_cube_3d

    gx, gy, gz = grid_1d_axes(
        cfg.MULTI_PERSON.SPACE_SIZE,
        cfg.MULTI_PERSON.SPACE_CENTER,
        cfg.MULTI_PERSON.INITIAL_CUBE_SIZE,
    )
    target_3d = render_gaussian_cube_3d(
        jnp.asarray(roots), jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(gz)
    )

    # pad persons to MAX_PEOPLE_NUM
    joints = np.zeros((B, V, P, J, 2), np.float32)
    joints[:, :, :num_person] = np.asarray(pix)
    joints_vis = np.zeros((B, V, P, J, 2), np.float32)
    joints_vis[:, :, :num_person] = 1.0
    roots_pad = np.zeros((B, P, 3), np.float32)
    roots_pad[:, :num_person] = roots
    joints_3d = np.zeros((B, P, J, 3), np.float32)
    joints_3d[:, :num_person] = poses
    joints_3d_vis = np.zeros((B, P, J, 3), np.float32)
    joints_3d_vis[:, :num_person] = 1.0

    views = None
    if with_images:
        views = jnp.asarray(
            rs.rand(B, V, img_h, img_w, 3).astype(np.float32)
        )

    branch = AugBranch(
        cam=cam,
        trans=trans_bv,
        orig_wh=orig_wh,
        hflip=jnp.full((B,), hflip, jnp.bool_),
        views=views,
        input_heatmaps=None if with_images else target_2d,
        target_2d=target_2d,
        weights_2d=jnp.ones((B, V, J, 1), jnp.float32),
        target_3d=target_3d,
        joints=jnp.asarray(joints),
        joints_vis=jnp.asarray(joints_vis),
        joints_3d=jnp.asarray(joints_3d),
        joints_3d_vis=jnp.asarray(joints_3d_vis),
        roots_3d=jnp.asarray(roots_pad),
        num_person=jnp.full((B,), num_person, jnp.int32),
    )
    return branch, poses
