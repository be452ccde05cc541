from selfpose3d_tpu.geometry.cameras import (
    CameraParams,
    project_points,
    project_points_with_trans,
    world_to_camera_frame,
    camera_to_world_frame,
)
from selfpose3d_tpu.geometry.transforms import (
    get_affine_transform,
    get_affine_transform_3x3,
    affine_transform_points,
    get_scale,
    rotate_points,
    project_points_opencv,
    compute_similarity_transform,
)
from selfpose3d_tpu.geometry.grid import compute_grid, grid_1d_axes

__all__ = [
    "CameraParams",
    "project_points",
    "project_points_with_trans",
    "world_to_camera_frame",
    "camera_to_world_frame",
    "get_affine_transform",
    "get_affine_transform_3x3",
    "affine_transform_points",
    "get_scale",
    "rotate_points",
    "project_points_opencv",
    "compute_similarity_transform",
    "compute_grid",
    "grid_1d_axes",
]
