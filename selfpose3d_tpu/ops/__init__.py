from selfpose3d_tpu.ops.sampling import grid_sample_bilinear
from selfpose3d_tpu.ops.unproject import (
    compute_sample_grid,
    sample_and_aggregate,
    unproject_heatmaps,
)
from selfpose3d_tpu.ops.gaussian import (
    render_gaussian_heatmaps,
    render_gaussian_cube_3d,
)
from selfpose3d_tpu.ops.proposal import (
    max_pool_nms_3d,
    nms_topk,
    voxel_index_to_world,
    proposals_soft,
    match_proposals_to_gt,
)
from selfpose3d_tpu.ops.softargmax import soft_argmax, soft_argmax_ndhwc
from selfpose3d_tpu.ops.matching import hungarian, masked_assignment_cost

__all__ = [
    "grid_sample_bilinear",
    "compute_sample_grid",
    "sample_and_aggregate",
    "unproject_heatmaps",
    "render_gaussian_heatmaps",
    "render_gaussian_cube_3d",
    "max_pool_nms_3d",
    "nms_topk",
    "voxel_index_to_world",
    "proposals_soft",
    "match_proposals_to_gt",
    "soft_argmax",
    "soft_argmax_ndhwc",
    "hungarian",
    "masked_assignment_cost",
]
