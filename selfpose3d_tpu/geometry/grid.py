"""Voxel-grid construction (ref: lib/models/project_layer.py:22-40).

The grid is laid out X-major / Z-minor (meshgrid 'ij' order), matching the
reference's ``compute_grid`` flattening so proposal indices and soft-argmax
expectations line up with converted checkpoints.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def grid_1d_axes(space_size, space_center, cube_size) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The three 1-D world-coordinate axes of a voxel grid (host numpy)."""
    gx = np.linspace(-space_size[0] / 2, space_size[0] / 2, int(cube_size[0])) + space_center[0]
    gy = np.linspace(-space_size[1] / 2, space_size[1] / 2, int(cube_size[1])) + space_center[1]
    gz = np.linspace(-space_size[2] / 2, space_size[2] / 2, int(cube_size[2])) + space_center[2]
    return gx.astype(np.float32), gy.astype(np.float32), gz.astype(np.float32)


def compute_grid(box_size, box_center: jnp.ndarray, n_bins,
                 order: str = "xyz") -> jnp.ndarray:
    """Flattened (N, 3) voxel-center world coordinates of a box.

    box_size/n_bins are static python sequences; box_center may be traced
    (a jnp (3,) vector) so per-candidate cubes can be built inside jit.

    ``order`` sets the FLATTENING only (every point's coordinate stays an
    (x, y, z) triple): "xyz" = x-major/z-minor (the reference contract for
    proposals and soft-argmax); "zxy" = z-major — points arrive already
    grouped by z-slice, so the slice-warp sampler's slice regrouping is a
    free reshape instead of three full-tensor transposes of the projected
    coordinates (measured r4, scripts/microbench_sampwrap.py).
    """
    if not isinstance(box_size, (tuple, list)):
        box_size = (box_size, box_size, box_size)
    if not isinstance(n_bins, (tuple, list)):
        n_bins = (n_bins, n_bins, n_bins)

    g1x = jnp.linspace(-box_size[0] / 2, box_size[0] / 2, int(n_bins[0]))
    g1y = jnp.linspace(-box_size[1] / 2, box_size[1] / 2, int(n_bins[1]))
    g1z = jnp.linspace(-box_size[2] / 2, box_size[2] / 2, int(n_bins[2]))
    if order == "zxy":
        gz, gx, gy = jnp.meshgrid(
            g1z + box_center[2], g1x + box_center[0], g1y + box_center[1],
            indexing="ij",
        )
    else:
        gx, gy, gz = jnp.meshgrid(
            g1x + box_center[0], g1y + box_center[1], g1z + box_center[2],
            indexing="ij",
        )
    return jnp.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], axis=1)
