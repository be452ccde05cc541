"""3D max-pool NMS + top-K proposal extraction.

Replaces lib/core/proposal.py:18-48 (F.max_pool3d keep-equal NMS, topk,
flat-index unravel) with reduce_window + lax.top_k — both native XLA TPU ops.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def max_pool_nms_3d(x: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep-equal NMS: suppress voxels that are not their 3^3 local max.

    x: (B, X, Y, Z). Matches max_pool (ref: lib/core/proposal.py:28-32);
    torch pads max_pool3d with -inf, as does reduce_window here.
    """
    pooled = jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, kernel),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )
    keep = (x == pooled).astype(x.dtype)
    return keep * x


def nms_topk(
    root_cubes: jnp.ndarray, max_num: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NMS then top-K with flat-index unravel (ref: lib/core/proposal.py:35-48).

    Args:
      root_cubes: (B, X, Y, Z) detection volume.
      max_num: static K.
    Returns:
      topk_values: (B, K)
      topk_index:  (B, K, 3) integer voxel coords (x, y, z).
    """
    B, X, Y, Z = root_cubes.shape
    nmsed = max_pool_nms_3d(root_cubes)
    flat = nmsed.reshape(B, -1)
    values, idx = jax.lax.top_k(flat, max_num)
    ix = idx // (Y * Z)
    iy = (idx % (Y * Z)) // Z
    iz = idx % Z
    return values, jnp.stack([ix, iy, iz], axis=-1)


def voxel_index_to_world(
    index: jnp.ndarray,
    space_size: Sequence[float],
    space_center: Sequence[float],
    cube_size: Sequence[int],
) -> jnp.ndarray:
    """Voxel indices -> world mm (ref: cuboid_proposal_net_soft.py:46-52)."""
    cube = jnp.array(cube_size, dtype=jnp.float32)
    size = jnp.array(space_size, dtype=jnp.float32)
    center = jnp.array(space_center, dtype=jnp.float32)
    return index.astype(jnp.float32) / (cube - 1.0) * size + center - size / 2.0


def proposals_soft(
    root_cubes: jnp.ndarray,
    max_num: int,
    threshold: float,
    space_size: Sequence[float],
    space_center: Sequence[float],
    cube_size: Sequence[int],
) -> jnp.ndarray:
    """ProposalLayerSoft: threshold-gated proposals without GT matching
    (ref: cuboid_proposal_net_soft.py:54-68).

    Returns grid_centers (B, K, 5): [x, y, z, valid_flag, score] where
    valid_flag = 0.0 when score > threshold else -1.0.
    """
    values, index = nms_topk(root_cubes, max_num)
    loc = voxel_index_to_world(index, space_size, space_center, cube_size)
    flag = (values > threshold).astype(jnp.float32) - 1.0
    return jnp.concatenate(
        [loc, flag[..., None], values[..., None]], axis=-1
    )


def match_proposals_to_gt(
    loc: jnp.ndarray,
    gt_roots: jnp.ndarray,
    num_person: jnp.ndarray,
    max_dist: float = 500.0,
) -> jnp.ndarray:
    """Supervised cand->gt matching (ref: cuboid_proposal_net.py:25-40).

    Args:
      loc:       (B, K, 3) candidate world locations.
      gt_roots:  (B, P, 3) padded GT roots.
      num_person:(B,) valid person counts.
    Returns:
      (B, K) float: matched gt index, or -1.0 if nearest gt farther than
      max_dist (or no valid gt).
    """
    d = jnp.sqrt(jnp.sum((loc[:, :, None, :] - gt_roots[:, None, :, :]) ** 2, axis=-1))
    P = gt_roots.shape[1]
    valid = (jnp.arange(P)[None, None, :] < num_person[:, None, None])
    d = jnp.where(valid, d, jnp.inf)
    min_gt = jnp.argmin(d, axis=-1).astype(jnp.float32)
    min_d = jnp.min(d, axis=-1)
    return jnp.where(min_d > max_dist, -1.0, min_gt)
