"""Differentiable Gaussian heatmap rendering.

The reference materialises a full (persons*joints, H, W) broadcast-exp grid per
view (ref: lib/models/multi_person_posenet_ssv.py:419,448,459 and
lib/models/cuboid_proposal_net_soft.py:222). Here the 2D Gaussian is factored
into its separable 1-D components, so the person-summed heatmap becomes one
(H, P) @ (P, W) matmul per joint — an MXU op instead of a HW-sized VPU blowup,
and the peak memory drops from O(P*J*H*W) to O(P*J*(H+W)).

3D target cubes for synthetic-root training use the same factorisation with a
max-composite across persons (ref: cuboid_proposal_net_soft.py:168-203).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def render_gaussian_heatmaps(
    centers: jnp.ndarray,
    heatmap_wh: Tuple[int, int],
    sigma: float = 3.0,
    coord_scale: float = 0.25,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sum-composited 2D Gaussians, clipped to [0, 1].

    Matches ``exp(-((xx-x)/s)^2/2 - ((yy-y)/s)^2/2)`` summed over persons then
    clipped (ref: multi_person_posenet_ssv.py:416-420). Coordinates are scaled
    by ``coord_scale`` (the reference's /4.0 image->heatmap stride).

    Args:
      centers: (..., P, J, 2) pixel coords (x, y) in image space.
      heatmap_wh: static (W, H).
      sigma: gaussian sigma in heatmap pixels.
      coord_scale: multiplied into coords before rendering (stride).
      mask: optional (..., P) validity; invalid persons contribute nothing.
    Returns:
      (..., J, H, W) heatmaps in [0, 1].
    """
    W, H = heatmap_wh
    x = centers[..., 0] * coord_scale  # (..., P, J)
    y = centers[..., 1] * coord_scale

    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx = jnp.exp(-0.5 * ((xs - x[..., None]) / sigma) ** 2)  # (..., P, J, W)
    gy = jnp.exp(-0.5 * ((ys - y[..., None]) / sigma) ** 2)  # (..., P, J, H)
    if mask is not None:
        gx = gx * mask[..., None, None]
    # sum over persons of the outer product: one matmul per (batch..., joint)
    hm = jnp.einsum("...pjh,...pjw->...jhw", gy, gx)
    return jnp.clip(hm, 0.0, 1.0)


def render_gaussian_cube_3d(
    roots: jnp.ndarray,
    grid_x: jnp.ndarray,
    grid_y: jnp.ndarray,
    grid_z: jnp.ndarray,
    sigma: float = 200.0,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Max-composited 3D Gaussian target cube, truncated at 3 sigma per axis.

    Matches the reference's searchsorted-window rendering: voxels farther than
    3 sigma from the center along *any* axis are exactly zero
    (ref: cuboid_proposal_net_soft.py:168-203).

    Args:
      roots:  (..., P, 3) root positions in world mm.
      grid_x/y/z: (X,), (Y,), (Z,) world-coordinate axes.
      mask:   optional (..., P) validity mask.
    Returns:
      (..., X, Y, Z) cube in [0, 1].
    """
    inv2s2 = 1.0 / (2.0 * sigma * sigma)

    def axis_terms(g, mu):
        # g: (A,), mu: (..., P) -> d2 (..., P, A), window mask (..., P, A)
        d = g - mu[..., None]
        window = (jnp.abs(d) <= 3.0 * sigma).astype(jnp.float32)
        return d * d, window

    dx2, wx = axis_terms(grid_x, roots[..., 0])
    dy2, wy = axis_terms(grid_y, roots[..., 1])
    dz2, wz = axis_terms(grid_z, roots[..., 2])

    # (..., P, X, Y, Z)
    d2 = (
        dx2[..., :, None, None]
        + dy2[..., None, :, None]
        + dz2[..., None, None, :]
    )
    win = (
        wx[..., :, None, None]
        * wy[..., None, :, None]
        * wz[..., None, None, :]
    )
    g = jnp.exp(-d2 * inv2s2) * win
    if mask is not None:
        g = g * mask[..., None, None, None]
    cube = jnp.max(g, axis=-4)
    return jnp.clip(cube, 0.0, 1.0)
