"""Soft-argmax over voxel grids (ref: lib/models/pose_regression_net.py:14-28).

softmax(beta * x) over the flattened voxel axis, then expectation over the
grid's world coordinates. Pure jnp; XLA fuses the softmax + weighted sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_argmax(x: jnp.ndarray, grids: jnp.ndarray, beta: float = 100.0) -> jnp.ndarray:
    """Args:
      x:     (..., J, N) per-joint voxel scores (N = X*Y*Z flattened).
      grids: (..., N, 3) world coords of each voxel (shared across joints).
      beta:  softmax temperature (cfg NETWORK.BETA).
    Returns:
      (..., J, 3) expected world position per joint.
    """
    w = jax.nn.softmax(beta * x, axis=-1)
    return jnp.einsum("...jn,...nc->...jc", w, grids)


def soft_argmax_ndhwc(
    x: jnp.ndarray,
    axes,
    beta: float = 100.0,
) -> jnp.ndarray:
    """Separable soft-argmax over an NDHWC score volume.

    Identical math to ``soft_argmax`` on the flattened volume — the grid
    is axis-separable (every voxel's coordinate is (gx[x], gy[y], gz[z])),
    so E[g] factors into three marginal expectations. Consumes the V2V
    output volume DIRECTLY: no (B, J, N) score transpose and no
    (B, N, 3) grid tensor ever materializes (the r3 path moved ~1.9 GB
    per K=10 bench batch building both).

    Args:
      x:    (B, X, Y, Z, J) score volume.
      axes: (gx (B, X), gy (B, Y), gz (B, Z)) per-sample world-coordinate
            axes (compute_grid's linspaces + the cube center).
      beta: softmax temperature.
    Returns:
      (B, J, 3) expected world position per joint.
    """
    gx, gy, gz = axes
    xf = beta * x.astype(jnp.float32)
    m = jnp.max(xf, axis=(1, 2, 3), keepdims=True)
    e = jnp.exp(xf - m)  # (B, X, Y, Z, J)
    s = jnp.sum(e, axis=(1, 2, 3))  # (B, J)
    ex = jnp.einsum("bxj,bx->bj", jnp.sum(e, axis=(2, 3)), gx.astype(jnp.float32))
    ey = jnp.einsum("byj,by->bj", jnp.sum(e, axis=(1, 3)), gy.astype(jnp.float32))
    ez = jnp.einsum("bzj,bz->bj", jnp.sum(e, axis=(1, 2)), gz.astype(jnp.float32))
    return jnp.stack([ex, ey, ez], axis=-1) / s[..., None]
