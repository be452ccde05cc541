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
