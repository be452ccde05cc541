"""Bilinear grid sampling with torch ``F.grid_sample`` semantics.

This is the single hottest memory-bound op in the pipeline: it gathers 2D
heatmap values at the projected location of every voxel center
(ref: lib/models/project_layer.py:93, ``F.grid_sample(..., align_corners=True)``).

Semantics reproduced exactly:
  * align_corners=True:  unnormalized = (g + 1) / 2 * (size - 1)
  * padding_mode='zeros': each of the 4 bilinear taps contributes 0 when its
    integer pixel lies outside the image.

Implementation: 4-tap gather over the flattened (H*W) axis in CHANNEL-MAJOR
layout. The (C, N) tap outputs keep the huge N axis minor, which on TPU tiles
as T(8,128) with no padding; a channel-minor (N, C) gather would pad C=15 up
to 128 lanes — an 8.5x HBM blow-up (5 GB per tap at PoseNet sizes, observed
on v5e).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear_cmajor(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample ``image`` (H, W, C) at normalized ``grid`` (N, 2) -> (C, N).

    grid[..., 0] is x in [-1, 1] over W; grid[..., 1] is y over H
    (torch grid_sample convention, align_corners=True, zero padding).
    """
    H, W, C = image.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    flat = image.transpose(2, 0, 1).reshape(C, H * W)  # channel-major

    def tap(yi, xi, w):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(flat, idx, axis=1)  # (C, N), N stays minor
        return vals * (w * valid.astype(image.dtype))[None, :]

    return (
        tap(y0i, x0i, (1 - wx) * (1 - wy))
        + tap(y0i, x1i, wx * (1 - wy))
        + tap(y1i, x0i, (1 - wx) * wy)
        + tap(y1i, x1i, wx * wy)
    )


def grid_sample_bilinear(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Channel-minor convenience wrapper: (H, W, C), (N, 2) -> (N, C)."""
    return grid_sample_bilinear_cmajor(image, grid).T
