"""Bilinear grid sampling with torch ``F.grid_sample`` semantics.

This is the single hottest memory-bound op in the pipeline: it gathers 2D
heatmap values at the projected location of every voxel center
(ref: lib/models/project_layer.py:93, ``F.grid_sample(..., align_corners=True)``).

Semantics reproduced exactly:
  * align_corners=True:  unnormalized = (g + 1) / 2 * (size - 1)
  * padding_mode='zeros': each of the 4 bilinear taps contributes 0 when its
    integer pixel lies outside the image.

Implementation notes (measured on v5e):
  * XLA's TPU gather runs a scalar index loop at ~0.1 G rows/s regardless of
    row width — row COUNT is the cost. One multi-channel gather per tap (4N
    rows) beats per-channel 1-D gathers (4NC rows) by ~C x (34 s -> 1.7 s
    for PoseNet sampling).
  * Gather outputs are tiled with the gathered slice minor: (rows, C=15)
    pads 15 -> 128 lanes, an 8.5x HBM blow-up (4 x 5 GB temps; OOMs a 16G
    chip). Chunking the rows through lax.map bounds the padded temps to
    ~chunk x 512 B per tap; chunk size does not affect speed (swept
    32k..256k: flat ~338 ms/view at B=4).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bilinear_taps(
    grid: jnp.ndarray, H: int, W: int, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tap indices/weights for normalized sample points.

    Args:
      grid: (..., N, 2) normalized coords (x over W, y over H), align_corners.
    Returns:
      idx: (..., 4, N) int32 flat indices into H*W (clipped).
      w:   (..., 4, N) tap weights, zeroed for out-of-image taps.
    """
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(dtype)
    wy = (y - y0).astype(dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    idxs, ws = [], []
    for dy, dx, wgt in (
        (0, 0, (1 - wx) * (1 - wy)),
        (0, 1, wx * (1 - wy)),
        (1, 0, (1 - wx) * wy),
        (1, 1, wx * wy),
    ):
        yi = y0i + dy
        xi = x0i + dx
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idxs.append(jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1))
        ws.append(wgt * valid.astype(dtype))
    return jnp.stack(idxs, axis=-2), jnp.stack(ws, axis=-2)


def gather_taps_cmajor(
    flat: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray, chunk: int = 32768
) -> jnp.ndarray:
    """Apply 4-tap weighted gathers -> (C, N) samples.

    TPU gathers run a scalar index loop at ~0.1 G rows/s regardless of row
    width (measured on v5e), so the row count is the cost: one multi-channel
    gather per tap (4N rows total) beats per-channel 1-D gathers (4NC rows)
    by ~C x. The padded (rows, C->128 lanes) tap outputs are kept to
    ``chunk`` rows at a time via lax.map, bounding the 8.5x tile-padding
    blow-up to ~chunk*512B per tap instead of gigabytes.

    Args:
      flat: (H*W, C) row-major image table.
      idx:  (4, N) int32 tap indices.
      w:    (4, N) tap weights.
    Returns:
      (C, N) sampled values.
    """
    C = flat.shape[-1]
    N = idx.shape[-1]
    if N % chunk != 0:
        chunk = N  # fall back to one chunk for odd sizes (small call sites)
    n_chunks = N // chunk

    idx_c = jnp.moveaxis(idx.reshape(4, n_chunks, chunk), 1, 0)
    w_c = jnp.moveaxis(w.reshape(4, n_chunks, chunk), 1, 0)

    def one_chunk(args):
        i, wt = args  # (4, chunk)
        vals = (
            jnp.take(flat, i[0], axis=0) * wt[0][:, None]
            + jnp.take(flat, i[1], axis=0) * wt[1][:, None]
            + jnp.take(flat, i[2], axis=0) * wt[2][:, None]
            + jnp.take(flat, i[3], axis=0) * wt[3][:, None]
        )  # (chunk, C)
        return vals.T  # store channel-major

    out = jax.lax.map(one_chunk, (idx_c, w_c))  # (n_chunks, C, chunk)
    return jnp.moveaxis(out, 0, 1).reshape(C, N)


def grid_sample_bilinear_cmajor(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample ``image`` (H, W, C) at normalized ``grid`` (N, 2) -> (C, N)."""
    H, W, C = image.shape
    idx, w = bilinear_taps(grid, H, W, dtype=image.dtype)
    flat = image.reshape(H * W, C)
    return gather_taps_cmajor(flat, idx, w)


def grid_sample_bilinear(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Channel-minor convenience wrapper: (H, W, C), (N, 2) -> (N, C)."""
    return grid_sample_bilinear_cmajor(image, grid).T
