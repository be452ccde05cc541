"""Fast voxel-slice resampling: a Pallas TPU kernel for multi-view unprojection.

Why: XLA's HBM gather runs a scalar index loop (~0.1 G rows/s measured on
v5e); sampling K*64^3 voxels x 5 views dominates inference (>85%). Mosaic
exposes VPU-rate dynamic gathers (``tpu.dynamic_gather``) but only along a
single vreg (<=128 lanes) — not arbitrary 2D point access. This kernel
reaches the samples through a two-pass (Catmull-Smith style) warp per voxel
z-slice:

  A voxel slice row (fixed iz, ix; varying iy) projects to a smooth curve in
  the heatmap. Pass 1 resamples the heatmap VERTICALLY at the linearized
  curve height for every image column; pass 2 resamples HORIZONTALLY along
  each warped row at the voxel points' x coordinates.

vreg-constraint plumbing: pass 1 runs transposed so the 128-row image y axis
sits in the lane dimension (one vreg); pass 2 and the knot gathers split the
(<=256)-lane axis into two 128-lane halves and select.

This is not bit-identical to direct bilinear sampling: the y coordinate used
at the two x-taps is the curve's height at those integer columns rather than
at the sample point (a sheared-lattice bilinear). For projected voxel grids
the curves are near-linear across one pixel, so errors are
O(curve slope x heatmap gradient) — quantified in tests/test_slicewarp.py.
Select with cfg.NETWORK.SAMPLING = 'slicewarp' (default 'gather' = exact
reference semantics).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gather_lanes(tbl: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[i, j] = tbl[i, idx[i, j]] for lane counts up to 2*LANE.

    Mosaic's dynamic_gather handles one 128-lane vreg along the gathered
    axis; wider tables gather each half and select.
    """
    R, C = tbl.shape
    assert idx.shape[0] == R
    if C <= LANE:
        pad = LANE - C
        tbl_p = jnp.pad(tbl, ((0, 0), (0, pad))) if pad else tbl
        return _gather_128(tbl_p, idx)
    assert C <= 2 * LANE, "gather wider than 2 vregs not supported"
    lo = tbl[:, :LANE]
    hi = jnp.pad(tbl[:, LANE:], ((0, 0), (0, 2 * LANE - C)))
    in_hi = idx >= LANE
    g_lo = _gather_128(lo, jnp.minimum(idx, LANE - 1))
    g_hi = _gather_128(hi, jnp.maximum(idx - LANE, 0))
    return jnp.where(in_hi, g_hi, g_lo)


def _gather_128(tbl: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-row lane gather from a (R, 128) table; idx may have any lane count
    that is a multiple of 128 (processed one vreg-block at a time)."""
    R, C = idx.shape
    assert tbl.shape == (R, LANE)
    if C == LANE:
        return jnp.take_along_axis(tbl, idx, axis=1, mode="promise_in_bounds")
    assert C % LANE == 0
    outs = []
    for k in range(C // LANE):
        outs.append(
            jnp.take_along_axis(
                tbl, idx[:, k * LANE : (k + 1) * LANE], axis=1,
                mode="promise_in_bounds",
            )
        )
    return jnp.concatenate(outs, axis=1)


def _slice_warp_kernel(hm_ref, xs_ref, ys_ref, out_ref, *, H, W, X, Y, J, Wp, Xp, Yp):
    """One (batch, slice) program: warp-resample all J channels."""
    f32 = jnp.float32
    xs = xs_ref[0, 0]  # (Xp, Yp)
    ys = ys_ref[0, 0]

    # ---- per-row curve direction; flip so xs increases along iy
    dir_pos = xs[:, Y - 1 : Y] >= xs[:, 0:1]  # (Xp, 1)
    sgn = jnp.where(dir_pos, 1.0, -1.0).astype(f32)
    xs_m = xs * sgn

    # ---- segment search: count knots <= each image column (static unroll)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Xp, Wp), 1).astype(f32)
    cols_m = cols * sgn
    cnt = jnp.zeros((Xp, Wp), f32)
    for k in range(Y):
        cnt = cnt + (xs_m[:, k : k + 1] <= cols_m).astype(f32)
    seg = jnp.clip(cnt - 1.0, 0.0, Y - 2.0).astype(jnp.int32)  # (Xp, Wp)

    # knot coordinate lookup (tables are Yp<=128 lanes)
    x_k = _gather_lanes(xs_m, seg)
    x_k1 = _gather_lanes(xs_m, seg + 1)
    y_k = _gather_lanes(ys, seg)
    y_k1 = _gather_lanes(ys, seg + 1)

    t = (cols_m - x_k) / (x_k1 - x_k + 1e-6)
    y_hat = y_k + t * (y_k1 - y_k)  # (Xp, Wp) curve height per column

    # ---- pass 1 taps (vertical)
    y0 = jnp.floor(y_hat)
    ay = (y_hat - y0).astype(f32)
    y0i = y0.astype(jnp.int32)
    v0 = (y0i >= 0) & (y0i <= H - 1)
    v1 = (y0i + 1 >= 0) & (y0i + 1 <= H - 1)
    y0c = jnp.clip(y0i, 0, H - 1)
    y1c = jnp.clip(y0i + 1, 0, H - 1)
    w0 = (1.0 - ay) * v0.astype(f32)  # (Xp, Wp)
    w1 = ay * v1.astype(f32)

    # transposed layout: y on lanes (H == LANE vreg), columns on sublanes
    pad_lanes = H - Xp
    assert H == LANE and pad_lanes >= 0
    y0gT = jnp.pad(y0c.T, ((0, 0), (0, pad_lanes)))  # (Wp, H)
    y1gT = jnp.pad(y1c.T, ((0, 0), (0, pad_lanes)))
    w0T = jnp.pad(w0.T, ((0, 0), (0, pad_lanes)))
    w1T = jnp.pad(w1.T, ((0, 0), (0, pad_lanes)))

    # ---- pass 2 taps (horizontal)
    x0 = jnp.floor(xs)
    bx = (xs - x0).astype(f32)
    x0i = x0.astype(jnp.int32)
    u0 = (x0i >= 0) & (x0i <= W - 1)
    u1 = (x0i + 1 >= 0) & (x0i + 1 <= W - 1)
    x0c = jnp.clip(x0i, 0, W - 1)  # (Xp, Yp)
    x1c = jnp.clip(x0i + 1, 0, W - 1)
    wx0 = (1.0 - bx) * u0.astype(f32)
    wx1 = bx * u1.astype(f32)

    def channel_body(c, carry):
        # fori (not unroll): the body compiles once so per-channel buffers
        # genuinely reuse stack slots (Mosaic gives every unrolled SSA value
        # its own slot). Dynamic indexing stays on leading block dims.
        hm_T = hm_ref[0, c]  # (Wp, H): pre-transposed outside, y on lanes
        r0T = jnp.take_along_axis(hm_T, y0gT, axis=1, mode="promise_in_bounds")
        r1T = jnp.take_along_axis(hm_T, y1gT, axis=1, mode="promise_in_bounds")
        i1 = (r0T * w0T + r1T * w1T).T[:Xp]  # (Xp, Wp) warped rows
        g0 = _gather_lanes(i1, x0c)
        g1 = _gather_lanes(i1, x1c)
        out_ref[0, 0, c] = g0 * wx0 + g1 * wx1
        return carry

    jax.lax.fori_loop(0, J, channel_body, 0)


def slice_warp_sample(
    heatmap: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
) -> jnp.ndarray:
    """Warp-resample voxel slices from one view's heatmaps.

    Args:
      heatmap: (B, H, W, J) one view's heatmaps; H must equal 128 (the
               flagship heatmap height; generalization = follow-up).
      xs, ys:  (B, S, X, Y) sample coords in heatmap pixels (align-corners
               convention: integer coords hit texel centers).
    Returns:
      (B, S, J, X, Y) channel-major samples (zero where taps fall outside).
    """
    B, H, W, J = heatmap.shape
    S, X, Y = xs.shape[1], xs.shape[2], xs.shape[3]
    Wp = _round_up(W, LANE)
    Xp = _round_up(X, 8)
    Yp = _round_up(Y, LANE)
    assert H == LANE, "slice-warp kernel requires heatmap height 128"
    assert Wp <= 2 * LANE and Yp <= LANE

    hm_p = jnp.pad(heatmap, ((0, 0), (0, 0), (0, Wp - W), (0, 0))).astype(jnp.float32)
    # pre-transpose so the kernel sees (J, Wp, H): image rows on lanes
    hm_t = jnp.transpose(hm_p, (0, 3, 2, 1))  # (B, J, Wp, H)
    xs_p = jnp.pad(xs, ((0, 0), (0, 0), (0, Xp - X), (0, Yp - Y))).astype(jnp.float32)
    ys_p = jnp.pad(ys, ((0, 0), (0, 0), (0, Xp - X), (0, Yp - Y))).astype(jnp.float32)

    kernel = functools.partial(
        _slice_warp_kernel, H=H, W=W, X=X, Y=Y, J=J, Wp=Wp, Xp=Xp, Yp=Yp
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, J, Xp, Yp), jnp.float32),
        grid=(B, S),
        in_specs=[
            pl.BlockSpec(
                (1, J, Wp, H), lambda b, s: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Xp, Yp), lambda b, s: (b, s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Xp, Yp), lambda b, s: (b, s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, J, Xp, Yp), lambda b, s: (b, s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            # the unrolled per-channel chains need more than the 16M
            # default scoped-vmem budget
            vmem_limit_bytes=20 * 1024 * 1024,
        ),
    )(hm_t, xs_p, ys_p)
    return out[:, :, :, :X, :Y]
