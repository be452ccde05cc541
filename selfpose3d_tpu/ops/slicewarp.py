"""Fast voxel-slice resampling: a Pallas TPU kernel for multi-view unprojection.

Why: XLA's HBM gather runs a scalar index loop (~0.1 G rows/s measured on
v5e); sampling K*64^3 voxels x 5 views dominates inference (>85%). Mosaic
exposes VPU-rate dynamic gathers (``tpu.dynamic_gather``, reached through 2D
``take_along_axis``) but only along a single vreg axis (<=128 lanes) — not
arbitrary 2D point access. This kernel reaches the samples through a
column-aligned two-pass warp per voxel z-slice:

  A voxel slice row (fixed iz, ix; varying iy) projects to a smooth,
  near-straight curve in the heatmap (a projected 3D line + mild lens
  distortion). Pass 1 linearizes the curve between its Y knots (binary
  segment search per integer image column), takes FOUR vertical taps around
  the curve height r(c) = floor(y_hat(c)) at every column — rows r-1..r+2 —
  and keeps them un-lerped. Pass 2 gathers, per sample point, the tap
  quadruple at its two straddling columns and reconstructs the EXACT
  bilinear value: the point's own floor(ys) row pair is selected from the
  4-tap band via s = floor(ys) - r(column).

Exactness: matches direct bilinear sampling (torch ``F.grid_sample``
align_corners=True semantics, ref: lib/models/project_layer.py:93) whenever
the curve stays within the 4-tap band, i.e. |y_hat(col) - ys| <~ 1.5 px —
guaranteed for curve slope |dy/dx| <~ 1.5 along the warp direction. Slopes
are kept low by choosing the warp orientation PER SLICE (a projected voxel
lattice cannot be steep in both image axes at once): the kernel takes both
heatmap layouts plus per-slice ``flip`` flags and branches per slice. It also
emits an ``ok`` mask (band held for the point's two columns), so callers with
singular geometry — rows passing near a camera in the whole-space RootNet
grid — can run both orientations and select per point (see
ops/unproject.py:sample_and_aggregate_slicewarp).

vreg-constraint plumbing: pass 1 runs transposed so the warp-minor image
axis sits in the lane dimension; tables wider than one vreg (<=256 lanes)
gather each 128-lane half and select.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
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


def _search_steps(n: int) -> Tuple[int, ...]:
    """Descending power-of-two steps for a branchless binary search over n."""
    steps = []
    st = 1
    while st * 2 < n:
        st *= 2
    while st >= 1:
        steps.append(st)
        st //= 2
    return tuple(steps)


def _warp_slice(hm_ref, xs, ys, out_ref, ok_ref, si, *, H, W, X, Y, J, Wp, Xp, Yp):
    """Warp-resample one slice against one heatmap orientation.

    hm_ref[0] must be (J, Wp>=pad(W), Hp>=pad(H)) with the warp-minor image
    axis (y) on lanes; xs/ys are (Xp, Yp) pixel coords in that orientation.
    """
    f32 = jnp.float32

    # ---- per-row curve direction; flip so xs increases along iy
    dir_pos = xs[:, Y - 1 : Y] >= xs[:, 0:1]  # (Xp, 1)
    sgn = jnp.where(dir_pos, 1.0, -1.0).astype(f32)
    xs_m = xs * sgn

    # ---- branchless binary search: rightmost knot k <= col, k in [0, Y-2]
    cols = jax.lax.broadcasted_iota(jnp.int32, (Xp, Wp), 1).astype(f32)
    cols_m = cols * sgn
    seg = jnp.zeros((Xp, Wp), jnp.int32)
    for st in _search_steps(Y - 1):
        cand = seg + st
        cand_c = jnp.minimum(cand, Y - 2)
        val = _gather_lanes(xs_m, cand_c)
        seg = jnp.where((cand <= Y - 2) & (val <= cols_m), cand, seg)

    # knot coordinate lookup (tables are Yp<=128 lanes)
    x_k = _gather_lanes(xs_m, seg)
    x_k1 = _gather_lanes(xs_m, seg + 1)
    y_k = _gather_lanes(ys, seg)
    y_k1 = _gather_lanes(ys, seg + 1)

    t = (cols_m - x_k) / (x_k1 - x_k + 1e-6)
    y_hat = y_k + t * (y_k1 - y_k)  # (Xp, Wp) curve height per column
    y_hat = jnp.clip(y_hat, -4.0, H + 3.0)  # tame extrapolated columns
    r = jnp.floor(y_hat).astype(jnp.int32)  # 4-tap band anchor

    # transposed layout for pass 1: image y on lanes, columns on sublanes
    pad_lanes = LANE - Xp
    rT = jnp.pad(r.astype(f32).T, ((0, 0), (0, pad_lanes))).astype(jnp.int32)

    # ---- per-point taps (shared across channels)
    x0f = jnp.floor(xs)
    ux = (xs - x0f).astype(f32)
    x0 = x0f.astype(jnp.int32)
    y0f = jnp.floor(ys)
    vy = (ys - y0f).astype(f32)
    y0 = y0f.astype(jnp.int32)

    vx0 = ((x0 >= 0) & (x0 <= W - 1)).astype(f32)
    vx1 = ((x0 + 1 >= 0) & (x0 + 1 <= W - 1)).astype(f32)
    vy0 = ((y0 >= 0) & (y0 <= H - 1)).astype(f32)
    vy1 = ((y0 + 1 >= 0) & (y0 + 1 <= H - 1)).astype(f32)
    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x0 + 1, 0, W - 1)

    r_f = r.astype(f32)  # gather row-anchor at the point's columns
    r0 = _gather_lanes(r_f, x0c).astype(jnp.int32)
    r1 = _gather_lanes(r_f, x1c).astype(jnp.int32)
    d0 = y0 - r0
    d1 = y0 - r1
    s0 = jnp.clip(d0, -1, 1)  # tap-pair selector within the band
    s1 = jnp.clip(d1, -1, 1)
    # band held for both columns (or the point contributes nothing anyway)
    dead = (vx0 + vx1) * (vy0 + vy1) == 0.0
    ok = ((d0 == s0) & (d1 == s1)) | dead
    ok_ref[0, 0, si] = ok.astype(f32)

    w_lo = (1.0 - vy) * vy0
    w_hi = vy * vy1
    wx0 = (1.0 - ux) * vx0
    wx1 = ux * vx1

    def sel(s, a, b, c):
        return jnp.where(s == -1, a, jnp.where(s == 0, b, c))

    def channel_body(ch, carry):
        hm_c = hm_ref[0, ch]  # (Wp, Hp): warp-minor axis on lanes
        T = []
        for j in range(4):
            idx = jnp.clip(rT + (j - 1), 0, H - 1)
            TjT = _gather_lanes(hm_c, idx)  # (Wp, 128)
            T.append(TjT.T[:Xp])  # (Xp, Wp)

        G0 = [_gather_lanes(Tj, x0c) for Tj in T]  # 4 x (Xp, Yp)
        low0 = sel(s0, G0[0], G0[1], G0[2])
        high0 = sel(s0, G0[1], G0[2], G0[3])
        F0 = low0 * w_lo + high0 * w_hi

        G1 = [_gather_lanes(Tj, x1c) for Tj in T]
        low1 = sel(s1, G1[0], G1[1], G1[2])
        high1 = sel(s1, G1[1], G1[2], G1[3])
        F1 = low1 * w_lo + high1 * w_hi

        out_ref[0, 0, si, ch] = F0 * wx0 + F1 * wx1
        return carry

    jax.lax.fori_loop(0, J, channel_body, 0)


def _slice_warp_kernel(
    flip_ref, hm_ref, hms_ref, xs_ref, ys_ref, out_ref, ok_ref,
    *, H, W, X, Y, J, SB, Wp, Xp, Yp, Wsp,
):
    """One (batch, slice-block) program; per-slice warp orientation."""
    sblk = pl.program_id(1)  # read outside cond/fori (interpret-mode limit)

    def slice_body(si, _):
        xs = xs_ref[0, 0, si]  # (Xp, Yp)
        ys = ys_ref[0, 0, si]

        def normal():
            _warp_slice(
                hm_ref, xs, ys, out_ref, ok_ref, si,
                H=H, W=W, X=X, Y=Y, J=J, Wp=Wp, Xp=Xp, Yp=Yp,
            )

        def flipped():  # swap image axes: slope -> 1/slope
            _warp_slice(
                hms_ref, ys, xs, out_ref, ok_ref, si,
                H=W, W=H, X=X, Y=Y, J=J, Wp=Wsp, Xp=Xp, Yp=Yp,
            )

        jax.lax.cond(flip_ref[0, sblk, si] != 0, flipped, normal)
        return 0

    jax.lax.fori_loop(0, SB, slice_body, 0)


def _pick_slice_block(S: int) -> int:
    for sb in (8, 5, 4, 2):
        if S % sb == 0:
            return sb
    return 1


def slice_warp_sample(
    heatmap: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    flip: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable wrapper: Pallas forward + exact-adjoint backward.

    The backward w.r.t. the heatmap is the exact adjoint of bilinear
    sampling (4-tap scatter-add, matching the gather path's autodiff).
    Sample coordinates receive ZERO cotangents: every call site derives them
    from cameras, static voxel grids, and stop-gradient'ed proposal centers
    (ref: the reference equally detaches proposals before pose regression,
    cuboid_proposal_net_soft.py:57 / pose_regression_net.py:47), so no
    gradient path through them exists.
    """
    B, S = xs.shape[0], xs.shape[1]
    if flip is None:
        flip = jnp.zeros((B, S), jnp.int32)
    return _slice_warp_vjp(heatmap, xs, ys, flip)


@jax.custom_vjp
def _slice_warp_vjp(heatmap, xs, ys, flip):
    return _slice_warp_impl(heatmap, xs, ys, flip)


def _slice_warp_fwd(heatmap, xs, ys, flip):
    out = _slice_warp_impl(heatmap, xs, ys, flip)
    # zero-size sentinel carries the heatmap's static shape/dtype to bwd
    sentinel = jnp.zeros((0,) + heatmap.shape[1:], heatmap.dtype)
    return out, (sentinel, xs, ys)


def _slice_warp_bwd(res, ct):
    sentinel, xs, ys = res
    g, _ = ct  # ok mask is non-differentiable
    _, H, W, J = sentinel.shape
    B = xs.shape[0]
    hm_dtype = sentinel.dtype
    _, S, X, Y = xs.shape
    N = S * X * Y

    px = xs.reshape(B, N)
    py = ys.reshape(B, N)
    # g: (B, S, J, X, Y) -> (B, N, J)
    g_pt = g.transpose(0, 1, 3, 4, 2).reshape(B, N, J)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    ux = px - x0
    vy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = jnp.zeros((B, H * W, J), jnp.float32)
    bidx = jnp.arange(B)[:, None]
    for dy, dx, wgt in (
        (0, 0, (1 - ux) * (1 - vy)),
        (0, 1, ux * (1 - vy)),
        (1, 0, (1 - ux) * vy),
        (1, 1, ux * vy),
    ):
        yi = y0i + dy
        xi = x0i + dx
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        rows = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        flat = flat.at[bidx, rows].add(
            g_pt * (wgt * valid.astype(jnp.float32))[..., None],
            mode="drop",
        )
    dhm = flat.reshape(B, H, W, J).astype(hm_dtype)
    return (
        dhm,
        jnp.zeros_like(xs),  # no gradient path exists through coords
        jnp.zeros_like(ys),
        np.zeros((B, S), jax.dtypes.float0),  # int flags
    )


_slice_warp_vjp.defvjp(_slice_warp_fwd, _slice_warp_bwd)


def _slice_warp_impl(
    heatmap: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    flip: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp-resample voxel slices from one view's heatmaps (exact bilinear
    within the 4-tap band; see module docstring).

    Args:
      heatmap: (B, H, W, J) one view's heatmaps; H <= 256, W <= 256.
      xs, ys:  (B, S, X, Y) sample coords in heatmap pixels (align-corners
               convention: integer coords hit texel centers). X <= 128,
               2 <= Y <= 128.
      flip:    optional (B, S) int/bool — warp each slice with image axes
               swapped (for slices whose rows run steeper than |dy/dx| ~ 1).
    Returns:
      out: (B, S, J, X, Y) channel-major samples (zero where taps fall
           outside the image).
      ok:  (B, S, X, Y) float mask — 1 where the 4-tap band held and the
           value is exact bilinear.
    """
    B, H, W, J = heatmap.shape
    S, X, Y = xs.shape[1], xs.shape[2], xs.shape[3]
    Wp = _round_up(W, LANE)
    Xp = _round_up(X, 8)
    Yp = _round_up(Y, LANE)
    Hp = _round_up(H, LANE)
    assert Hp <= 2 * LANE and Wp <= 2 * LANE and Xp <= LANE and Yp <= LANE
    assert Y >= 2
    SB = _pick_slice_block(S)

    if flip is None:
        flip = jnp.zeros((B, S), jnp.int32)
    flip = flip.astype(jnp.int32).reshape(B, S // SB, SB)

    hm_p = jnp.pad(
        heatmap, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0))
    ).astype(jnp.float32)
    # pre-transpose so the kernel sees (J, Wp, Hp): image y on lanes — and
    # the axis-swapped layout (J, Hp, Wp) for flipped slices
    hm_t = jnp.transpose(hm_p, (0, 3, 2, 1))  # (B, J, Wp, Hp)
    hm_s = jnp.transpose(hm_p, (0, 3, 1, 2))  # (B, J, Hp, Wp)
    xs_p = jnp.pad(xs, ((0, 0), (0, 0), (0, Xp - X), (0, Yp - Y))).astype(jnp.float32)
    ys_p = jnp.pad(ys, ((0, 0), (0, 0), (0, Xp - X), (0, Yp - Y))).astype(jnp.float32)
    xs_p = xs_p.reshape(B, S // SB, SB, Xp, Yp)
    ys_p = ys_p.reshape(B, S // SB, SB, Xp, Yp)

    kernel = functools.partial(
        _slice_warp_kernel,
        H=H, W=W, X=X, Y=Y, J=J, SB=SB, Wp=Wp, Xp=Xp, Yp=Yp, Wsp=Hp,
    )
    out, ok = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, S // SB, SB, J, Xp, Yp), jnp.float32),
            jax.ShapeDtypeStruct((B, S // SB, SB, Xp, Yp), jnp.float32),
        ),
        grid=(B, S // SB),
        in_specs=[
            pl.BlockSpec(
                (1, S // SB, SB), lambda b, s: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, J, Wp, Hp), lambda b, s: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, J, Hp, Wp), lambda b, s: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, SB, Xp, Yp), lambda b, s: (b, s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, SB, Xp, Yp), lambda b, s: (b, s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, SB, J, Xp, Yp), lambda b, s: (b, s, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, SB, Xp, Yp), lambda b, s: (b, s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=28 * 1024 * 1024,
        ),
    )(flip, hm_t, hm_s, xs_p, ys_p)
    out = out.reshape(B, S, J, Xp, Yp)[:, :, :, :X, :Y]
    ok = ok.reshape(B, S, Xp, Yp)[:, :, :X, :Y]
    return out, ok
