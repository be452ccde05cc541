"""Fused multi-view unprojection: heatmaps -> voxel feature cube.

This collapses the reference's ``ProjectLayer.get_voxel`` python double loop
over batch x views (ref: lib/models/project_layer.py:42-102) into one batched,
jit-compiled op:

  1. project all voxel centers into every camera              (MXU einsum)
  2. in-image bounding mask                                   (VPU)
  3. clamp -> image-space affine -> optional horizontal flip
  4. rescale to heatmap coords, normalize, clamp to +-1.1
  5. bilinear-sample every view's heatmap (zero padding)      (gather)
  6. bounded mean across views, nan->0, clamp to [0, 1]

Everything is fixed-shape; views/batch/candidates are array axes, never python
loops, so XLA sees one fusible graph per call site.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from selfpose3d_tpu.geometry.cameras import CameraParams, project_points
from selfpose3d_tpu.ops.sampling import (
    grid_sample_bilinear,
    grid_sample_bilinear_cmajor,
)


def compute_sample_grid(
    grid: jnp.ndarray,
    cam: CameraParams,
    trans: jnp.ndarray,
    image_wh: Tuple[int, int],
    heatmap_wh: Tuple[int, int],
    hflip: Optional[jnp.ndarray] = None,
    orig_wh: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-view normalized sampling coords + in-bounds mask.

    Args:
      grid:    (..., N, 3) voxel centers in world mm. Leading axes broadcast
               against the camera batch axes.
      cam:     CameraParams with leading axes (..., ) matching grid's leading
               axes (typically (B, V)).
      trans:   (..., 2or3, 3) affine original-image->network-input pixels.
      image_wh: static (W, H) of the network input (ref cfg NETWORK.IMAGE_SIZE).
      heatmap_wh: static (W, H) of the heatmaps.
      hflip:   optional (...,)-broadcastable bool; flip x in input-image space
               (ref: project_layer.py:82-83).
      orig_wh: (..., 2) original camera image size (width,height) = center*2
               in the reference (ref: project_layer.py:68). Defaults to
               image-space bound from trans being identity — must be provided
               for correctness with real cameras.
    Returns:
      sample_grid: (..., N, 2) in [-1.1, 1.1] normalized coords.
      bounding:    (..., N) float mask of voxels projecting inside the
                   original image.
    """
    w, h = heatmap_wh
    img_w, img_h = image_wh

    xy = project_points(grid, cam)  # (..., N, 2)

    width = orig_wh[..., 0:1]  # (..., 1)
    height = orig_wh[..., 1:2]
    bounding = (
        (xy[..., 0] >= 0)
        & (xy[..., 1] >= 0)
        & (xy[..., 0] < width)
        & (xy[..., 1] < height)
    ).astype(jnp.float32)

    max_dim = jnp.maximum(width, height)  # (..., 1)
    xy = jnp.clip(xy, -1.0, max_dim[..., None])

    # image-space affine (homogeneous): (..., N, 2)
    A = trans[..., :2, :2]
    b = trans[..., :2, 2]
    xy = jnp.einsum("...ij,...nj->...ni", A, xy) + b[..., None, :]

    if hflip is not None:
        flip = jnp.asarray(hflip, dtype=xy.dtype)
        while flip.ndim < xy.ndim - 1:
            flip = flip[..., None]
        x_flipped = img_w - xy[..., 0]
        xy = jnp.stack(
            [flip * x_flipped + (1.0 - flip) * xy[..., 0], xy[..., 1]], axis=-1
        )

    # rescale image coords -> heatmap coords -> normalized [-1, 1]
    scale_hm = jnp.array([w / img_w, h / img_h], dtype=xy.dtype)
    xy = xy * scale_hm
    denom = jnp.array([w - 1.0, h - 1.0], dtype=xy.dtype)
    sample_grid = jnp.clip(xy / denom * 2.0 - 1.0, -1.1, 1.1)
    return sample_grid, bounding


def sample_and_aggregate_cmajor(
    heatmaps: jnp.ndarray,
    sample_grid: jnp.ndarray,
    bounding: jnp.ndarray,
) -> jnp.ndarray:
    """Bilinear-sample per view and take the bounded mean across views.

    Two memory-shape decisions (both matter at PoseNet sizes, N = K*64^3):
      * views are reduced with a scan-carried accumulator so the
        (B, V, N, J) per-view tensor never exists (~3 GB at f32/B=4);
      * everything is channel-major (B, J, N) so the huge N axis stays in
        the TPU lane dimension — J-minor layouts pad J=15 to 128 lanes
        (8.5x HBM expansion, OOM on 16G v5e).

    Args:
      heatmaps:    (B, V, H, W, J)
      sample_grid: (B, V, N, 2)
      bounding:    (B, V, N)
    Returns:
      (B, J, N) aggregated voxel features in [0, 1].
    """
    B, V, N, _ = sample_grid.shape
    J = heatmaps.shape[-1]

    def step(acc, view):
        wsum, bsum = acc
        hm, grid, bound = view
        sampled = jax.vmap(grid_sample_bilinear_cmajor)(hm, grid)  # (B, J, N)
        return (
            wsum + sampled * bound[:, None, :],
            bsum + bound,
        ), None

    views = (
        jnp.moveaxis(heatmaps, 1, 0),
        jnp.moveaxis(sample_grid, 1, 0),
        jnp.moveaxis(bounding, 1, 0),
    )
    (wsum, bsum), _ = jax.lax.scan(
        step,
        (jnp.zeros((B, J, N), heatmaps.dtype), jnp.zeros((B, N), heatmaps.dtype)),
        views,
    )
    cubes = wsum / (bsum[:, None, :] + 1e-6)
    cubes = jnp.nan_to_num(cubes, nan=0.0)
    return jnp.clip(cubes, 0.0, 1.0)


def sample_and_aggregate(
    heatmaps: jnp.ndarray,
    sample_grid: jnp.ndarray,
    bounding: jnp.ndarray,
) -> jnp.ndarray:
    """Channel-minor wrapper -> (B, N, J)."""
    return jnp.swapaxes(
        sample_and_aggregate_cmajor(heatmaps, sample_grid, bounding), 1, 2
    )


def slicewarp_supported(heatmaps: jnp.ndarray, cube_size,
                        slice_axis: str = "z") -> bool:
    """Static check: the Pallas slice-warp kernel's shape constraints
    (both warp orientations must fit the <=2-vreg gather tables), and a
    TPU backend (off-TPU callers fall back to the exact XLA gather)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    H, W = heatmaps.shape[2], heatmaps.shape[3]
    if slice_axis == "y":  # slices (X, Z): rows along voxel-z
        X, Y = int(cube_size[0]), int(cube_size[2])
    else:
        X, Y = int(cube_size[0]), int(cube_size[1])
    return H <= 256 and W <= 256 and X <= 128 and 2 <= Y <= 128


def _exact_fix_failed(
    samp: jnp.ndarray,
    ok: jnp.ndarray,
    hm: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    budget: int = 8192,
) -> jnp.ndarray:
    """Re-sample band-failed points exactly through fixed fallback slots.

    The slice-warp kernel reports, per point, whether its 4-tap band held in
    either warp orientation; the handful that fail (voxel rows projecting
    non-monotonically because they pass near a camera center) are compacted
    into ``budget`` slots via top-k, gathered exactly (the 4-tap bilinear the
    reference's grid_sample computes), and scattered back. Failures beyond
    the budget keep the warp value (graceful degradation).

    Args:
      samp: (B, S, J, X, Y) warp samples.
      ok:   (B, S, X, Y) 1 where exact already.
      hm:   (B, H, W, J).
      xs, ys: (B, S, X, Y) pixel coords.
    """
    B, S, J, X, Y = samp.shape
    H, W = hm.shape[1], hm.shape[2]
    N = S * X * Y
    R = min(budget, N)

    bad = 1.0 - ok.reshape(B, N)
    score, idxs = jax.lax.top_k(bad, R)  # (B, R); ties -> lowest index
    took = score > 0.5

    def fix_one(samp_b, hm_b, xs_b, ys_b, idx_b, took_b):
        px = jnp.take(xs_b.reshape(N), idx_b)
        py = jnp.take(ys_b.reshape(N), idx_b)
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        ux = px - x0
        vy = py - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        flat = hm_b.reshape(H * W, J)
        vals = jnp.zeros((R, J), jnp.float32)
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
            vals = vals + jnp.take(flat, rows, axis=0) * (
                wgt * valid.astype(jnp.float32)
            )[:, None]
        # scatter back into the channel-major flat view
        cm = samp_b.transpose(1, 0, 2, 3).reshape(J, N)
        old = jnp.take(cm, idx_b, axis=1)  # (J, R)
        new = jnp.where(took_b[None, :], vals.T, old)
        cm = cm.at[:, idx_b].set(new)
        return cm.reshape(J, S, X, Y).transpose(1, 0, 2, 3)

    return jax.vmap(fix_one)(samp, hm, xs, ys, idxs, took)


def _exact_fix_flat(samp, ok, hm, px, py, budget: int = 8192):
    """Flat-N variant of :func:`_exact_fix_failed`.

    samp: (B, J, N); ok: (B, N); hm: (B, H, W, J); px/py: (B, N).
    """
    B, J, N = samp.shape
    H, W = hm.shape[1], hm.shape[2]
    R = min(budget, N)

    bad = 1.0 - ok
    score, idxs = jax.lax.top_k(bad, R)  # (B, R)
    took = score > 0.5

    def fix_one(cm, hm_b, px_b, py_b, idx_b, took_b):
        p_x = jnp.take(px_b, idx_b)
        p_y = jnp.take(py_b, idx_b)
        x0 = jnp.floor(p_x)
        y0 = jnp.floor(p_y)
        ux = p_x - x0
        vy = p_y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        flat = hm_b.reshape(H * W, J)
        vals = jnp.zeros((R, J), jnp.float32)
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
            vals = vals + jnp.take(flat, rows, axis=0) * (
                wgt * valid.astype(jnp.float32)
            )[:, None]
        old = jnp.take(cm, idx_b, axis=1)  # (J, R)
        new = jnp.where(took_b[None, :], vals.T, old)
        return cm.at[:, idx_b].set(new)

    return jax.vmap(fix_one)(samp, hm, px, py, idxs, took)


def sample_whole_space_slicewarp(
    heatmaps: jnp.ndarray,
    sample_grid: jnp.ndarray,
    bounding: jnp.ndarray,
    cube_size,
    dtype=None,
    budget: int = 16384,
    return_stats: bool = False,
):
    """Whole-space (RootNet) slice-warp sampling -> (B, J, N).

    Whole-space grids contain the cameras themselves (Panoptic: an 8 m
    space with cameras ~4.5 m out), which breaks single-slicing hosting at
    scale: horizontal lattice rows pointing at a camera go non-monotone
    (measured 30-46k failed points per view on the flagship scene), and
    vertical z-rows still fail across the behind-camera mirror wedge
    (8-14k/view) — both far over any sane exact-fix budget. This path runs
    the kernel in BOTH slicings (vertical z-rows and horizontal z-plane
    rows, 6 hosting variants total), selects per point, and exact-gathers
    only the both-failed residual (the true singular set near the camera
    axis) through ``budget`` top-k slots.

    Unlike the cube path, per-view flat tensors are materialized — at
    RootNet sizes ((B, V, J<=15, 128k)) that is a few hundred MB transient,
    and it buys per-point selection across slicings.
    """
    B, V, H, W, J = heatmaps.shape
    X, Y, Z = (int(s) for s in cube_size)
    N = X * Y * Z

    px = (sample_grid[..., 0] + 1.0) * 0.5 * (W - 1)
    py = (sample_grid[..., 1] + 1.0) * 0.5 * (H - 1)

    def one_slicing(hm, x_v, y_v, slice_axis):
        """One view (B, N) coords -> flat (B, J, N) samples, (B, N) ok."""
        from selfpose3d_tpu.ops.slicewarp import slice_warp_sample

        if slice_axis == "y":
            S, RX, RY = Y, X, Z

            def arr(a):
                return a.reshape(B, X, Y, Z).transpose(0, 2, 1, 3)

            def flat_s(c):  # (B, S, J, RX, RY) -> (B, J, N)
                return c.transpose(0, 2, 3, 1, 4).reshape(B, J, N)

            def flat_o(o):  # (B, S, RX, RY) -> (B, N)
                return o.transpose(0, 2, 1, 3).reshape(B, N)
        else:
            S, RX, RY = Z, X, Y

            def arr(a):
                return a.reshape(B, X, Y, Z).transpose(0, 3, 1, 2)

            def flat_s(c):
                return c.transpose(0, 2, 3, 4, 1).reshape(B, J, N)

            def flat_o(o):
                return o.transpose(0, 2, 3, 1).reshape(B, N)

        xs = arr(x_v)
        ys = arr(y_v)
        pitches = [
            jnp.mean(jnp.abs(jnp.diff(xs, axis=-1)), axis=(2, 3)),
            jnp.mean(jnp.abs(jnp.diff(ys, axis=-1)), axis=(2, 3)),
        ]
        if RX == RY:
            pitches += [
                jnp.mean(jnp.abs(jnp.diff(xs, axis=-2)), axis=(2, 3)),
                jnp.mean(jnp.abs(jnp.diff(ys, axis=-2)), axis=(2, 3)),
            ]
        flips = jnp.argmax(jnp.stack(pitches), axis=0).astype(jnp.int32)
        samp, ok = slice_warp_sample(hm, xs, ys, flip=flips,
                                     table_dtype=dtype)
        return flat_s(samp.astype(jnp.float32)), flat_o(ok)

    def step(acc, view):
        wsum, bsum, failed_max = acc
        hm, x_v, y_v, b_v = view
        samp_y, ok_y = one_slicing(hm, x_v, y_v, "y")
        samp_z, ok_z = one_slicing(hm, x_v, y_v, "z")
        samp = jnp.where(ok_y[:, None, :] > 0, samp_y, samp_z)
        ok = jnp.maximum(ok_y, ok_z)
        samp = _exact_fix_flat(samp, ok, hm, x_v, y_v, budget)
        n_failed = jnp.sum(1.0 - ok, axis=-1)  # (B,) both-slicings failed
        return (
            wsum + samp * b_v[:, None, :],
            bsum + b_v,
            jnp.maximum(failed_max, n_failed),
        ), None

    views = (
        jnp.moveaxis(heatmaps, 1, 0),
        jnp.moveaxis(px, 1, 0),
        jnp.moveaxis(py, 1, 0),
        jnp.moveaxis(bounding, 1, 0),
    )
    (wsum, bsum, failed_max), _ = jax.lax.scan(
        step,
        (
            jnp.zeros((B, J, N), jnp.float32),
            jnp.zeros((B, N), jnp.float32),
            jnp.zeros((B,), jnp.float32),
        ),
        views,
    )
    out = wsum / (bsum[:, None, :] + 1e-6)
    out = jnp.clip(jnp.nan_to_num(out, nan=0.0), 0.0, 1.0)
    if return_stats:
        return out, {"sw_failed_max": jnp.max(failed_max)}
    return out


def sample_and_aggregate_slicewarp(
    heatmaps: jnp.ndarray,
    sample_grid: jnp.ndarray,
    bounding: jnp.ndarray,
    cube_size,
    num_cubes: int = 1,
    mode: str = "flags",
    dtype=None,
    return_stats: bool = False,
    slice_axis: str = "z",
    pre_sliced: bool = False,
    out_layout: str = "cmajor",
    fused: bool = False,
) -> jnp.ndarray:
    """Slice-warp (Pallas) sampling path -> (B, J, N).

    Exact bilinear within the kernel's 4-tap band (see ops/slicewarp.py);
    much faster than the XLA gather path on v5e. Select via
    cfg.NETWORK.SAMPLING.

    Args:
      heatmaps:    (B, V, H, W, J)
      sample_grid: (B, V, N, 2) normalized coords, N = num_cubes*X*Y*Z with
                   compute_grid's x-major/z-minor flattening.
      bounding:    (B, V, N)
      cube_size:   static (X, Y, Z) of each cube.
      num_cubes:   static number of stacked cubes (PoseNet candidates).
      mode:        'flags' (alias 'both') — single pass with 4-way per-slice
                   variant flags (hosting image axis x lattice row axis,
                   chosen to maximize the hosting pitch; see
                   ops/slicewarp.py). 'flags_fix' (alias 'both_fix') —
                   additionally route points whose inverse hosting failed
                   (sub-pixel pitch, collisions, non-monotone rows passing
                   near a camera) through exact-gather fallback slots —
                   needed for the whole-space RootNet grid; the top-k
                   compaction costs a sort over N, so it is reserved for
                   small grids.
      pre_sliced:  the caller built the grid with compute_grid(order="zxy")
                   (slice_axis 'z' only), so sample_grid/bounding already
                   arrive slice-grouped — regrouping is a free reshape
                   instead of three (B, V, N)-sized transposes.
      out_layout:  'cmajor' (default) -> (B, J, N) x-major/z-minor;
                   'ndhwc' -> (B, K, X, Y, Z, J), the PoseNet V2V input
                   layout, emitted with ONE transpose instead of the
                   cmajor regroup + the consumer's NDHWC transpose.
      fused:       run the multi-view fused kernel (slice_warp_sample_agg):
                   samples and the f32 accumulators stay in VMEM across the
                   views of one slice block instead of round-tripping HBM.
                   INFERENCE ONLY (no VJP) and 'flags' mode only.
      slice_axis: 'z' (default) — slices are z-planes with lattice rows
                   along voxel-x/y; right for person-centered cubes.
                   'y' — slices over lattice Y with rows along voxel-Z
                   (vertical columns): for the WHOLE-SPACE RootNet grid,
                   horizontal rows pointing at an in-footprint camera go
                   non-monotone en masse (measured 46k failed points per
                   view on the flagship scene, 5.6x the exact-fix budget),
                   while a vertical column only fails if it pierces the
                   camera's focal plane — vanishingly rare.
    """
    from selfpose3d_tpu.ops.slicewarp import slice_warp_sample

    B, V, H, W, J = heatmaps.shape
    X, Y, Z = (int(s) for s in cube_size)
    K = num_cubes
    N = K * X * Y * Z

    # denormalize (align-corners) and regroup x-major/z-minor -> slices
    px = (sample_grid[..., 0] + 1.0) * 0.5 * (W - 1)
    py = (sample_grid[..., 1] + 1.0) * 0.5 * (H - 1)

    if slice_axis == "y":
        assert not pre_sliced, "pre_sliced grids are z-slice-major"
        S = K * Y
        RX, RY = X, Z  # slice shape: RX rows of RY points (rows along z)

        def to_slices(a):  # (B, V, N) -> (B, V, S, X, Z)
            return (
                a.reshape(B, V, K, X, Y, Z)
                .transpose(0, 1, 2, 4, 3, 5)
                .reshape(B, V, S, X, Z)
            )
    elif pre_sliced:
        S = K * Z
        RX, RY = X, Y

        def to_slices(a):  # already (z-major): free reshape
            return a.reshape(B, V, S, X, Y)
    else:
        S = K * Z
        RX, RY = X, Y

        def to_slices(a):  # (B, V, N) -> (B, V, S, X, Y)
            return (
                a.reshape(B, V, K, X, Y, Z)
                .transpose(0, 1, 2, 5, 3, 4)
                .reshape(B, V, S, X, Y)
            )

    xs = to_slices(px)
    ys = to_slices(py)
    bnd = to_slices(bounding)

    # per-slice variant flags: maximize the hosting pitch over
    # (hosting image axis) x (lattice row axis); square slices only for the
    # lattice-transposed variants
    pitches = [
        jnp.mean(jnp.abs(jnp.diff(xs, axis=-1)), axis=(3, 4)),  # row axis
        jnp.mean(jnp.abs(jnp.diff(ys, axis=-1)), axis=(3, 4)),
    ]
    if RX == RY:
        pitches += [
            jnp.mean(jnp.abs(jnp.diff(xs, axis=-2)), axis=(3, 4)),  # lat-x
            jnp.mean(jnp.abs(jnp.diff(ys, axis=-2)), axis=(3, 4)),
        ]
    metric = jnp.stack(pitches)  # (variants, B, V, S)
    from selfpose3d_tpu.ops.slicewarp import kernel_packs_pairs

    if kernel_packs_pairs((RX, RY), S):
        # the kernel processes slice pairs sharing one flag: pick the
        # variant by the pair-mean pitch (adjacent z-slices of one cube
        # have near-identical projected geometry, so this costs nothing;
        # residual per-slice disagreements land in the ok-masked set)
        pair = jnp.mean(metric.reshape(*metric.shape[:3], S // 2, 2), axis=-1)
        flips = jnp.repeat(
            jnp.argmax(pair, axis=0).astype(jnp.int32), 2, axis=-1
        )  # (B, V, S)
    else:
        flips = jnp.argmax(metric, axis=0).astype(jnp.int32)  # (B,V,S)

    fix = mode in ("both_fix", "flags_fix")

    if fused and not fix:
        from selfpose3d_tpu.ops.slicewarp import slice_warp_sample_agg

        mean, nfail = slice_warp_sample_agg(
            heatmaps, xs, ys, bnd, flips, table_dtype=dtype
        )  # (B, S, JO, X, Y) already normalized + clipped
        cubes = mean[:, :, :J].astype(jnp.float32)
        failed_max = jnp.max(nfail, axis=1)  # worst view per sample
        return _sw_regroup(
            cubes, failed_max, out_layout, slice_axis,
            B, K, X, Y, Z, J, N, return_stats,
        )

    def step(acc, view):
        wsum, bsum, failed_max = acc
        hm, x_v, y_v, b_v, flip_v = view
        # kernel tables/values in the model compute dtype (bf16 on the
        # flagship path — the V2V consumer quantizes to bf16 regardless);
        # cross-view accumulation stays f32
        samp, ok = slice_warp_sample(hm, x_v, y_v, flip=flip_v,
                                     table_dtype=dtype)
        samp = samp.astype(jnp.float32)
        if fix:
            # points whose hosting failed (sub-pixel pitch, collisions,
            # non-monotone rows passing near a camera) get an exact gather
            # through a fixed budget of fallback slots
            samp = _exact_fix_failed(samp, ok, hm, x_v, y_v)
        # 'flags' mode keeps the failed view's ZEROED value in the weighted
        # average (no ok-exclusion). Measured on PoseNet cube fixtures
        # (/tmp probe, r3): failures land where the failed view's true
        # bilinear value is ~0 (cube corners in foreshortened views), so
        # zero-inclusion is near-exact (max dev < 1e-3 vs the exact gather)
        # while excluding the view rescales the other views' mass by
        # n/(n-1) (max dev 0.49). The residual risk — a distant person
        # whose whole cube fails in one view — is bounded by the occupancy
        # telemetry below.
        # telemetry: worst per-(sample, view) hosting-failure count — in
        # fix mode, counts beyond the fallback budget silently keep warp
        # values, so callers surface this (RootNet sows it; bench prints it)
        n_failed = jnp.sum(1.0 - ok, axis=(1, 2, 3))  # (B,)
        return (
            wsum + samp * b_v[:, :, None, :, :],
            bsum + b_v,
            jnp.maximum(failed_max, n_failed),
        ), None

    # static python loop over the (few) views: a lax.scan would moveaxis
    # every (B, V, S, X, Y) operand to view-major — three more full-tensor
    # transposes — and force the accumulators through HBM carry buffers;
    # unrolled, each view is a strided slice and XLA fuses the accumulate
    # into the kernel output's consumer
    acc = (
        jnp.zeros((B, S, J, RX, RY), jnp.float32),
        jnp.zeros((B, S, RX, RY), jnp.float32),
        jnp.zeros((B,), jnp.float32),
    )
    for v in range(V):
        acc, _ = step(
            acc, (heatmaps[:, v], xs[:, v], ys[:, v], bnd[:, v], flips[:, v])
        )
    wsum, bsum, failed_max = acc
    cubes = wsum / (bsum[:, :, None, :, :] + 1e-6)
    cubes = jnp.clip(jnp.nan_to_num(cubes, nan=0.0), 0.0, 1.0)
    return _sw_regroup(
        cubes, failed_max, out_layout, slice_axis,
        B, K, X, Y, Z, J, N, return_stats,
    )


def _sw_regroup(cubes, failed_max, out_layout, slice_axis,
                B, K, X, Y, Z, J, N, return_stats):
    """Regroup (B, S, J, RX, RY) slice-major cubes to the requested output
    layout; shared by the per-view and fused sampling paths."""
    if out_layout == "ndhwc":
        assert slice_axis == "z"
        out = cubes.reshape(B, K, Z, J, X, Y).transpose(
            0, 1, 4, 5, 2, 3
        )  # (B, K, X, Y, Z, J)
    # regroup slices -> (B, J, N) with x-major/z-minor flattening
    elif slice_axis == "y":
        out = (
            cubes.reshape(B, K, Y, J, X, Z)
            .transpose(0, 3, 1, 4, 2, 5)  # (B, J, K, X, Y, Z)
            .reshape(B, J, N)
        )
    else:
        out = (
            cubes.reshape(B, K, Z, J, X, Y)
            .transpose(0, 3, 1, 4, 5, 2)  # (B, J, K, X, Y, Z)
            .reshape(B, J, N)
        )
    if return_stats:
        return out, {"sw_failed_max": jnp.max(failed_max)}
    return out


def unproject_heatmaps(
    heatmaps: jnp.ndarray,
    grid: jnp.ndarray,
    cam: CameraParams,
    trans: jnp.ndarray,
    image_wh: Tuple[int, int],
    orig_wh: jnp.ndarray,
    cube_size: Sequence[int],
    hflip: Optional[jnp.ndarray] = None,
    sampling: str = "gather",
    sampling_dtype=None,
    return_stats: bool = False,
) -> jnp.ndarray:
    """Full fused unprojection.

    Args:
      heatmaps: (B, V, H, W, J)
      grid:     (B, N, 3) voxel centers (N = prod(cube_size)); may be shared
                across the batch by broadcasting a (1, N, 3).
      cam:      CameraParams batched (B, V).
      trans:    (B, V, 2or3, 3)
      image_wh: static network-input (W, H).
      orig_wh:  (B, V, 2) original image (width, height) per view.
      cube_size: static (X, Y, Z).
      hflip:    optional (B,) bools.
    Returns:
      (B, X, Y, Z, J) voxel cube (NDHWC).
    """
    B, V, H, W, J = heatmaps.shape
    heatmap_wh = (W, H)
    flip = None
    if hflip is not None:
        flip = jnp.broadcast_to(
            jnp.asarray(hflip).reshape(-1, 1), (B, V)
        )  # same flip for all views of a sample
    grid_bv = grid[:, None, :, :]  # (B, 1, N, 3) broadcasts over views
    sample_grid, bounding = compute_sample_grid(
        grid_bv, cam, trans, image_wh, heatmap_wh, hflip=flip, orig_wh=orig_wh
    )
    stats = {"sw_failed_max": jnp.float32(0.0)}
    if sampling == "slicewarp" and (
        slicewarp_supported(heatmaps, cube_size, slice_axis="y")
        and slicewarp_supported(heatmaps, cube_size, slice_axis="z")
    ):
        # whole-space grids (this path's only caller is RootNet): dual
        # slicings with per-point selection + exact-gather residual — see
        # sample_whole_space_slicewarp
        cubes, stats = sample_whole_space_slicewarp(
            heatmaps, sample_grid, bounding, cube_size,
            dtype=sampling_dtype, return_stats=True,
        )
    else:
        cubes = sample_and_aggregate_cmajor(heatmaps, sample_grid, bounding)
    X, Y, Z = (int(s) for s in cube_size)
    out = cubes.reshape(B, J, X, Y, Z).transpose(0, 2, 3, 4, 1)
    if return_stats:
        return out, stats
    return out
