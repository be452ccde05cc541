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
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# test/debug knob: force the XLA scatter-add backward even on TPU, so the
# Pallas adjoint can be cross-checked against it on real hardware
# (scripts/check_adjoint_tpu.py)
_FORCE_XLA_BWD = False

# bench-only ablation knob for the adjoint's per-channel pipeline
# (scripts/microbench_adjoint.py): "nocumsum" skips the 4 prefix sums,
# "nosegsum" skips cumsum + boundary/diff epilogue (movement ops only).
# Wrong math — NEVER set outside cost-attribution benches.
_ADJ_ABLATE = os.environ.get("SP3D_ADJ_ABLATE", "")


def _use_pallas_bwd() -> bool:
    """Whether the backward runs the Pallas adjoint (TPU) instead of the
    XLA scatter-add. Split out so CPU tests can monkeypatch it and drive
    the adjoint in interpret mode through the real custom-VJP plumbing."""
    return jax.default_backend() in ("tpu", "axon") and not _FORCE_XLA_BWD


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
    if tbl.dtype.itemsize == 2:
        # Mosaic's dynamic_gather wants index/result bitwidths to match;
        # lane indices are < 256 so int16 is lossless
        idx = idx.astype(jnp.int16)
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


def _unpack2(t):
    """Packed f32 (ch_a in low 16 bits, ch_b in high) -> two EXACT f32
    planes (a bf16's f32 image is its bits shifted into the high half)."""
    u = jax.lax.bitcast_convert_type(t, jnp.uint32)
    a = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    b = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    return a, b


def _pack2(a, b):
    """Two f32 planes -> one packed f32 (values rounded to bf16)."""
    ua = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    ub = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(ua | (ub << 16), jnp.float32)


def _warp_slice(hm_ref, xs, ys, out_ref, ok_ref, si, *, H, W, X, Y, J, Wp, Xp, Yp,
                lattice_t: bool = False, pack: int = 1, packc: bool = False):
    """Warp-resample one slice against one heatmap orientation.

    Column-hosted exact bilinear: every point is hosted at the image column
    c = clip(floor(xs), 0, W-2); the binary segment search inverts the
    (monotone) row curve so each column knows its hosted point q(c), whose
    FOUR exact taps hm[floor(ys)+{0,1}, c+{0,1}] are fetched by plain lane
    gathers in the column-major layout — no curve linearization, no
    approximation band. The only per-channel layout move is ONE transpose of
    the combined column-hosted values; a final cheap gather redistributes
    them to point order. A point is exact iff its host column's inverse map
    returns the point itself (``ok``); failures (sub-pixel voxel pitch along
    the row, hosting collisions at image edges, non-monotone rows passing
    near a camera) are reported and the value zeroed — callers run the other
    warp orientation and/or exact-gather fallback slots (ops/unproject.py).

    hm_ref[0] must be (J, Wp>=pad(W), Hp>=pad(H)) with the warp-minor image
    axis (y) on lanes; xs/ys are (R=pack*Xp, Yp) pixel coords in that
    orientation.

    ``pack``: number of slices stacked along the sublane axis (each at
    stride Xp). All pass-1 math is row-independent, so stacking is free;
    the payoff is pass 2 — with Xp <= 64 lattice rows, the tap gathers and
    the per-channel transpose (the kernel's dominant cost) run on
    (Wp, 128)-lane planes that are half padding for a single slice; packing
    a slice pair fills the lanes and halves per-slice pass-2 cost. Packed
    slices share one variant flag (the caller picks flags per pair; a
    mismatched orientation only moves points into the ok-masked failure
    set, never corrupts values).
    """
    f32 = jnp.float32
    R = pack * Xp  # stacked sublane rows

    # ---- per-row curve direction; flip so xs increases along iy
    dir_pos = xs[:, Y - 1 : Y] >= xs[:, 0:1]  # (R, 1)
    sgn = jnp.where(dir_pos, 1.0, -1.0).astype(f32)
    xs_m = xs * sgn

    # ---- branchless binary search: rightmost knot k <= col, k in [0, Y-2]
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, Wp), 1).astype(f32)
    cols_i = cols.astype(jnp.int32)
    cols_m = cols * sgn
    seg = jnp.zeros((R, Wp), jnp.int32)
    for st in _search_steps(Y - 1):
        cand = seg + st
        cand_c = jnp.minimum(cand, Y - 2)
        val = _gather_lanes(xs_m, cand_c)
        seg = jnp.where((cand <= Y - 2) & (val <= cols_m), cand, seg)

    # ---- inverse point map: q(c) = the point hosted at column c
    host_of = lambda v: jnp.clip(jnp.floor(v), 0, W - 2).astype(jnp.int32)
    xs_a = _gather_lanes(xs, seg)
    xs_b = _gather_lanes(xs, jnp.minimum(seg + 1, Y - 1))
    hit_a = host_of(xs_a) == cols_i
    q = jnp.where(hit_a, seg, jnp.minimum(seg + 1, Y - 1))  # (R, Wp)

    # hosted point's coordinates and bilinear weights, per column
    xs_q = jnp.where(hit_a, xs_a, xs_b)
    ys_q = _gather_lanes(ys, q)
    y0q = jnp.floor(ys_q)
    vyq = (ys_q - y0q).astype(f32)
    y0qi = y0q.astype(jnp.int32)
    vy0m = ((y0qi >= 0) & (y0qi <= H - 1)).astype(f32)
    vy1m = ((y0qi + 1 >= 0) & (y0qi + 1 <= H - 1)).astype(f32)
    # distance-based column weights handle edge hosting (x0 < 0 etc.)
    w0 = jnp.maximum(0.0, 1.0 - jnp.abs(xs_q - cols)) * (cols_i <= W - 1)
    w1 = jnp.maximum(0.0, 1.0 - jnp.abs(xs_q - (cols + 1.0))) * (
        cols_i + 1 <= W - 1
    )
    wA = w0 * (1.0 - vyq) * vy0m
    wB = w0 * vyq * vy1m
    wC = w1 * (1.0 - vyq) * vy0m
    wD = w1 * vyq * vy1m

    # transposed (column-sublane, row-lane) planes, shared across channels
    pad_lanes = LANE - R
    def tpose(a):
        return jnp.pad(a.T, ((0, 0), (0, pad_lanes))) if pad_lanes else a.T

    y0T_raw = tpose(y0q.astype(f32))
    idx0T = jnp.clip(y0T_raw, 0, H - 1).astype(jnp.int32)
    idx1T = jnp.clip(y0T_raw + 1.0, 0, H - 1).astype(jnp.int32)
    dt = hm_ref.dtype  # table/value precision (bf16 halves every vreg)
    wAT = tpose(wA).astype(dt)
    wBT = tpose(wB).astype(dt)
    wCT = tpose(wC).astype(dt)
    wDT = tpose(wD).astype(dt)

    # ---- per-point host columns + exactness mask
    xhost = host_of(xs)  # (R, Yp)
    q_at_host = _gather_lanes(q.astype(f32), xhost).astype(jnp.int32)
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (R, Yp), 1)
    okq = q_at_host == lane_p
    # points contributing nothing are fine regardless of hosting
    y0p = jnp.floor(ys).astype(jnp.int32)
    dead = (
        (xs <= -1.0) | (xs >= W) | ((y0p > H - 1) | (y0p + 1 < 0))
    )

    def emit_pts(a, h):
        """Write pack-half ``h``'s per-point plane back in the caller's
        lattice order as an (Xp, Y) block (no lane padding in HBM),
        transposing the valid square block when the branch swapped the
        lattice axes."""
        blk = a[h * Xp : h * Xp + Xp]
        if not lattice_t:
            return blk[:, :Y]
        sq = blk[:X, :Y].T  # slices are square (X == Y)
        return jnp.pad(sq, ((0, Xp - X), (0, 0)))

    ok_plane = (okq | dead).astype(f32)
    for h in range(pack):
        ok_ref[0, 0, pack * si + h] = emit_pts(ok_plane, h)
    live = okq & ~dead

    if packc:
        # channel-pair packing: two bf16 channels ride every gather AND the
        # per-channel transpose (the kernel's dominant cost) inside one
        # packed f32 plane; taps unpack to EXACT f32 for the weighted
        # combine, the combined value rounds to bf16 for the shared
        # transpose (the V2V consumer is bf16 anyway)
        J2 = (J + 1) // 2

        def channel_body(j2, carry):
            hm_c = hm_ref[0, j2]  # (Wp, Hp) packed f32
            hm_cn = jnp.concatenate(
                [hm_c[1:], jnp.zeros((1, hm_c.shape[1]), dt)], axis=0
            )
            a0, b0 = _unpack2(_gather_lanes(hm_c, idx0T))
            a1, b1 = _unpack2(_gather_lanes(hm_c, idx1T))
            a0n, b0n = _unpack2(_gather_lanes(hm_cn, idx0T))
            a1n, b1n = _unpack2(_gather_lanes(hm_cn, idx1T))
            va = a0 * wAT + a1 * wBT + a0n * wCT + a1n * wDT
            vb = b0 * wAT + b1 * wBT + b0n * wCT + b1n * wDT
            valT = _pack2(va, vb).T[:R]  # ONE transpose per channel pair
            oa, ob = _unpack2(_gather_lanes(valT, xhost))
            zero = jnp.zeros_like(oa)
            # the out array's channel dim is padded to 2*J2 (odd-J tail is
            # a dropped scratch channel), so both writes are unconditional
            for h in range(pack):
                out_ref[0, 0, pack * si + h, 2 * j2] = emit_pts(
                    jnp.where(live, oa, zero), h
                ).astype(out_ref.dtype)
                out_ref[0, 0, pack * si + h, 2 * j2 + 1] = emit_pts(
                    jnp.where(live, ob, zero), h
                ).astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, J2, channel_body, 0)
        return

    def channel_body(ch, carry):
        hm_c = hm_ref[0, ch]  # (Wp, Hp): column-major, y on lanes
        # next image column's data aligned to the hosting column's rows
        hm_cn = jnp.concatenate(
            [hm_c[1:], jnp.zeros((1, hm_c.shape[1]), dt)], axis=0
        )
        T0 = _gather_lanes(hm_c, idx0T)  # (Wp, 128)
        T1 = _gather_lanes(hm_c, idx1T)
        T0b = _gather_lanes(hm_cn, idx0T)
        T1b = _gather_lanes(hm_cn, idx1T)
        val = T0 * wAT + T1 * wBT + T0b * wCT + T1b * wDT  # (Wp, 128)
        valT = val.T[:R]  # (R, Wp) — the single per-channel transpose
        outv = _gather_lanes(valT, xhost)  # (R, Yp)
        outm = jnp.where(live, outv, jnp.zeros_like(outv))
        for h in range(pack):
            out_ref[0, 0, pack * si + h, ch] = emit_pts(outm, h)
        return carry

    jax.lax.fori_loop(0, J, channel_body, 0)


def _slice_warp_kernel(
    flip_ref, hm_ref, hms_ref, xs_ref, ys_ref, out_ref, ok_ref,
    *, H, W, X, Y, J, SB, Wp, Xp, Yp, Wsp, PACK, PACKC=False,
):
    """One (batch, slice-block) program; 4-way per-slice variant selection:
    bit 0 = hosting image axis (x or y — the projected pitch along the row
    must be >= ~1 px), bit 1 = lattice axis forming the rows (voxel-x or
    voxel-y — a voxel row pointing at the camera is foreshortened in BOTH
    image axes, but its perpendicular lattice axis never is).

    PACK=2 processes slice pairs stacked on sublanes (see _warp_slice); the
    pair shares the flag of its even slice."""
    sblk = pl.program_id(1)  # read outside cond/fori (interpret-mode limit)
    square = X == Y

    def slice_body(si, _):
        def lat_t(a):  # swap lattice axes (square valid block)
            sq = a[:X, :Y].T
            return jnp.pad(sq, ((0, Xp - X), (0, Yp - Y)))

        def stacked(lt):
            planes = []
            for h in range(PACK):
                xs_h = xs_ref[0, 0, PACK * si + h]  # (Xp, Yp)
                ys_h = ys_ref[0, 0, PACK * si + h]
                planes.append((lat_t(xs_h), lat_t(ys_h)) if lt else (xs_h, ys_h))
            if PACK == 1:
                return planes[0]
            return (
                jnp.concatenate([p[0] for p in planes], axis=0),
                jnp.concatenate([p[1] for p in planes], axis=0),
            )

        def mk(img_flip, lt):
            def br():
                xs_, ys_ = stacked(lt)
                if img_flip:
                    _warp_slice(
                        hms_ref, ys_, xs_, out_ref, ok_ref, si,
                        H=W, W=H, X=X, Y=Y, J=J, Wp=Wsp, Xp=Xp, Yp=Yp,
                        lattice_t=lt, pack=PACK, packc=PACKC,
                    )
                else:
                    _warp_slice(
                        hm_ref, xs_, ys_, out_ref, ok_ref, si,
                        H=H, W=W, X=X, Y=Y, J=J, Wp=Wp, Xp=Xp, Yp=Yp,
                        lattice_t=lt, pack=PACK, packc=PACKC,
                    )
            return br

        flag = flip_ref[0, sblk, PACK * si]
        if square:
            jax.lax.switch(
                jnp.clip(flag, 0, 3),
                [mk(0, 0), mk(1, 0), mk(0, 1), mk(1, 1)],
            )
        else:
            jax.lax.cond(flag != 0, mk(1, 0), mk(0, 0))
        return 0

    jax.lax.fori_loop(0, SB // PACK, slice_body, 0)


def _pick_slice_block(S: int) -> int:
    for sb in (8, 5, 4, 2):
        if S % sb == 0:
            return sb
    return 1


def kernel_packs_pairs(cube_xy, S: int) -> bool:
    """Static mirror of the kernel's slice-pair packing condition, for
    callers that must choose variant flags per pair."""
    X, Y = int(cube_xy[0]), int(cube_xy[1])
    Xp = _round_up(X, 8)
    return X == Y and 2 * Xp <= LANE and _pick_slice_block(S) % 2 == 0


def slice_warp_sample(
    heatmap: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    flip: jnp.ndarray = None,
    table_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable wrapper: Pallas forward + exact-adjoint backward.

    ``table_dtype`` sets the OUTPUT precision (bf16 halves the HBM write
    and downstream reshape traffic; the V2V consumer quantizes to bf16
    anyway, so this adds no error class the model doesn't already have).
    Kernel-internal tables stay f32: Mosaic's dynamic_gather does not lower
    for 16-bit operands (probed: i16/i32/u16 indices all fail to compile),
    so true bf16 tables wait on a Mosaic feature.

    Flip-flag semantics under slice-pair packing (advisor r4): when
    ``kernel_packs_pairs`` holds, each ODD slice's flip flag is silently
    OVERWRITTEN with its even pair-mate's before the kernel runs — the
    packed forward and packed adjoint share one variant flag per pair, so
    an odd slice whose own flag disagrees is sampled (and differentiated)
    with the even slice's orientation variant; points where that variant's
    hosting fails for the odd slice land in the ok-mask drop set. Callers
    that need per-slice flags exactly must pass pair-consistent flips
    (the production wrappers in ops/unproject.py choose flags per
    pair-mean pitch, so they always do).

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
    elif kernel_packs_pairs(xs.shape[2:4], S):
        # Slice-pair packing applies the EVEN slice's variant flag to both
        # slices of a pair — in the forward kernel AND in the (r4) packed
        # adjoint, which shares the same pair layout. Force pair-consistency
        # here so any caller passing pair-inconsistent flips (nothing forbids
        # it) gets the overridden-odd-slice semantics CONSISTENTLY in both
        # directions instead of misattributed heatmap gradients (advisor r3);
        # see the docstring note on which sampling variant odd slices get.
        flip = jnp.asarray(flip)
        flip = flip.at[:, 1::2].set(flip[:, 0::2])
    # bf16 requests take the channel-pair-packed kernel: two channels per
    # gather/transpose, values rounded to bf16 (exactly the requested
    # output precision — taps still combine in exact f32)
    packc = table_dtype == jnp.bfloat16
    out, ok = _vjp_fn(packc)(heatmap.astype(jnp.float32), xs, ys, flip)
    if table_dtype is not None and out.dtype != table_dtype:
        out = out.astype(table_dtype)
    return out, ok


@functools.lru_cache(maxsize=None)
def _vjp_fn(packc: bool):
    @jax.custom_vjp
    def f(heatmap, xs, ys, flip):
        return _slice_warp_impl(heatmap, xs, ys, flip, packc=packc)

    def fwd(heatmap, xs, ys, flip):
        out = _slice_warp_impl(heatmap, xs, ys, flip, packc=packc)
        sentinel = jnp.zeros((0,) + heatmap.shape[1:], heatmap.dtype)
        return out, (sentinel, xs, ys, flip, out[1])

    f.defvjp(fwd, _slice_warp_bwd)
    return f


def _slice_warp_bwd(res, ct):
    sentinel, xs, ys, flip, ok = res
    g, _ = ct  # ok mask is non-differentiable
    _, H, W, J = sentinel.shape
    B = xs.shape[0]
    hm_dtype = sentinel.dtype
    _, S, X, Y = xs.shape

    if _use_pallas_bwd():
        # Pallas adjoint: cumsum-boundary-gather accumulation, no scatters
        # (the XLA scatter-add below measured 19x the forward on v5e —
        # scripts/bench_train.py). Exact in the same geometric regime as
        # the forward; failed points' cotangents are masked identically.
        dhm = slice_warp_adjoint(
            (B, H, W, J), xs, ys, g, ok, flip=flip
        ).astype(hm_dtype)
        return (
            dhm,
            jnp.zeros_like(xs),
            jnp.zeros_like(ys),
            np.zeros((B, S), jax.dtypes.float0),
        )

    # hosting-failed points emit zeros in the forward, so they carry no
    # gradient to the heatmap either
    g = g.astype(jnp.float32) * ok[:, :, None, :, :]
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


def _slice_warp_impl(
    heatmap: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    flip: jnp.ndarray = None,
    packc: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp-resample voxel slices from one view's heatmaps (exact bilinear
    within the 4-tap band; see module docstring).

    Args:
      heatmap: (B, H, W, J) one view's heatmaps; H <= 256, W <= 256.
      xs, ys:  (B, S, X, Y) sample coords in heatmap pixels (align-corners
               convention: integer coords hit texel centers). X <= 128,
               2 <= Y <= 128.
      flip:    optional (B, S) int in [0, 3] — per-slice variant: bit 0
               swaps the hosting image axis, bit 1 swaps the lattice row
               axis (square slices only; clipped to [0, 1] otherwise).
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
    # slice-pair packing: two slices stacked on sublanes fill the 128-lane
    # pass-2 planes that a single <=64-row slice leaves half-padded — the
    # tap gathers and per-channel transposes (the dominant kernel cost)
    # then serve two slices each. Square slices only (the 4-way variant
    # set needs the lattice transpose) and even slice blocks.
    PACK = 2 if (X == Y and 2 * Xp <= LANE and SB % 2 == 0) else 1

    if flip is None:
        flip = jnp.zeros((B, S), jnp.int32)
    flip = flip.astype(jnp.int32).reshape(B, S // SB, SB)

    dt = jnp.float32  # Mosaic dynamic_gather has no 16-bit lowering yet
    hm_p = jnp.pad(
        heatmap, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0))
    ).astype(dt)
    if packc:
        # channel-pair packing: two bf16 channels per f32 table, so every
        # kernel gather/transpose serves two channels (see _warp_slice)
        J2 = (J + 1) // 2
        u = jax.lax.bitcast_convert_type(
            hm_p.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        if J % 2:
            u = jnp.pad(u, ((0, 0), (0, 0), (0, 0), (0, 1)))
        hm_p = jax.lax.bitcast_convert_type(
            u[..., 0::2] | (u[..., 1::2] << 16), jnp.float32
        )  # (B, Hp, Wp, J2)
        JT, JO, out_dt = J2, 2 * J2, jnp.bfloat16
    else:
        JT, JO, out_dt = J, J, dt
    # pre-transpose so the kernel sees (JT, Wp, Hp): image y on lanes — and
    # the axis-swapped layout (JT, Hp, Wp) for flipped slices
    hm_t = jnp.transpose(hm_p, (0, 3, 2, 1))  # (B, JT, Wp, Hp)
    hm_s = jnp.transpose(hm_p, (0, 3, 1, 2))  # (B, JT, Hp, Wp)
    xs_p = jnp.pad(xs, ((0, 0), (0, 0), (0, Xp - X), (0, Yp - Y))).astype(jnp.float32)
    ys_p = jnp.pad(ys, ((0, 0), (0, 0), (0, Xp - X), (0, Yp - Y))).astype(jnp.float32)
    xs_p = xs_p.reshape(B, S // SB, SB, Xp, Yp)
    ys_p = ys_p.reshape(B, S // SB, SB, Xp, Yp)

    kernel = functools.partial(
        _slice_warp_kernel,
        H=H, W=W, X=X, Y=Y, J=J, SB=SB, Wp=Wp, Xp=Xp, Yp=Yp, Wsp=Hp,
        PACK=PACK, PACKC=packc,
    )
    out, ok = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, S // SB, SB, JO, Xp, Y), out_dt),
            jax.ShapeDtypeStruct((B, S // SB, SB, Xp, Y), jnp.float32),
        ),
        grid=(B, S // SB),
        in_specs=[
            pl.BlockSpec(
                (1, S // SB, SB), lambda b, s: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, JT, Wp, Hp), lambda b, s: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, JT, Hp, Wp), lambda b, s: (b, 0, 0, 0),
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
                (1, 1, SB, JO, Xp, Y), lambda b, s: (b, s, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, SB, Xp, Y), lambda b, s: (b, s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=28 * 1024 * 1024,
        ),
    )(flip, hm_t, hm_s, xs_p, ys_p)
    out = out.reshape(B, S, JO, Xp, Y)[:, :, :J, :X]
    ok = ok.reshape(B, S, Xp, Y)[:, :, :X]
    return out, ok


def _slice_warp_agg_kernel(
    flip_ref, bnd_ref, hm_ref, hms_ref, xs_ref, ys_ref,
    out_ref, nfail_ref, samp_s, ok_s, acc_s, bacc_s,
    *, H, W, X, Y, J, SB, V, Wp, Xp, Yp, Wsp, PACK, PACKC, out_dt,
):
    """Fused multi-view sample + bounded-mean (inference path).

    Grid (B, S//SB, V) with the VIEW dim innermost: the f32 accumulators
    live in SCRATCH across the V steps of one (batch, slice-block), so the
    per-view samples and the running sums never round-trip HBM — the XLA
    view loop spent ~30 ms/batch on accumulator traffic at K=10 bench
    shapes (scripts/microbench_sampwrap.py). The bounded mean is
    normalized in-kernel on the last view and written once as ``out_dt``.
    """
    s_blk = pl.program_id(1)
    v = pl.program_id(2)
    square = X == Y

    def slice_body(si, _):
        def lat_t(a):
            sq = a[:X, :Y].T
            return jnp.pad(sq, ((0, Xp - X), (0, Yp - Y)))

        def stacked(lt):
            planes = []
            for h in range(PACK):
                xs_h = xs_ref[0, 0, PACK * si + h]
                ys_h = ys_ref[0, 0, PACK * si + h]
                planes.append((lat_t(xs_h), lat_t(ys_h)) if lt else (xs_h, ys_h))
            if PACK == 1:
                return planes[0]
            return (
                jnp.concatenate([p[0] for p in planes], axis=0),
                jnp.concatenate([p[1] for p in planes], axis=0),
            )

        def mk(img_flip, lt):
            def br():
                xs_, ys_ = stacked(lt)
                if img_flip:
                    _warp_slice(
                        hms_ref, ys_, xs_, samp_s, ok_s, si,
                        H=W, W=H, X=X, Y=Y, J=J, Wp=Wsp, Xp=Xp, Yp=Yp,
                        lattice_t=lt, pack=PACK, packc=PACKC,
                    )
                else:
                    _warp_slice(
                        hm_ref, xs_, ys_, samp_s, ok_s, si,
                        H=H, W=W, X=X, Y=Y, J=J, Wp=Wp, Xp=Xp, Yp=Yp,
                        lattice_t=lt, pack=PACK, packc=PACKC,
                    )
            return br

        # flip block is (1, S//SB, SB) in SMEM (full trailing dims — Mosaic's
        # block-shape rule rejects partial sub-(8,128) SMEM blocks)
        flag = flip_ref[0, s_blk, PACK * si]
        if square:
            jax.lax.switch(
                jnp.clip(flag, 0, 3),
                [mk(0, 0), mk(1, 0), mk(0, 1), mk(1, 1)],
            )
        else:
            jax.lax.cond(flag != 0, mk(1, 0), mk(0, 0))
        return 0

    jax.lax.fori_loop(0, SB // PACK, slice_body, 0)

    @pl.when(v == 0)
    def _init():
        acc_s[...] = jnp.zeros_like(acc_s)
        bacc_s[...] = jnp.zeros_like(bacc_s)

    bnd = bnd_ref[0, 0, :, :, :Y]  # (SB, Xp, Y); pad rows/cols are 0
    samp = samp_s[0, 0].astype(jnp.float32)  # (SB, JO, Xp, Y)
    acc_s[...] = acc_s[...] + samp * bnd[:, None]
    bacc_s[...] = bacc_s[...] + bnd
    # per-(b, slice-block, view) hosting-failure count (telemetry); padded
    # rows' ok is garbage — count valid rows only. The nfail block is the
    # full (S//SB, V) SMEM plane per batch (same Mosaic rule as flip).
    okb = ok_s[0, 0][:, :X]
    nfail_ref[0, s_blk, v] = jnp.sum(1.0 - okb)

    @pl.when(v == V - 1)
    def _finalize():
        mean = acc_s[...] / (bacc_s[...][:, None] + 1e-6)
        out_ref[0, 0] = jnp.clip(mean, 0.0, 1.0).astype(out_dt)


def slice_warp_sample_agg(
    heatmaps: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    bnd: jnp.ndarray,
    flip: jnp.ndarray,
    table_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-view fused forward (INFERENCE only — no custom VJP; training
    uses the per-view differentiable path).

    Args:
      heatmaps: (B, V, H, W, J)
      xs, ys:   (B, V, S, X, Y) heatmap-pixel coords
      bnd:      (B, V, S, X, Y) in-original-image mask
      flip:     (B, V, S) variant flags
    Returns:
      mean: (B, S, JO, X, Y) bounded mean over views (JO = J rounded up to
            the channel-pair packing), in ``table_dtype`` (bf16 packs).
      nfail: (B, V) per-view hosting-failure counts (telemetry).
    """
    B, V, H, W, J = heatmaps.shape
    S, X, Y = xs.shape[2], xs.shape[3], xs.shape[4]
    Wp = _round_up(W, LANE)
    Xp = _round_up(X, 8)
    Yp = _round_up(Y, LANE)
    Hp = _round_up(H, LANE)
    assert Hp <= 2 * LANE and Wp <= 2 * LANE and Xp <= LANE and Yp <= LANE
    SB = _pick_slice_block(S)
    PACK = 2 if (X == Y and 2 * Xp <= LANE and SB % 2 == 0) else 1
    packc = table_dtype == jnp.bfloat16

    BV = B * V
    flip = flip.astype(jnp.int32)
    if PACK == 2:
        flip = flip.at[:, :, 1::2].set(flip[:, :, 0::2])
    flip = flip.reshape(BV, S // SB, SB)

    dt = jnp.float32
    hm_p = jnp.pad(
        heatmaps, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W), (0, 0))
    ).astype(dt)
    if packc:
        J2 = (J + 1) // 2
        u = jax.lax.bitcast_convert_type(
            hm_p.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        if J % 2:
            u = jnp.pad(u, ((0, 0), (0, 0), (0, 0), (0, 0), (0, 1)))
        hm_p = jax.lax.bitcast_convert_type(
            u[..., 0::2] | (u[..., 1::2] << 16), jnp.float32
        )
        JT, JO, out_dt = J2, 2 * J2, jnp.bfloat16
    else:
        JT, JO, out_dt = J, J, dt
    hm_p = hm_p.reshape(BV, Hp, Wp, JT)
    hm_t = jnp.transpose(hm_p, (0, 3, 2, 1))  # (BV, JT, Wp, Hp)
    hm_s = jnp.transpose(hm_p, (0, 3, 1, 2))  # (BV, JT, Hp, Wp)

    def prep(a):
        a = jnp.pad(
            a, ((0, 0), (0, 0), (0, 0), (0, Xp - X), (0, Yp - Y))
        ).astype(jnp.float32)
        return a.reshape(BV, S // SB, SB, Xp, Yp)

    xs_p, ys_p, bnd_p = prep(xs), prep(ys), prep(bnd)

    kernel = functools.partial(
        _slice_warp_agg_kernel,
        H=H, W=W, X=X, Y=Y, J=J, SB=SB, V=V, Wp=Wp, Xp=Xp, Yp=Yp, Wsp=Hp,
        PACK=PACK, PACKC=packc, out_dt=out_dt,
    )
    bv = lambda b, s, v: (b * V + v, s, 0, 0, 0)
    mean, nfail = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, S // SB, SB, JO, Xp, Y), out_dt),
            jax.ShapeDtypeStruct((B, S // SB, V), jnp.float32),
        ),
        grid=(B, S // SB, V),
        in_specs=[
            pl.BlockSpec((1, S // SB, SB), lambda b, s, v: (b * V + v, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, SB, Xp, Yp), bv,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, JT, Wp, Hp),
                         lambda b, s, v: (b * V + v, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, JT, Hp, Wp),
                         lambda b, s, v: (b * V + v, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SB, Xp, Yp), bv,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SB, Xp, Yp), bv,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, SB, JO, Xp, Y),
                         lambda b, s, v: (b, s, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S // SB, V), lambda b, s, v: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, 1, SB, JO, Xp, Y), out_dt),
            pltpu.VMEM((1, 1, SB, Xp, Y), jnp.float32),
            pltpu.VMEM((SB, JO, Xp, Y), jnp.float32),
            pltpu.VMEM((SB, Xp, Y), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(flip, bnd_p, hm_t, hm_s, xs_p, ys_p)
    mean = mean.reshape(B, S, JO, Xp, Y)[:, :, :, :X]
    nfail = jnp.sum(nfail, axis=1)  # (B, V): total failures per view
    return mean, nfail


# ---------------------------------------------------------------------------
# Pallas adjoint: d(loss)/d(heatmap) without XLA scatters.
#
# The XLA scatter-add adjoint measured 19x the forward cost on v5e
# (scripts/bench_train.py r3) — TPU scatters run a serial loop. This kernel
# reuses the forward's column-hosted structure: every heatmap cell's
# contributions form a CONTIGUOUS run of the (monotone) hosted sequence
# along the perpendicular lattice axis, so the scatter becomes
#   per (slice, channel):  lane-cumsum of weighted cotangents
#   per slice (shared):    a branchless lane-binary-search cnt[c, h]
#   per tap class:         boundary gathers + a lane-difference
# — all VPU ops, no scatters. Same 4-variant orientation flags as the
# forward; cotangents of hosting-failed points are zeroed (matching the
# forward, whose outputs there don't depend on the heatmap).
# ---------------------------------------------------------------------------


def _lane_shift_right(a, sh):
    """a[:, l] <- a[:, l - sh] (zero fill)."""
    return jnp.pad(a, ((0, 0), (sh, 0)))[:, : a.shape[1]]


def _lane_cumsum(a):
    """Inclusive prefix sum along lanes via log-step shifted adds."""
    n = a.shape[1]
    sh = 1
    while sh < n:
        a = a + _lane_shift_right(a, sh)
        sh *= 2
    return a


def _sub_shift_down(a, sh=1):
    """a[c, :] <- a[c - sh, :] (zero fill): move contributions to col+sh."""
    return jnp.pad(a, ((sh, 0), (0, 0)))[: a.shape[0]]


def _adjoint_slice(g_ref, accA_ref, accB_ref, xs, ys, si, *, H, W, X, Y, J,
                   Wp, Xp, Yp, lattice_t: bool, pack: int, swapped: bool):
    """Accumulate one slice's (or packed pair's) heatmap cotangent.

    accA_ref: (J, Wp, Hp) accumulator in the x-hosted layout (columns on
    sublanes, image rows on lanes); accB_ref: (J, Wsp, Hsp) for the
    swapped orientation. ``swapped`` selects which one this slice feeds.
    """
    f32 = jnp.float32
    R = pack * Xp
    Hp = _round_up(H, LANE)

    # ---- pass 1 (identical to the forward)
    dir_pos = xs[:, Y - 1 : Y] >= xs[:, 0:1]
    sgn = jnp.where(dir_pos, 1.0, -1.0).astype(f32)
    xs_m = xs * sgn
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, Wp), 1).astype(f32)
    cols_i = cols.astype(jnp.int32)
    cols_m = cols * sgn
    seg = jnp.zeros((R, Wp), jnp.int32)
    for st in _search_steps(Y - 1):
        cand = seg + st
        cand_c = jnp.minimum(cand, Y - 2)
        val = _gather_lanes(xs_m, cand_c)
        seg = jnp.where((cand <= Y - 2) & (val <= cols_m), cand, seg)
    host_of = lambda v: jnp.clip(jnp.floor(v), 0, W - 2).astype(jnp.int32)
    xs_a = _gather_lanes(xs, seg)
    xs_b = _gather_lanes(xs, jnp.minimum(seg + 1, Y - 1))
    hit_a = host_of(xs_a) == cols_i
    q = jnp.where(hit_a, seg, jnp.minimum(seg + 1, Y - 1))
    xs_q = jnp.where(hit_a, xs_a, xs_b)
    ys_q = _gather_lanes(ys, q)
    y0q = jnp.floor(ys_q)
    vyq = (ys_q - y0q).astype(f32)
    y0qi = y0q.astype(jnp.int32)
    vy0m = ((y0qi >= 0) & (y0qi <= H - 1)).astype(f32)
    vy1m = ((y0qi + 1 >= 0) & (y0qi + 1 <= H - 1)).astype(f32)
    w0 = jnp.maximum(0.0, 1.0 - jnp.abs(xs_q - cols)) * (cols_i <= W - 1)
    w1 = jnp.maximum(0.0, 1.0 - jnp.abs(xs_q - (cols + 1.0))) * (
        cols_i + 1 <= W - 1
    )
    # the forward computes a candidate value at EVERY column but only the
    # point's true host column is gathered back; columns whose q doesn't
    # actually host there must contribute nothing to the adjoint
    hostm = (host_of(xs_q) == cols_i).astype(f32)
    wA = w0 * (1.0 - vyq) * vy0m * hostm
    wB = w0 * vyq * vy1m * hostm
    wC = w1 * (1.0 - vyq) * vy0m * hostm
    wD = w1 * vyq * vy1m * hostm

    xhost = host_of(xs)
    q_at_host = _gather_lanes(q.astype(f32), xhost).astype(jnp.int32)
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (R, Yp), 1)
    okq = q_at_host == lane_p
    y0p = jnp.floor(ys).astype(jnp.int32)
    dead = (xs <= -1.0) | (xs >= W) | ((y0p > H - 1) | (y0p + 1 < 0))
    live = (okq & ~dead).astype(f32)

    pad_lanes = LANE - R

    def tpose(a):
        return jnp.pad(a.T, ((0, 0), (0, pad_lanes))) if pad_lanes else a.T

    lane_r = jax.lax.broadcasted_iota(jnp.int32, (Wp, LANE), 1)
    # encoded index: count(y0 <= h) == cnt evaluated at h+1. Clipping at -1
    # (not 0) keeps the B/D taps of just-above-image points (y0 = -1,
    # target row 0) countable; entries at either clip boundary carry zero
    # weight via vy0m/vy1m, so over-counting them is harmless.
    idx0T = tpose(jnp.clip(y0q, -1.0, H - 1) + 1.0)  # f32 in [0, H]
    wAT, wBT, wCT, wDT = tpose(wA), tpose(wB), tpose(wC), tpose(wD)

    # Slice-PAIR packing (pack == 2): each packed slice occupies Xp lanes
    # (valid lanes [h*Xp, h*Xp + X)) and keeps its OWN monotone sequence,
    # direction, count search, and validity mask — the boundary counting
    # below runs per HALF, so the concatenated lanes never need to be
    # globally sorted. One transpose / gather / prefix-sum then serves two
    # slices (measured r4: cumsum 77 ms + movement 30 ms of the 161.8 ms
    # J=15 adjoint are lane-parallel work at 50% lane occupancy unpacked).
    halfno = (
        jnp.minimum(lane_r // Xp, pack - 1)
        if pack > 1
        else jnp.zeros_like(lane_r)
    )
    base = halfno * Xp
    local = lane_r - base
    # lattice-pad rows (X <= local < Xp) and beyond-R lanes carry garbage
    # indices mid-sequence, which breaks the per-half sorted-run property.
    # Replicate each half's last VALID row's index there (monotone plateau);
    # those lanes' values are zeroed below, so counting them is harmless.
    idx0T = _gather_128(idx0T, base + jnp.minimum(local, X - 1))
    valid_lane = local < X

    # per-column, per-half monotone direction; per-half reversal permutation
    dircs = [
        idx0T[:, h * Xp + X - 1 : h * Xp + X] >= idx0T[:, h * Xp : h * Xp + 1]
        for h in range(pack)
    ]
    if pack == 1:
        pos_dir = dircs[0]
    else:
        # int-valued select: Mosaic rejects selects with BOOL results
        # (i8->i1 truncation), predicates are fine
        pos_dir = (
            jnp.where(
                halfno == 0,
                dircs[0].astype(jnp.int32),
                dircs[1].astype(jnp.int32),
            )
            > 0
        )
    rev_local = jnp.where(pos_dir, local, (X - 1) - local)
    rev = jnp.clip(base + jnp.clip(rev_local, 0, Xp - 1), 0, LANE - 1)
    idx0R = _gather_128(idx0T, rev)
    # after reversal, pad lanes are duplicates of real lanes (descending
    # halves plateau at the front, which is NOT sorted) — push every
    # invalid lane to a sorted tail instead
    idx0R = jnp.where(valid_lane, idx0R, jnp.float32(2 * Hp + 2))

    # Validity guard (advisor r3): the boundary counting below is only
    # correct when each column's hosted-y0 sequence is monotone along r —
    # `dirc` infers the direction from the two ENDPOINTS, so an interior
    # non-monotone column (plausible for whole-space rows passing near a
    # camera) would silently miscount. Verify idx0R is actually sorted
    # after reversal WITHIN each half and ZERO violating (column, half)
    # contributions: their points' cotangents are dropped (the same
    # contract as the forward's ok mask) instead of corrupting d(heatmap).
    # The padded tail (2*Hp+2 > any encoded index) keeps the check valid;
    # the first lane of half 1 compares against half 0's tail — exempt it.
    asc_viol = (idx0R - _lane_shift_right(idx0R, 1)) < 0.0  # lane 0: vs 0-fill, never <0
    if pack > 1:
        asc_viol = asc_viol & (lane_r != Xp)
    asc_viol_f = asc_viol.astype(f32)
    col_oks = [
        1.0
        - jnp.max(
            asc_viol_f * (halfno == h).astype(f32)
            if pack > 1
            else asc_viol_f,
            axis=1,
            keepdims=True,
        )
        for h in range(pack)
    ]  # each (Wp, 1)

    # ---- per-slice search (channel-shared, per half): cnt[c, h] =
    # #{local r in the half: idx0R <= h}. With the +1 encoding, cnt[h]
    # counts y0 <= h-1 (= the B/D taps targeting row h); the A/C taps
    # (row h = y0) use cnt at h+1.
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (Wp, Hp), 1).astype(f32)
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (Wp, Hp), 1)
    cnts, cnts_p1 = [], []
    for h in range(pack):
        b0 = h * Xp
        cnt = jnp.zeros((Wp, Hp), jnp.int32)
        st = LANE  # counts live in [0, X] inclusive
        while st >= 1:
            cand = cnt + st
            v = _gather_128(idx0R, jnp.clip(b0 + cand - 1, 0, LANE - 1))
            cnt = jnp.where((cand <= Xp) & (v <= h_iota), cand, cnt)
            st //= 2
        # cnt at h+1 (left lane shift); at the top lane every countable
        # entry (idx0enc <= H, all in the half's X valid lanes) is included
        cnt_p1 = jnp.pad(cnt, ((0, 0), (0, 1)))[:, 1:]
        cnt_p1 = jnp.where(lane_h == Hp - 1, jnp.int32(X), cnt_p1)
        cnts.append(cnt)
        cnts_p1.append(cnt_p1)

    def boundary(S, c_plane, b0, first_half):
        """T(c, k) = S[c, b0 + k - 1] (k==0 on the first half -> 0; on
        later halves the natural gather at b0-1 returns the preceding
        halves' prefix, subtracted off by the caller)."""
        gathered = _gather_128(S, jnp.clip(b0 + c_plane - 1, 0, LANE - 1))
        if first_half:
            return jnp.where(c_plane > 0, gathered, jnp.zeros_like(gathered))
        return gathered

    def read_g(ch, h):
        blk = g_ref[0, 0, pack * si + h, ch]  # (Xp, Y)
        if not lattice_t:
            return blk
        sq = blk[:X, :Y].T
        return jnp.pad(sq, ((0, Xp - X), (0, 0)))

    acc_ref = accB_ref if swapped else accA_ref

    def channel_body(ch, carry):
        gpt_rows = [read_g(ch, h) for h in range(pack)]
        gpt = (
            gpt_rows[0] if pack == 1
            else jnp.concatenate(gpt_rows, axis=0)
        )  # (R, Y)
        if gpt.shape[1] < Yp:
            gpt = jnp.pad(gpt, ((0, 0), (0, Yp - gpt.shape[1])))
        gl = gpt.astype(f32) * live
        vq = _gather_lanes(gl, q)  # (R, Wp): cotangent of the hosted point
        vqT = tpose(vq)  # (Wp, 128)
        vqR = _gather_128(vqT, rev)
        # pad lanes: the clipped reversal duplicates real lanes' values
        # (descending halves) — zero them so nothing double-counts
        vqR = jnp.where(valid_lane, vqR, jnp.zeros_like(vqR))
        wATr = _gather_128(wAT, rev)
        wBTr = _gather_128(wBT, rev)
        wCTr = _gather_128(wCT, rev)
        wDTr = _gather_128(wDT, rev)

        if _ADJ_ABLATE == "nosegsum":  # movement-only cost attribution
            # one boundary-style gather keeps the (Wp, Hp) acc shape
            acc_ref[0, ch] = acc_ref[0, ch] + _gather_128(
                wATr * vqR, jnp.clip(cnts[0], 0, LANE - 1)
            )
            return carry

        if _ADJ_ABLATE == "nocumsum":  # prefix sums skipped (wrong math)
            SA, SB = wATr * vqR, wBTr * vqR
            SC, SD = wCTr * vqR, wDTr * vqR
        else:
            SA = _lane_cumsum(wATr * vqR)
            SB = _lane_cumsum(wBTr * vqR)
            SC = _lane_cumsum(wCTr * vqR)
            SD = _lane_cumsum(wDTr * vqR)

        own_sum = nxt_sum = None
        for hh in range(pack):
            b0 = hh * Xp
            first = hh == 0
            FA = boundary(SA, cnts_p1[hh], b0, first)  # A/C: count at h+1
            FB = boundary(SB, cnts[hh], b0, first)     # B/D: count at h
            FC = boundary(SC, cnts_p1[hh], b0, first)
            FD = boundary(SD, cnts[hh], b0, first)
            if not first:
                # later halves ride the cumsum's running prefix: subtract
                # the preceding halves' total (telescopes out of the h-row
                # differences except at h = 0, which needs it removed)
                FA = FA - SA[:, b0 - 1 : b0]
                FB = FB - SB[:, b0 - 1 : b0]
                FC = FC - SC[:, b0 - 1 : b0]
                FD = FD - SD[:, b0 - 1 : b0]
            dA = FA - _lane_shift_right(FA, 1)
            dB = FB - _lane_shift_right(FB, 1)
            dC = FC - _lane_shift_right(FC, 1)
            dD = FD - _lane_shift_right(FD, 1)
            own = (dA + dB) * col_oks[hh]
            nxt = (dC + dD) * col_oks[hh]
            own_sum = own if first else own_sum + own
            nxt_sum = nxt if first else nxt_sum + nxt
        # col_ok masks per (HOST column, half): both the own-column (A/B)
        # and next-column (C/D, applied before the sublane shift) taps
        contrib = own_sum + _sub_shift_down(nxt_sum, 1)
        # acc block is (1, J, Wp, Hp): index past the unit batch-block dim
        acc_ref[0, ch] = acc_ref[0, ch] + contrib
        return carry

    jax.lax.fori_loop(0, J, channel_body, 0)


def _slice_warp_adjoint_kernel(
    flip_ref, xs_ref, ys_ref, g_ref, accA_ref, accB_ref,
    *, H, W, X, Y, J, SB, Wp, Xp, Yp, Wsp, PACK,
):
    """One (batch, slice-block) program accumulating d(heatmap).

    Both output accumulators map every slice-block step to the same block
    (Pallas TPU grids run sequentially, so revisited blocks stay in VMEM);
    step 0 zero-initializes them."""
    sblk = pl.program_id(1)
    square = X == Y

    @pl.when(sblk == 0)
    def _init():
        accA_ref[...] = jnp.zeros_like(accA_ref)
        accB_ref[...] = jnp.zeros_like(accB_ref)

    def slice_body(si, _):
        def lat_t(a):
            sq = a[:X, :Y].T
            return jnp.pad(sq, ((0, Xp - X), (0, Yp - Y)))

        def stacked(lt):
            planes = []
            for h in range(PACK):
                xs_h = xs_ref[0, 0, PACK * si + h]
                ys_h = ys_ref[0, 0, PACK * si + h]
                planes.append((lat_t(xs_h), lat_t(ys_h)) if lt else (xs_h, ys_h))
            if PACK == 1:
                return planes[0]
            return (
                jnp.concatenate([p[0] for p in planes], axis=0),
                jnp.concatenate([p[1] for p in planes], axis=0),
            )

        def mk(img_flip, lt):
            def br():
                xs_, ys_ = stacked(lt)
                if img_flip:
                    _adjoint_slice(
                        g_ref, accA_ref, accB_ref, ys_, xs_, si,
                        H=W, W=H, X=X, Y=Y, J=J, Wp=Wsp, Xp=Xp, Yp=Yp,
                        lattice_t=lt, pack=PACK, swapped=True,
                    )
                else:
                    _adjoint_slice(
                        g_ref, accA_ref, accB_ref, xs_, ys_, si,
                        H=H, W=W, X=X, Y=Y, J=J, Wp=Wp, Xp=Xp, Yp=Yp,
                        lattice_t=lt, pack=PACK, swapped=False,
                    )
            return br

        flag = flip_ref[0, sblk, PACK * si]
        if square:
            jax.lax.switch(
                jnp.clip(flag, 0, 3),
                [mk(0, 0), mk(1, 0), mk(0, 1), mk(1, 1)],
            )
        else:
            jax.lax.cond(flag != 0, mk(1, 0), mk(0, 0))
        return 0

    jax.lax.fori_loop(0, SB // PACK, slice_body, 0)


def slice_warp_adjoint(
    heatmap_shape, xs, ys, g, ok, flip=None,
):
    """d(loss)/d(heatmap) for slice_warp_sample via the Pallas adjoint.

    Args:
      heatmap_shape: static (B, H, W, J).
      xs, ys: (B, S, X, Y) as in the forward.
      g:      (B, S, J, X, Y) output cotangents.
      ok:     (B, S, X, Y) forward ok mask (failed points carry none).
      flip:   (B, S) variant flags (must match the forward call).
    Returns:
      dhm (B, H, W, J) float32.

    Exactness contract: exact adjoint of the forward's 4-tap bilinear
    wherever each image column's hosted-y0 sequence is monotone along the
    perpendicular lattice axis. Columns violating that (checked in-kernel;
    interior non-monotonicity the endpoint direction test can't see) have
    their points' cotangents DROPPED, never misattributed — the same
    fail-closed contract as the forward's ok mask.
    """
    B, H, W, J = heatmap_shape
    S, X, Y = xs.shape[1], xs.shape[2], xs.shape[3]
    Wp = _round_up(W, LANE)
    Xp = _round_up(X, 8)
    Yp = _round_up(Y, LANE)
    Hp = _round_up(H, LANE)
    SB = _pick_slice_block(S)
    # slice-PAIR packing under the same static condition as the forward:
    # the boundary counting runs per HALF (two independent monotone
    # sequences, counts, and validity masks), so one transpose + gather +
    # prefix-sum pipeline serves two slices. Callers reaching this through
    # the custom VJP always have pair-consistent flip flags (the forward
    # forces them); slice_warp_adjoint applies the even slice's flag to
    # both, exactly like the packed forward.
    PACK = 2 if kernel_packs_pairs((X, Y), S) else 1

    if flip is None:
        flip = jnp.zeros((B, S), jnp.int32)
    flip = flip.astype(jnp.int32).reshape(B, S // SB, SB)
    xs_p = jnp.pad(xs, ((0, 0), (0, 0), (0, Xp - X), (0, Yp - Y))).astype(jnp.float32)
    ys_p = jnp.pad(ys, ((0, 0), (0, 0), (0, Xp - X), (0, Yp - Y))).astype(jnp.float32)
    xs_p = xs_p.reshape(B, S // SB, SB, Xp, Yp)
    ys_p = ys_p.reshape(B, S // SB, SB, Xp, Yp)
    g_m = g.astype(jnp.float32) * ok[:, :, None, :, :]
    g_p = jnp.pad(g_m, ((0, 0), (0, 0), (0, 0), (0, Xp - X), (0, 0)))
    g_p = g_p.reshape(B, S // SB, SB, J, Xp, Y)

    kernel = functools.partial(
        _slice_warp_adjoint_kernel,
        H=H, W=W, X=X, Y=Y, J=J, SB=SB, Wp=Wp, Xp=Xp, Yp=Yp, Wsp=Hp,
        PACK=PACK,
    )
    accA, accB = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, J, Wp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((B, J, Hp, Wp), jnp.float32),
        ),
        grid=(B, S // SB),
        in_specs=[
            pl.BlockSpec((1, S // SB, SB), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, SB, Xp, Yp), lambda b, s: (b, s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SB, Xp, Yp), lambda b, s: (b, s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SB, J, Xp, Y), lambda b, s: (b, s, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, J, Wp, Hp), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J, Hp, Wp), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(flip, xs_p, ys_p, g_p)
    # accA is (J, W-columns, H-rows); accB is the swapped orientation
    # (J, H-columns, W-rows) — both transpose into (H, W, J)
    dhm = (
        jnp.transpose(accA[:, :, :W, :H], (0, 3, 2, 1))
        + jnp.transpose(accB[:, :, :H, :W], (0, 2, 3, 1))
    )
    return dhm
