"""Accuracy tests for the slice-warp Pallas sampler.

Runs in Pallas interpreter mode on CPU (the TPU path is exercised by
bench/TPU runs). The kernel is exact bilinear within its 4-tap band (see
ops/slicewarp.py), so tolerances here are float-roundoff, not approximation
bounds — including on steep-curve fixtures, per-slice flip flags, and the
whole-space both-orientations mode.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import selfpose3d_tpu.ops.slicewarp as sw
from selfpose3d_tpu.ops.sampling import grid_sample_bilinear_cmajor


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Force pallas interpret mode for CPU testing."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        return orig(*args, **kw)

    monkeypatch.setattr(sw.pl, "pallas_call", patched)


def smooth_heatmap(rs, B, H, W, J):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    hm = np.zeros((B, H, W, J), np.float32)
    for b in range(B):
        for j in range(J):
            for _ in range(3):
                cy, cx = rs.uniform(8, H - 8), rs.uniform(8, W - 8)
                hm[b, :, :, j] += np.exp(
                    -(((yy - cy) / 4) ** 2 + ((xx - cx) / 4) ** 2) / 2
                )
    return np.clip(hm, 0, 1)


def scatter_adjoint_ref(shape, xs, ys, g, ok):
    """The masked bilinear scatter (== XLA backward) in numpy."""
    B, H, W, J = shape
    S, X, Y = xs.shape[1:]
    ok5 = np.asarray(ok)[:, :, None, :, :]
    gm = np.asarray(g) * ok5
    N = S * X * Y
    px = np.asarray(xs).reshape(B, N)
    py = np.asarray(ys).reshape(B, N)
    g_pt = gm.transpose(0, 1, 3, 4, 2).reshape(B, N, J)
    x0 = np.floor(px)
    y0 = np.floor(py)
    ux, vy = px - x0, py - y0
    ref = np.zeros((B, H * W, J), np.float32)
    for dy, dx, w in ((0, 0, (1 - ux) * (1 - vy)), (0, 1, ux * (1 - vy)),
                      (1, 0, (1 - ux) * vy), (1, 1, ux * vy)):
        yi = (y0 + dy).astype(int)
        xi = (x0 + dx).astype(int)
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        rows = np.clip(yi, 0, H - 1) * W + np.clip(xi, 0, W - 1)
        for b in range(B):
            np.add.at(ref[b], rows[b], g_pt[b] * (w[b] * valid[b])[:, None])
    return ref.reshape(B, H, W, J)


def exact_bilinear(hm, xs, ys):
    B, H, W, J = hm.shape
    _, S, X, Y = xs.shape
    grid = np.stack(
        [xs / (W - 1) * 2 - 1, ys / (H - 1) * 2 - 1], axis=-1
    ).reshape(B, S * X * Y, 2)
    return np.asarray(
        jax.vmap(grid_sample_bilinear_cmajor)(jnp.asarray(hm), jnp.asarray(grid))
    ).reshape(B, J, S, X, Y).transpose(0, 2, 1, 3, 4)


class TestSliceWarp:
    def test_exact_bilinear_on_shallow_curves(self, rng):
        B, H, W, J = 1, 128, 240, 4
        S, X, Y = 2, 64, 64
        hm = smooth_heatmap(rng, B, H, W, J)

        u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
        xs = np.zeros((B, S, X, Y), np.float32)
        ys = np.zeros((B, S, X, Y), np.float32)
        for s in range(S):
            den = 1.0 + 0.0008 * u + 0.0005 * v
            xs[0, s] = (12 + 3.2 * v + 0.4 * u + 5 * s) / den
            ys[0, s] = (9 + 1.5 * u + 0.25 * v + 3 * s) / den

        out, ok = sw.slice_warp_sample(
            jnp.asarray(hm), jnp.asarray(xs), jnp.asarray(ys)
        )
        exact = exact_bilinear(hm, xs, ys)
        assert np.asarray(ok).min() == 1.0
        np.testing.assert_allclose(np.asarray(out), exact, atol=2e-5)

    def test_exact_on_steep_curves_with_flip(self, rng):
        """Rows running steeper than |dy/dx|=1: flipped warp stays exact."""
        B, H, W, J = 1, 128, 240, 3
        S, X, Y = 1, 16, 64
        hm = smooth_heatmap(rng, B, H, W, J)
        u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
        den = 1.0 + 0.001 * u + 0.0006 * v
        xs = ((40 + 0.35 * v + 1.1 * u) / den)[None, None].astype(np.float32)
        ys = ((6 + 1.8 * v + 0.4 * u) / den)[None, None].astype(np.float32)

        flip = jnp.ones((B, S), jnp.int32)
        out, ok = sw.slice_warp_sample(
            jnp.asarray(hm), jnp.asarray(xs), jnp.asarray(ys), flip=flip
        )
        exact = exact_bilinear(hm, xs, ys)
        assert np.asarray(ok).min() == 1.0
        np.testing.assert_allclose(np.asarray(out), exact, atol=2e-5)

        # without the flip, the band breaks somewhere and ok reports it
        _, ok_noflip = sw.slice_warp_sample(
            jnp.asarray(hm), jnp.asarray(xs), jnp.asarray(ys)
        )
        assert np.asarray(ok_noflip).min() == 0.0

    def test_decreasing_curve_direction(self, rng):
        """Rows whose projected x decreases along iy must still sample right."""
        B, H, W, J = 1, 128, 240, 2
        S, X, Y = 1, 16, 64
        hm = smooth_heatmap(rng, B, H, W, J)
        u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
        xs = (200 - 2.5 * v - 0.3 * u)[None, None].astype(np.float32)
        ys = (20 + 1.2 * u + 0.2 * v)[None, None].astype(np.float32)

        out, ok = sw.slice_warp_sample(
            jnp.asarray(hm), jnp.asarray(xs), jnp.asarray(ys)
        )
        exact = exact_bilinear(hm, xs, ys)
        assert np.asarray(ok).min() == 1.0
        np.testing.assert_allclose(np.asarray(out), exact, atol=2e-5)

    def test_out_of_image_taps_zero(self, rng):
        B, H, W, J = 1, 128, 240, 1
        hm = np.ones((B, H, W, J), np.float32)
        X, Y = 8, 64
        # entire slice far outside the image
        xs = np.full((B, 1, X, Y), 500.0, np.float32)
        # small jitter so curve direction is defined
        xs += np.arange(Y, dtype=np.float32)[None, None, None, :] * 0.01
        ys = np.full((B, 1, X, Y), 300.0, np.float32)
        out, _ = sw.slice_warp_sample(
            jnp.asarray(hm), jnp.asarray(xs), jnp.asarray(ys)
        )
        assert np.abs(np.asarray(out)).max() == 0.0

    def test_non_128_heatmap_height(self, rng):
        """Shape generality: H=32, W=64 heatmaps (small test configs)."""
        B, H, W, J = 1, 32, 64, 2
        S, X, Y = 1, 8, 16
        hm = smooth_heatmap(rng, B, H, W, J)
        u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
        xs = (3 + 3.1 * v + 0.2 * u)[None, None].astype(np.float32)
        ys = (4 + 0.9 * u + 0.3 * v)[None, None].astype(np.float32)
        out, ok = sw.slice_warp_sample(
            jnp.asarray(hm), jnp.asarray(xs), jnp.asarray(ys)
        )
        exact = exact_bilinear(hm, xs, ys)
        assert np.asarray(ok).min() == 1.0
        np.testing.assert_allclose(np.asarray(out), exact, atol=2e-5)


class TestSliceWarpVJP:
    def test_grad_matches_exact_gather(self, rng):
        """d(loss)/d(heatmap) through the warp kernel == through the exact
        gather path (the backward is the exact 4-tap scatter adjoint)."""
        B, H, W, J = 1, 32, 64, 2
        S, X, Y = 1, 8, 16
        hm = smooth_heatmap(rng, B, H, W, J)
        u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
        xs = (3 + 3.1 * v + 0.2 * u)[None, None].astype(np.float32)
        ys = (4 + 0.9 * u + 0.3 * v)[None, None].astype(np.float32)
        g = rng.rand(B, S, J, X, Y).astype(np.float32)

        def loss_warp(h):
            out, _ = sw.slice_warp_sample(h, jnp.asarray(xs), jnp.asarray(ys))
            return jnp.sum(out * g)

        def loss_exact(h):
            grid = jnp.stack(
                [jnp.asarray(xs) / (W - 1) * 2 - 1,
                 jnp.asarray(ys) / (H - 1) * 2 - 1], axis=-1
            ).reshape(B, S * X * Y, 2)
            out = jax.vmap(grid_sample_bilinear_cmajor)(h, grid)
            out = out.reshape(B, J, S, X, Y).transpose(0, 2, 1, 3, 4)
            return jnp.sum(out * g)

        h = jnp.asarray(hm)
        gw = jax.grad(loss_warp)(h)
        ge = jax.grad(loss_exact)(h)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(ge), atol=1e-4)

    def test_coords_get_zero_grads(self, rng):
        hm = jnp.asarray(smooth_heatmap(rng, 1, 32, 64, 1))
        xs = jnp.asarray((5 + np.mgrid[0:4, 0:8][1] * 2.0)[None, None], jnp.float32)
        ys = jnp.asarray((5 + np.mgrid[0:4, 0:8][0] * 1.0)[None, None], jnp.float32)
        gx = jax.grad(lambda a: jnp.sum(sw.slice_warp_sample(hm, a, ys)[0]))(xs)
        assert float(jnp.abs(gx).max()) == 0.0


class TestTableDtype:
    def test_bf16_tables_close_to_f32(self, rng):
        """bf16 table mode: no error class beyond the model's own bf16
        quantization of the V2V input (bounded by ~2^-8 of the value)."""
        B, H, W, J = 1, 64, 128, 3
        S, X, Y = 2, 16, 32
        hm = smooth_heatmap(rng, B, H, W, J)
        u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
        xs = (5 + 3.0 * v + 0.3 * u)[None, None].astype(np.float32)
        xs = np.concatenate([xs, xs + 4.0], axis=1)
        ys = (6 + 1.1 * u + 0.2 * v)[None, None].astype(np.float32)
        ys = np.concatenate([ys, ys + 2.0], axis=1)

        out32, ok32 = sw.slice_warp_sample(
            jnp.asarray(hm), jnp.asarray(xs), jnp.asarray(ys)
        )
        out16, ok16 = sw.slice_warp_sample(
            jnp.asarray(hm), jnp.asarray(xs), jnp.asarray(ys),
            table_dtype=jnp.bfloat16,
        )
        assert out16.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(ok32), np.asarray(ok16))
        err = np.abs(np.asarray(out16, np.float32) - np.asarray(out32))
        assert err.max() < 0.02, err.max()


class TestPallasAdjoint:
    def test_adjoint_matches_scatter(self, rng):
        """The Pallas cumsum-boundary adjoint == the XLA scatter adjoint
        (the TPU backward path; scatter measured 19x the forward on v5e).
        Covers ascending/descending rows, the swapped-image variant, and
        multi-channel accumulation."""
        B, H, W, J = 1, 64, 96, 3
        S, X, Y = 2, 16, 32
        hm = jnp.asarray(smooth_heatmap(rng, B, H, W, J)[:, :H, :W])
        u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
        xs = np.zeros((B, S, X, Y), np.float32)
        ys = np.zeros((B, S, X, Y), np.float32)
        xs[0, 0] = 5 + 2.4 * v + 0.3 * u
        ys[0, 0] = 4 + 1.3 * u + 0.2 * v
        xs[0, 1] = 88 - 2.2 * v - 0.2 * u  # decreasing direction
        ys[0, 1] = 8 + 1.1 * u + 0.15 * v
        out, ok = sw.slice_warp_sample(hm, jnp.asarray(xs), jnp.asarray(ys))
        g = rng.rand(B, S, J, X, Y).astype(np.float32)

        # reference: the masked bilinear scatter (the XLA backward)
        ok5 = np.asarray(ok)[:, :, None, :, :]
        gm = g * ok5
        N = S * X * Y
        px = xs.reshape(B, N)
        py = ys.reshape(B, N)
        g_pt = gm.transpose(0, 1, 3, 4, 2).reshape(B, N, J)
        x0 = np.floor(px)
        y0 = np.floor(py)
        ux, vy = px - x0, py - y0
        ref = np.zeros((B, H * W, J), np.float32)
        for dy, dx, w in ((0, 0, (1 - ux) * (1 - vy)), (0, 1, ux * (1 - vy)),
                          (1, 0, (1 - ux) * vy), (1, 1, ux * vy)):
            yi = (y0 + dy).astype(int)
            xi = (x0 + dx).astype(int)
            valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            rows = np.clip(yi, 0, H - 1) * W + np.clip(xi, 0, W - 1)
            for b in range(B):
                np.add.at(ref[b], rows[b], g_pt[b] * (w[b] * valid[b])[:, None])
        ref = ref.reshape(B, H, W, J)

        got = np.asarray(sw.slice_warp_adjoint(
            (B, H, W, J), jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(g), ok
        ))
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_adjoint_slice_pair_packed(self, rng):
        """PACK=2 path (square lattice, even slice block): per-half
        boundary counting must equal the scatter adjoint with mixed
        ascending/descending slices inside one packed pair, plus the
        swapped-image variant via flip flags (pair-consistent, as the
        packed forward forces)."""
        B, H, W, J = 1, 64, 96, 3
        S, X, Y = 4, 16, 16
        assert sw.kernel_packs_pairs((X, Y), S)
        u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
        xs = np.zeros((B, S, X, Y), np.float32)
        ys = np.zeros((B, S, X, Y), np.float32)
        # pair 0: ascending then DESCENDING half (independent directions)
        xs[0, 0] = 5 + 3.1 * v + 0.3 * u
        ys[0, 0] = 4 + 2.0 * u + 0.2 * v
        xs[0, 1] = 88 - 3.3 * v - 0.2 * u
        ys[0, 1] = 8 + 1.9 * u + 0.15 * v
        # pair 1: swapped-image variant (steep in the y coordinate ->
        # flip=1 on both). The hosting coordinate (ys here) carries NO
        # u-slope so the hosted point never jumps along the lattice row —
        # keeping every column's hosted sequence strictly monotone (the
        # adjoint's exactness regime; jumpy hostings are covered by
        # test_nonmonotone_column_drops_not_corrupts).
        xs[0, 2] = 10 + 0.2 * v + 0.25 * u
        ys[0, 2] = 3 + 3.2 * v
        xs[0, 3] = 80 - 0.25 * v - 0.4 * u
        ys[0, 3] = 5 + 3.0 * v
        flip = jnp.asarray([[0, 0, 1, 1]], jnp.int32)
        # flip=1 slices sample the swapped image: forward/adjoint treat
        # (xs, ys) as (ys, xs) internally; the scatter reference needs no
        # flag (it scatters by raw coordinates)
        g = rng.rand(B, S, J, X, Y).astype(np.float32)
        ok = jnp.ones((B, S, X, Y), jnp.float32)
        ref = scatter_adjoint_ref((B, H, W, J), xs, ys, g, ok)
        got = np.asarray(sw.slice_warp_adjoint(
            (B, H, W, J), jnp.asarray(xs), jnp.asarray(ys),
            jnp.asarray(g), ok, flip=flip,
        ))
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_adjoint_packed_equals_unpacked(self, rng, monkeypatch):
        """The packed (PACK=2) and forced-unpacked adjoints agree exactly
        on identical inputs."""
        B, H, W, J = 1, 64, 96, 2
        S, X, Y = 2, 16, 16
        u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
        xs = np.zeros((B, S, X, Y), np.float32)
        ys = np.zeros((B, S, X, Y), np.float32)
        xs[0, 0] = 5 + 3.1 * v + 0.3 * u
        ys[0, 0] = 4 + 2.0 * u + 0.2 * v
        xs[0, 1] = 88 - 3.3 * v - 0.2 * u
        ys[0, 1] = 8 + 1.9 * u + 0.15 * v
        g = rng.rand(B, S, J, X, Y).astype(np.float32)
        ok = jnp.ones((B, S, X, Y), jnp.float32)
        args = ((B, H, W, J), jnp.asarray(xs), jnp.asarray(ys),
                jnp.asarray(g), ok)
        packed = np.asarray(sw.slice_warp_adjoint(*args))
        monkeypatch.setattr(sw, "kernel_packs_pairs", lambda *a: False)
        unpacked = np.asarray(sw.slice_warp_adjoint(*args))
        np.testing.assert_allclose(packed, unpacked, atol=1e-6)

    def test_fused_agg_matches_per_view(self, rng):
        """slice_warp_sample_agg (multi-view fused, inference path) ==
        per-view forward + masked mean, incl. bf16 channel-pair packing
        and pair-consistent flip variants."""
        B, V, H, W, J = 1, 2, 64, 96, 5
        S, X, Y = 4, 16, 16
        hm = jnp.asarray(rng.rand(B, V, H, W, J).astype(np.float32))
        u, vg = np.mgrid[0:X, 0:Y].astype(np.float32)
        xs = np.zeros((B, V, S, X, Y), np.float32)
        ys = np.zeros((B, V, S, X, Y), np.float32)
        flips = np.zeros((B, V, S), np.int32)
        for vv in range(V):
            for s in range(S):
                if s < 2:
                    xs[0, vv, s] = 5 + 2.8 * vg + 0.1 * u + 2 * s
                    ys[0, vv, s] = 4 + 1.5 * u + 0.1 * vg + s
                else:  # steep in y -> swapped variant, pair-consistent
                    xs[0, vv, s] = 10 + 0.2 * vg + 0.3 * u + s
                    ys[0, vv, s] = 3 + 3.0 * vg + s
                    flips[0, vv, s] = 1
        bnd = (rng.rand(B, V, S, X, Y) > 0.3).astype(np.float32)

        for dt, tol in ((None, 1e-6), (jnp.bfloat16, 4e-3)):
            ws = np.zeros((B, S, J, X, Y), np.float32)
            bs = np.zeros((B, S, X, Y), np.float32)
            for vv in range(V):
                out, _ = sw.slice_warp_sample(
                    hm[:, vv], jnp.asarray(xs[:, vv]), jnp.asarray(ys[:, vv]),
                    flip=jnp.asarray(flips[:, vv]), table_dtype=dt,
                )
                ws += np.asarray(out, dtype=np.float32) * bnd[:, vv][:, :, None]
                bs += bnd[:, vv]
            ref = np.clip(ws / (bs[:, :, None] + 1e-6), 0, 1)
            mean, nfail = sw.slice_warp_sample_agg(
                hm, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(bnd),
                jnp.asarray(flips), table_dtype=dt,
            )
            got = np.asarray(mean, dtype=np.float32)[:, :, :J]
            np.testing.assert_allclose(got, ref, atol=tol)
            assert nfail.shape == (B, V)

    def test_adjoint_top_edge(self, rng):
        """Points straddling the top image border (y0 = -1): their B/D
        taps land on row 0 — pinned by the +1 count encoding."""
        B, H, W, J = 1, 64, 96, 2
        S, X, Y = 1, 8, 32
        hm = jnp.asarray(smooth_heatmap(rng, B, H, W, J)[:, :H, :W])
        u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
        xs = (3 + 2.8 * v + 0.2 * u)[None, None].astype(np.float32)
        ys = (-0.6 + 0.35 * u + 0.02 * v)[None, None].astype(np.float32)
        out, ok = sw.slice_warp_sample(hm, jnp.asarray(xs), jnp.asarray(ys))
        g = rng.rand(B, S, J, X, Y).astype(np.float32)
        gm = g * np.asarray(ok)[:, :, None, :, :]
        N = S * X * Y
        px, py = xs.reshape(B, N), ys.reshape(B, N)
        g_pt = gm.transpose(0, 1, 3, 4, 2).reshape(B, N, J)
        x0, y0 = np.floor(px), np.floor(py)
        ux, vy = px - x0, py - y0
        ref = np.zeros((B, H * W, J), np.float32)
        for dy, dx, w in ((0, 0, (1 - ux) * (1 - vy)), (0, 1, ux * (1 - vy)),
                          (1, 0, (1 - ux) * vy), (1, 1, ux * vy)):
            yi, xi = (y0 + dy).astype(int), (x0 + dx).astype(int)
            valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            rows = np.clip(yi, 0, H - 1) * W + np.clip(xi, 0, W - 1)
            np.add.at(ref[0], rows[0], g_pt[0] * (w[0] * valid[0])[:, None])
        ref = ref.reshape(B, H, W, J)
        got = np.asarray(sw.slice_warp_adjoint(
            (B, H, W, J), jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(g), ok
        ))
        assert ref[0, 0].max() > 0  # row 0 genuinely receives mass
        np.testing.assert_allclose(got, ref, atol=2e-5)


class TestRandomizedExactRegime:
    def test_forward_and_adjoint_fuzz(self, rng):
        """Randomized geometries inside the exactness regime (jump-free
        hosting: the hosting coordinate has no lattice-row slope; the
        hosted coordinate is strictly monotone along rows): forward ==
        exact bilinear and adjoint == scatter, across directions,
        steepness, offsets, and packed pairs."""
        B, H, W, J = 1, 64, 96, 2
        S, X, Y = 2, 16, 16
        u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
        for trial in range(6):
            xs = np.zeros((B, S, X, Y), np.float32)
            ys = np.zeros((B, S, X, Y), np.float32)
            for s in range(S):
                sx = rng.uniform(1.5, 4.0) * (1 if rng.rand() < 0.5 else -1)
                x0 = rng.uniform(10, 80) if sx > 0 else rng.uniform(30, 90)
                ry = rng.uniform(0.5, 2.5) * (1 if rng.rand() < 0.5 else -1)
                y0 = rng.uniform(20, 40)
                # hosting coord: v-slope only (no u term -> no host jumps)
                xs[0, s] = x0 + sx * v
                # hosted coord: strictly monotone along u, mild v drift
                ys[0, s] = y0 + ry * u + rng.uniform(-0.3, 0.3) * v
            hm = jnp.asarray(smooth_heatmap(rng, B, H, W, J))
            out, ok = sw.slice_warp_sample(
                hm, jnp.asarray(xs), jnp.asarray(ys))
            exact = exact_bilinear(np.asarray(hm), xs, ys)
            okn = np.asarray(ok)[:, :, None]
            dev = np.abs(np.asarray(out) - exact) * okn
            assert dev.max() < 1e-5, (trial, dev.max())
            assert okn.mean() > 0.95, (trial, okn.mean())

            g = rng.rand(B, S, J, X, Y).astype(np.float32)
            ref = scatter_adjoint_ref((B, H, W, J), xs, ys, g, ok)
            got = np.asarray(sw.slice_warp_adjoint(
                (B, H, W, J), jnp.asarray(xs), jnp.asarray(ys),
                jnp.asarray(g), ok,
            ))
            np.testing.assert_allclose(got, ref, atol=2e-5,
                                       err_msg=f"trial {trial}")


class TestAdjointGuards:
    """Round-4 advisor fixes: pair-consistent flip flags under packing, and
    the adjoint's per-column monotonicity guard."""

    def _scatter_ref(self, shape, xs, ys, g_pt_mask):
        """Masked 4-tap bilinear scatter reference (numpy)."""
        B, H, W, J = shape
        _, S, X, Y = xs.shape
        N = S * X * Y
        px, py = xs.reshape(B, N), ys.reshape(B, N)
        g_pt = g_pt_mask.transpose(0, 1, 3, 4, 2).reshape(B, N, J)
        x0, y0 = np.floor(px), np.floor(py)
        ux, vy = px - x0, py - y0
        ref = np.zeros((B, H * W, J), np.float32)
        for dy, dx, w in ((0, 0, (1 - ux) * (1 - vy)), (0, 1, ux * (1 - vy)),
                          (1, 0, (1 - ux) * vy), (1, 1, ux * vy)):
            yi, xi = (y0 + dy).astype(int), (x0 + dx).astype(int)
            valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            rows = np.clip(yi, 0, H - 1) * W + np.clip(xi, 0, W - 1)
            for b in range(B):
                np.add.at(ref[b], rows[b], g_pt[b] * (w[b] * valid[b])[:, None])
        return ref.reshape(B, H, W, J)

    def _column_viol(self, xs, ys, H, W):
        """Independent numpy mirror of the adjoint's per-column hosted-y0
        monotonicity check (flip=0 orientation). Returns viol (W,) bool."""
        X, Y = xs.shape
        host_of = lambda v: np.clip(np.floor(v), 0, W - 2).astype(int)
        enc = np.zeros((X, W), np.float32)
        for r in range(X):
            sgn = 1.0 if xs[r, Y - 1] >= xs[r, 0] else -1.0
            xm = xs[r] * sgn
            for c in range(W):
                cm = c * sgn
                ks = [k for k in range(Y - 1) if xm[k] <= cm]
                seg = max(ks) if ks else 0
                q = seg if host_of(xs[r, seg]) == c else min(seg + 1, Y - 1)
                enc[r, c] = np.clip(np.floor(ys[r, q]), -1, H - 1) + 1
        viol = np.zeros(W, bool)
        for c in range(W):
            s = enc[:, c] if enc[X - 1, c] >= enc[0, c] else enc[::-1, c]
            viol[c] = bool(np.any(np.diff(s) < 0))
        return viol

    def test_nonmonotone_column_drops_not_corrupts(self, rng):
        """An interior non-monotone hosted-y0 column (endpoint direction
        test can't see it) must have its gradient DROPPED, exactly matching
        the scatter reference with those points' cotangents zeroed — never
        misattributed. A monotone slice in the same call stays exact."""
        B, H, W, J = 1, 64, 96, 2
        S, X, Y = 2, 16, 32
        u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
        xs = np.zeros((B, S, X, Y), np.float32)
        ys = np.zeros((B, S, X, Y), np.float32)
        # slice 0: ys rises then falls across rows r -> non-monotone columns
        xs[0, 0] = 5 + 2.4 * v + 0.15 * u
        ys[0, 0] = 20 + 6 * np.sin(0.45 * u) + 0.1 * v
        # slice 1: clean monotone fixture
        xs[0, 1] = 5 + 2.4 * v + 0.3 * u
        ys[0, 1] = 4 + 1.3 * u + 0.2 * v
        hm = jnp.asarray(smooth_heatmap(rng, B, H, W, J)[:, :H, :W])
        out, ok = sw.slice_warp_sample(hm, jnp.asarray(xs), jnp.asarray(ys))
        ok_np = np.asarray(ok)
        assert ok_np[0, 0].mean() > 0.9  # forward is fine on slice 0...
        viol = self._column_viol(xs[0, 0], ys[0, 0], H, W)
        assert viol.any()  # ...but its columns are adjoint-non-monotone

        g = rng.rand(B, S, J, X, Y).astype(np.float32)
        gm = g * ok_np[:, :, None, :, :]
        # zero cotangents of points whose HOST column is violating (slice 0)
        host = np.clip(np.floor(xs[0, 0]), 0, W - 2).astype(int)
        keep = np.where(viol[host], 0.0, 1.0)[None, None, None]  # (1,1,1,X,Y)
        gm_drop = gm.copy()
        gm_drop[:, 0] = gm[:, 0] * keep[0]
        expected = self._scatter_ref((B, H, W, J), xs, ys, gm_drop)
        full = self._scatter_ref((B, H, W, J), xs, ys, gm)
        assert np.abs(full - expected).max() > 1e-3  # the drop is material

        got = np.asarray(sw.slice_warp_adjoint(
            (B, H, W, J), jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(g), ok
        ))
        np.testing.assert_allclose(got, expected, atol=2e-5)

    def test_pair_inconsistent_flips_forced_consistent(self, rng, monkeypatch):
        """With slice-pair packing, pair-inconsistent flip flags must yield
        the same forward AND backward as pair-forced flags (the kernel
        applies the even slice's flag to both; the wrapper now forces the
        adjoint to see the same thing)."""
        monkeypatch.setattr(sw, "_use_pallas_bwd", lambda: True)
        B, H, W, J = 1, 64, 96, 2
        S, X, Y = 8, 32, 32  # square, SB=8 even, 2*Xp<=128 -> packing ON
        assert sw.kernel_packs_pairs((X, Y), S)
        u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
        base_x = 5 + 2.0 * v + 0.2 * u
        base_y = 4 + 1.2 * u + 0.15 * v
        xs = np.stack([base_x + 0.6 * s for s in range(S)])[None]
        ys = np.stack([base_y + 0.4 * s for s in range(S)])[None]
        hm = smooth_heatmap(rng, B, H, W, J)[:, :H, :W]
        g = rng.rand(B, S, J, X, Y).astype(np.float32)

        flip_bad = jnp.asarray(np.array([[0, 1, 2, 3, 0, 1, 2, 3]], np.int32))
        flip_ok = jnp.asarray(np.array([[0, 0, 2, 2, 0, 0, 2, 2]], np.int32))

        def run(flip):
            def loss(h):
                out, ok = sw.slice_warp_sample(
                    h, jnp.asarray(xs), jnp.asarray(ys), flip=flip
                )
                return jnp.sum(out * jnp.asarray(g)), (out, ok)

            (l, (out, ok)), dhm = jax.value_and_grad(loss, has_aux=True)(
                jnp.asarray(hm)
            )
            return np.asarray(out), np.asarray(ok), np.asarray(dhm)

        out_b, ok_b, dhm_b = run(flip_bad)
        out_g, ok_g, dhm_g = run(flip_ok)
        np.testing.assert_array_equal(out_b, out_g)
        np.testing.assert_array_equal(ok_b, ok_g)
        np.testing.assert_allclose(dhm_b, dhm_g, atol=1e-6)
