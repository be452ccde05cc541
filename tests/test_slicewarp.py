"""Accuracy tests for the experimental slice-warp Pallas sampler.

Runs in Pallas interpreter mode on CPU (the TPU path is exercised by
bench/TPU runs; see ops/slicewarp.py docstring for measured error and the
performance status).
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


class TestSliceWarp:
    def test_close_to_exact_bilinear(self, rng):
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

        out = np.asarray(
            sw.slice_warp_sample(jnp.asarray(hm), jnp.asarray(xs), jnp.asarray(ys))
        )
        grid = np.stack(
            [xs / (W - 1) * 2 - 1, ys / (H - 1) * 2 - 1], axis=-1
        ).reshape(B, S * X * Y, 2)
        exact = np.asarray(
            jax.vmap(grid_sample_bilinear_cmajor)(jnp.asarray(hm), jnp.asarray(grid))
        ).reshape(B, J, S, X, Y).transpose(0, 2, 1, 3, 4)

        err = np.abs(out - exact)
        assert err.max() < 5e-3, err.max()
        assert err.mean() < 1e-4, err.mean()

    def test_decreasing_curve_direction(self, rng):
        """Rows whose projected x decreases along iy must still sample right."""
        B, H, W, J = 1, 128, 240, 2
        S, X, Y = 1, 16, 64
        hm = smooth_heatmap(rng, B, H, W, J)
        u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
        xs = (200 - 2.5 * v - 0.3 * u)[None, None].astype(np.float32)
        ys = (20 + 1.2 * u + 0.2 * v)[None, None].astype(np.float32)

        out = np.asarray(
            sw.slice_warp_sample(jnp.asarray(hm), jnp.asarray(xs), jnp.asarray(ys))
        )
        grid = np.stack(
            [xs / (W - 1) * 2 - 1, ys / (H - 1) * 2 - 1], axis=-1
        ).reshape(B, S * X * Y, 2)
        exact = np.asarray(
            jax.vmap(grid_sample_bilinear_cmajor)(jnp.asarray(hm), jnp.asarray(grid))
        ).reshape(B, J, S, X, Y).transpose(0, 2, 1, 3, 4)
        assert np.abs(out - exact).max() < 5e-3

    def test_out_of_image_taps_zero(self, rng):
        B, H, W, J = 1, 128, 240, 1
        hm = np.ones((B, H, W, J), np.float32)
        X, Y = 8, 64
        # entire slice far outside the image
        xs = np.full((B, 1, X, Y), 500.0, np.float32)
        # small jitter so curve direction is defined
        xs += np.arange(Y, dtype=np.float32)[None, None, None, :] * 0.01
        ys = np.full((B, 1, X, Y), 300.0, np.float32)
        out = np.asarray(
            sw.slice_warp_sample(jnp.asarray(hm), jnp.asarray(xs), jnp.asarray(ys))
        )
        assert np.abs(out).max() == 0.0
