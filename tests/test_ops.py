"""Golden tests for the kernel layer vs torch reference semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from selfpose3d_tpu.ops import (
    grid_sample_bilinear,
    render_gaussian_heatmaps,
    render_gaussian_cube_3d,
    max_pool_nms_3d,
    nms_topk,
    voxel_index_to_world,
    proposals_soft,
    soft_argmax,
    hungarian,
    masked_assignment_cost,
)


class TestGridSample:
    def test_matches_torch_align_corners(self, rng):
        H, W, C = 16, 24, 3
        img = rng.rand(H, W, C).astype(np.float32)
        grid = (rng.rand(200, 2).astype(np.float32) * 2.4 - 1.2)  # incl. OOB

        got = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid)))

        t_img = torch.from_numpy(img).permute(2, 0, 1)[None]  # (1, C, H, W)
        t_grid = torch.from_numpy(grid)[None, None]  # (1, 1, N, 2)
        exp = F.grid_sample(t_img, t_grid, align_corners=True, padding_mode="zeros")
        exp = exp[0, :, 0, :].permute(1, 0).numpy()  # (N, C)
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)

    def test_exact_corners(self):
        img = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
        grid = jnp.array([[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0]])
        got = np.asarray(grid_sample_bilinear(jnp.asarray(img), grid)).ravel()
        np.testing.assert_allclose(got, [0.0, 11.0, 5.5])


class TestGaussianRender:
    def test_matches_reference_formula(self, rng):
        W, H = 60, 32
        P, J = 4, 5
        kps = rng.rand(P, J, 2).astype(np.float32) * np.array([240, 128], np.float32)

        got = np.asarray(
            render_gaussian_heatmaps(jnp.asarray(kps), (W, H), sigma=3.0, coord_scale=0.25)
        )

        # reference formula (ref: multi_person_posenet_ssv.py:416-420)
        x = torch.from_numpy(kps[..., 0]).reshape(P, J, 1, 1) / 4.0
        y = torch.from_numpy(kps[..., 1]).reshape(P, J, 1, 1) / 4.0
        xx = torch.arange(W, dtype=torch.float32).view(1, 1, 1, W)
        yy = torch.arange(H, dtype=torch.float32).view(1, 1, H, 1)
        hm = torch.exp(-(((xx - x) / 3.0) ** 2) / 2 - (((yy - y) / 3.0) ** 2) / 2)
        exp = torch.clip(hm.sum(0), 0.0, 1.0).numpy()  # (J, H, W)
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)

    def test_mask_zeroes_persons(self, rng):
        kps = (rng.rand(3, 2, 2) * 50).astype(np.float32)
        mask = jnp.array([1.0, 0.0, 0.0])
        got = render_gaussian_heatmaps(jnp.asarray(kps), (64, 32), mask=mask)
        only_first = render_gaussian_heatmaps(jnp.asarray(kps[:1]), (64, 32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(only_first), atol=1e-6)

    def test_cube_3d_matches_reference(self, rng):
        gx = np.linspace(-4000, 4000, 20).astype(np.float32)
        gy = np.linspace(-4500, 3500, 16).astype(np.float32)
        gz = np.linspace(-200, 1800, 8).astype(np.float32)
        roots = np.array([[0.0, -500.0, 800.0], [1500.0, 200.0, 900.0]], np.float32)
        sigma = 200.0

        got = np.asarray(
            render_gaussian_cube_3d(
                jnp.asarray(roots), jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(gz), sigma
            )
        )

        # reference-style loop with searchsorted windows
        # (ref: cuboid_proposal_net_soft.py:168-203)
        target = np.zeros((20, 16, 8), np.float32)
        for mu in roots:
            ix = [np.searchsorted(gx, mu[0] - 3 * sigma), np.searchsorted(gx, mu[0] + 3 * sigma, side="right")]
            iy = [np.searchsorted(gy, mu[1] - 3 * sigma), np.searchsorted(gy, mu[1] + 3 * sigma, side="right")]
            iz = [np.searchsorted(gz, mu[2] - 3 * sigma), np.searchsorted(gz, mu[2] + 3 * sigma, side="right")]
            if ix[0] >= ix[1] or iy[0] >= iy[1] or iz[0] >= iz[1]:
                continue
            gxx, gyy, gzz = np.meshgrid(
                gx[ix[0] : ix[1]], gy[iy[0] : iy[1]], gz[iz[0] : iz[1]], indexing="ij"
            )
            g = np.exp(
                -((gxx - mu[0]) ** 2 + (gyy - mu[1]) ** 2 + (gzz - mu[2]) ** 2)
                / (2 * sigma ** 2)
            )
            target[ix[0] : ix[1], iy[0] : iy[1], iz[0] : iz[1]] = np.maximum(
                target[ix[0] : ix[1], iy[0] : iy[1], iz[0] : iz[1]], g
            )
        target = np.clip(target, 0, 1)
        np.testing.assert_allclose(got, target, rtol=1e-4, atol=1e-5)


class TestProposal:
    def test_nms_matches_torch(self, rng):
        x = rng.rand(2, 10, 12, 6).astype(np.float32)
        got = np.asarray(max_pool_nms_3d(jnp.asarray(x)))
        t = torch.from_numpy(x)
        pooled = F.max_pool3d(t, kernel_size=3, stride=1, padding=1)
        exp = ((t == pooled).float() * t).numpy()
        np.testing.assert_allclose(got, exp, atol=1e-6)

    def test_topk_unravel(self, rng):
        x = np.zeros((1, 8, 8, 4), np.float32)
        x[0, 3, 5, 2] = 1.0
        x[0, 6, 1, 3] = 0.8
        vals, idx = nms_topk(jnp.asarray(x), 3)
        vals, idx = np.asarray(vals), np.asarray(idx)
        assert vals[0, 0] == pytest.approx(1.0)
        assert tuple(idx[0, 0]) == (3, 5, 2)
        assert tuple(idx[0, 1]) == (6, 1, 3)

    def test_real_loc(self):
        idx = jnp.array([[[0, 0, 0], [79, 79, 19]]], dtype=jnp.int32)
        loc = np.asarray(
            voxel_index_to_world(idx, (8000.0, 8000.0, 2000.0), (0.0, -500.0, 800.0), (80, 80, 20))
        )
        np.testing.assert_allclose(loc[0, 0], [-4000.0, -4500.0, -200.0])
        np.testing.assert_allclose(loc[0, 1], [4000.0, 3500.0, 1800.0])

    def test_proposals_soft_threshold(self, rng):
        x = np.zeros((1, 8, 8, 4), np.float32)
        x[0, 4, 4, 2] = 0.9
        x[0, 1, 1, 1] = 0.2
        gc = np.asarray(
            proposals_soft(jnp.asarray(x), 10, 0.3, (8000, 8000, 2000), (0, 0, 800), (8, 8, 4))
        )
        assert gc.shape == (1, 10, 5)
        assert gc[0, 0, 3] == 0.0  # above threshold
        assert gc[0, 1, 3] == -1.0  # below
        assert gc[0, 0, 4] == pytest.approx(0.9)


class TestSoftArgmax:
    def test_peaked_distribution(self, rng):
        N = 64
        grids = jnp.asarray(rng.rand(N, 3).astype(np.float32) * 100)
        x = np.zeros((2, N), np.float32)
        x[0, 17] = 5.0
        x[1, 42] = 5.0
        got = np.asarray(soft_argmax(jnp.asarray(x), grids, beta=100.0))
        np.testing.assert_allclose(got[0], np.asarray(grids)[17], atol=1e-3)
        np.testing.assert_allclose(got[1], np.asarray(grids)[42], atol=1e-3)

    def test_matches_torch_softmax_formula(self, rng):
        x = rng.rand(3, 4, 27).astype(np.float32)
        grids = rng.rand(3, 27, 3).astype(np.float32) * 10
        got = np.asarray(soft_argmax(jnp.asarray(x), jnp.asarray(grids), beta=100.0))
        tx = torch.softmax(100.0 * torch.from_numpy(x), dim=-1)
        exp = torch.einsum("bjn,bnc->bjc", tx, torch.from_numpy(grids)).numpy()
        np.testing.assert_allclose(got, exp, rtol=1e-3, atol=1e-4)

    def test_separable_ndhwc_matches_flat(self, rng):
        """soft_argmax_ndhwc == soft_argmax on the flattened volume with
        the separable grid compute_grid builds (the PoseNet cube)."""
        from selfpose3d_tpu.geometry.grid import compute_grid
        from selfpose3d_tpu.ops.softargmax import soft_argmax_ndhwc

        B, J = 3, 4
        X, Y, Z = 6, 5, 4
        box = (300.0, 250.0, 200.0)
        centers = jnp.asarray(rng.rand(B, 3).astype(np.float32) * 50)
        x = rng.rand(B, X, Y, Z, J).astype(np.float32) * 4
        grids = jax.vmap(
            lambda c: compute_grid(box, c, (X, Y, Z))
        )(centers)  # (B, N, 3) x-major
        flat = jnp.asarray(
            x.reshape(B, X * Y * Z, J).transpose(0, 2, 1)
        )  # (B, J, N)
        exp = np.asarray(soft_argmax(flat, grids, beta=100.0))

        offs = [
            jnp.linspace(-box[d] / 2, box[d] / 2, (X, Y, Z)[d])
            for d in range(3)
        ]
        axes = tuple(centers[:, d : d + 1] + offs[d][None] for d in range(3))
        got = np.asarray(
            soft_argmax_ndhwc(jnp.asarray(x), axes, beta=100.0)
        )
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-3)


class TestHungarian:
    def test_matches_scipy_square(self, rng):
        from scipy.optimize import linear_sum_assignment

        for _ in range(20):
            K = int(rng.randint(2, 11))
            cost = rng.rand(K, K).astype(np.float32)
            r2c = np.asarray(hungarian(jnp.asarray(cost)))
            ours = cost[np.arange(K), r2c].sum()
            ri, ci = linear_sum_assignment(cost)
            theirs = cost[ri, ci].sum()
            assert ours == pytest.approx(theirs, abs=1e-5)

    def test_masked_rectangular(self, rng):
        from scipy.optimize import linear_sum_assignment

        K = 10
        for _ in range(10):
            n_gt = int(rng.randint(1, 8))
            n_pred = int(rng.randint(1, 8))
            cost = rng.rand(K, K).astype(np.float32)
            rv = np.arange(K) < n_gt
            cv = np.arange(K) < n_pred
            got = float(
                masked_assignment_cost(
                    jnp.asarray(cost), jnp.asarray(rv), jnp.asarray(cv)
                )
            )
            sub = cost[:n_gt, :n_pred]
            ri, ci = linear_sum_assignment(sub)
            assert got == pytest.approx(sub[ri, ci].sum(), abs=1e-4)

    def test_vmappable(self, rng):
        costs = rng.rand(4, 6, 6).astype(np.float32)
        out = jax.vmap(hungarian)(jnp.asarray(costs))
        assert out.shape == (4, 6)
