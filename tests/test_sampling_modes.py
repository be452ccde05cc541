"""The slicewarp sampling mode must closely match the exact gather mode on
realistic projected voxel grids (pallas interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import selfpose3d_tpu.ops.slicewarp as sw


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        return orig(*args, **kw)

    monkeypatch.setattr(sw.pl, "pallas_call", patched)


def test_unproject_modes_agree(rng):
    from selfpose3d_tpu.config import load_config
    from selfpose3d_tpu.data.synthetic import make_synthetic_branch
    from selfpose3d_tpu.geometry.grid import compute_grid
    from selfpose3d_tpu.ops.unproject import unproject_heatmaps

    # flagship heatmap height (the kernel requires H=128); small cube
    cfg = load_config(overrides={
        "NETWORK": {"IMAGE_SIZE": [960, 512], "HEATMAP_SIZE": [240, 128],
                    "NUM_JOINTS": 4, "SIGMA": 3},
        "MULTI_PERSON": {"SPACE_SIZE": [8000.0, 8000.0, 2000.0],
                         "SPACE_CENTER": [0.0, -500.0, 800.0],
                         "INITIAL_CUBE_SIZE": [64, 64, 8],
                         "MAX_PEOPLE_NUM": 4},
        "DATASET": {"CAMERA_NUM": 3},
    })
    branch, _ = make_synthetic_branch(cfg, batch_size=1, num_person=2,
                                      with_images=False)
    hm = branch.input_heatmaps[..., :4]  # (1, 3, 128, 240, 4)
    grid = compute_grid(
        cfg.MULTI_PERSON.SPACE_SIZE,
        jnp.asarray(cfg.MULTI_PERSON.SPACE_CENTER),
        cfg.MULTI_PERSON.INITIAL_CUBE_SIZE,
    )[None]

    kw = dict(
        cam=branch.cam, trans=branch.trans, image_wh=(960, 512),
        orig_wh=branch.orig_wh, cube_size=(64, 64, 8),
    )
    exact = np.asarray(unproject_heatmaps(hm, grid, sampling="gather", **kw))
    warp = np.asarray(unproject_heatmaps(hm, grid, sampling="slicewarp", **kw))

    assert exact.shape == warp.shape == (1, 64, 64, 8, 4)
    err = np.abs(exact - warp)
    # the kernel is exact bilinear where its 4-tap band holds; the 'both'
    # orientation mode covers the whole-space grid's wildly varying slopes
    # (incl. rows passing near a camera), so this is a parity bound, not an
    # approximation bound (VERDICT r1 target: < 1e-3 worst-case)
    assert err.max() < 1e-3, err.max()
    assert err.mean() < 1e-6, err.mean()
    # and the cube is not trivially zero
    assert exact.max() > 0.3


def test_posenet_cubes_both_mode(rng):
    """Per-candidate 2m cubes through the dual-orientation path
    must match the exact gather — this is the PoseNet configuration
    (both orientations, no sort-based fallback)."""
    from selfpose3d_tpu.config import load_config
    from selfpose3d_tpu.data.synthetic import make_synthetic_branch
    from selfpose3d_tpu.geometry.grid import compute_grid
    from selfpose3d_tpu.ops.unproject import (
        compute_sample_grid,
        sample_and_aggregate_cmajor,
        sample_and_aggregate_slicewarp,
    )

    cfg = load_config(overrides={
        "NETWORK": {"IMAGE_SIZE": [960, 512], "HEATMAP_SIZE": [240, 128],
                    "NUM_JOINTS": 3, "SIGMA": 3},
        "DATASET": {"CAMERA_NUM": 3},
    })
    branch, gt = make_synthetic_branch(cfg, batch_size=1, num_person=3,
                                       with_images=False)
    hm = branch.input_heatmaps[..., :3]
    B, V, H, W, J = hm.shape
    K, X = 4, 32
    roots = np.asarray(branch.roots_3d)[:, :K]  # (1, K, 3) person-ish centers
    grids = jax.vmap(jax.vmap(
        lambda c: compute_grid((2000.0, 2000.0, 2000.0), c, (X, X, X))
    ))(jnp.asarray(roots))
    flat = grids.reshape(B, 1, K * X * X * X, 3)
    sg, bnd = compute_sample_grid(
        flat, branch.cam, branch.trans, (960, 512), (W, H),
        orig_wh=branch.orig_wh,
    )
    exact = np.asarray(sample_and_aggregate_cmajor(hm, sg, bnd))
    warp = np.asarray(sample_and_aggregate_slicewarp(
        hm, sg, bnd, (X, X, X), num_cubes=K, mode="both"
    ))
    err = np.abs(exact - warp)
    assert err.max() < 1e-3, err.max()


def test_posenet_pre_sliced_ndhwc(rng):
    """The production PoseNet fast path (r4): grid built z-slice-major
    (compute_grid order='zxy') + pre_sliced sampling + direct NDHWC
    output must equal the x-major gather path re-laid-out — same values,
    five fewer full-tensor transposes."""
    from selfpose3d_tpu.config import load_config
    from selfpose3d_tpu.data.synthetic import make_synthetic_branch
    from selfpose3d_tpu.geometry.grid import compute_grid
    from selfpose3d_tpu.ops.unproject import (
        compute_sample_grid,
        sample_and_aggregate_cmajor,
        sample_and_aggregate_slicewarp,
    )

    cfg = load_config(overrides={
        "NETWORK": {"IMAGE_SIZE": [960, 512], "HEATMAP_SIZE": [240, 128],
                    "NUM_JOINTS": 3, "SIGMA": 3},
        "DATASET": {"CAMERA_NUM": 3},
    })
    branch, _ = make_synthetic_branch(cfg, batch_size=1, num_person=3,
                                      with_images=False)
    hm = branch.input_heatmaps[..., :3]
    B, V, H, W, J = hm.shape
    K, X = 4, 32
    N = X * X * X
    roots = jnp.asarray(np.asarray(branch.roots_3d)[:, :K])

    def mk(order):
        g = jax.vmap(jax.vmap(
            lambda c: compute_grid((2000.0, 2000.0, 2000.0), c, (X, X, X),
                                   order=order)
        ))(roots)
        return compute_sample_grid(
            g.reshape(B, 1, K * N, 3), branch.cam, branch.trans,
            (960, 512), (W, H), orig_wh=branch.orig_wh,
        )

    sg_x, bnd_x = mk("xyz")
    exact = np.asarray(sample_and_aggregate_cmajor(hm, sg_x, bnd_x))
    exact_ndhwc = exact.reshape(B, J, K, X, X, X).transpose(0, 2, 3, 4, 5, 1)

    sg_z, bnd_z = mk("zxy")
    warp = np.asarray(sample_and_aggregate_slicewarp(
        hm, sg_z, bnd_z, (X, X, X), num_cubes=K, mode="both",
        pre_sliced=True, out_layout="ndhwc",
    ))
    assert warp.shape == (B, K, X, X, X, J)
    err = np.abs(exact_ndhwc - warp)
    assert err.max() < 1e-3, err.max()
    assert exact_ndhwc.max() > 0.1


def test_fused_view_aggregation_matches_unrolled(rng):
    """The fused multi-view kernel (inference path) == the per-view
    unrolled path through the same wrapper."""
    from selfpose3d_tpu.config import load_config
    from selfpose3d_tpu.data.synthetic import make_synthetic_branch
    from selfpose3d_tpu.geometry.grid import compute_grid
    from selfpose3d_tpu.ops.unproject import (
        compute_sample_grid,
        sample_and_aggregate_slicewarp,
    )

    cfg = load_config(overrides={
        "NETWORK": {"IMAGE_SIZE": [960, 512], "HEATMAP_SIZE": [240, 128],
                    "NUM_JOINTS": 3, "SIGMA": 3},
        "DATASET": {"CAMERA_NUM": 3},
    })
    branch, _ = make_synthetic_branch(cfg, batch_size=1, num_person=3,
                                      with_images=False)
    hm = branch.input_heatmaps[..., :3]
    B, V, H, W, J = hm.shape
    K, X = 2, 16
    N = X * X * X
    roots = jnp.asarray(np.asarray(branch.roots_3d)[:, :K])
    g = jax.vmap(jax.vmap(
        lambda c: compute_grid((2000.0, 2000.0, 2000.0), c, (X, X, X),
                               order="zxy")
    ))(roots)
    sg, bnd = compute_sample_grid(
        g.reshape(B, 1, K * N, 3), branch.cam, branch.trans,
        (960, 512), (W, H), orig_wh=branch.orig_wh,
    )
    kw = dict(cube_size=(X, X, X), num_cubes=K, mode="flags",
              pre_sliced=True, out_layout="ndhwc")
    base, st0 = sample_and_aggregate_slicewarp(
        hm, sg, bnd, return_stats=True, **kw)
    fused, st1 = sample_and_aggregate_slicewarp(
        hm, sg, bnd, return_stats=True, fused=True, **kw)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(base), atol=1e-5)
    assert float(st1["sw_failed_max"]) == float(st0["sw_failed_max"])


def test_whole_space_dual_slicing(rng):
    """The RootNet whole-space path: cameras sit INSIDE the space
    footprint, so horizontal rows pointing at a camera go non-monotone en
    masse; the dual-slicing union + exact-fix residual must still match
    the exact gather (r3 telemetry finding, see ARCHITECTURE.md)."""
    from selfpose3d_tpu.config import load_config
    from selfpose3d_tpu.data.synthetic import make_synthetic_branch
    from selfpose3d_tpu.geometry.grid import compute_grid
    from selfpose3d_tpu.ops.unproject import (
        compute_sample_grid,
        sample_and_aggregate_cmajor,
        sample_whole_space_slicewarp,
    )

    cube = (40, 40, 10)
    cfg = load_config(overrides={
        "NETWORK": {"IMAGE_SIZE": [960, 512], "HEATMAP_SIZE": [240, 128],
                    "NUM_JOINTS": 15, "SIGMA": 3},
        "MULTI_PERSON": {"SPACE_SIZE": [8000.0, 8000.0, 2000.0],
                         "SPACE_CENTER": [0.0, -500.0, 800.0],
                         "INITIAL_CUBE_SIZE": list(cube)},
        "DATASET": {"CAMERA_NUM": 3},
    })
    branch, _ = make_synthetic_branch(cfg, batch_size=1, num_person=2,
                                      with_images=False)
    grid = compute_grid(
        cfg.MULTI_PERSON.SPACE_SIZE,
        jnp.asarray(cfg.MULTI_PERSON.SPACE_CENTER), cube,
    )[None, None]
    sg, bnd = compute_sample_grid(
        grid, branch.cam, branch.trans, (960, 512), (240, 128),
        orig_wh=branch.orig_wh,
    )
    hm = branch.input_heatmaps[..., 2:3]  # root channel
    out, stats = sample_whole_space_slicewarp(
        hm, sg, bnd, cube, return_stats=True
    )
    exact = np.asarray(sample_and_aggregate_cmajor(hm, sg, bnd))
    err = np.abs(np.asarray(out) - exact)
    # residual (both-slicings-failed) must stay inside the exact-fix budget
    assert float(stats["sw_failed_max"]) < 16384
    assert err.max() < 1e-3, err.max()
    assert exact.max() > 0.3  # scene actually lights up
