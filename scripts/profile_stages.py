"""Stage-by-stage timing of the flagship inference path on the real chip.

Times each pipeline stage as its own jitted program (same shapes as bench.py)
so round-2 perf work attacks the measured order, not guesses:
  backbone (5 views), rootnet (unproject+V2V+NMS),
  posenet sampling (K=10 x 64^3 x 5 views), posenet V2V+soft-argmax.
Env: SAMPLING = gather | slicewarp; BATCH.
"""

import json
import os
import time

SAMPLING = os.environ.get("SAMPLING", "slicewarp")
BATCH = int(os.environ.get("BATCH", "4"))


def timeit(fn, *args, warmup=2, iters=5):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import dataclasses

    from __graft_entry__ import _flagship_cfg
    from selfpose3d_tpu.data.synthetic import make_synthetic_branch
    from selfpose3d_tpu.models import get_model

    cfg = _flagship_cfg(tiny=False)
    cfg = dataclasses.replace(
        cfg, NETWORK=dataclasses.replace(cfg.NETWORK, SAMPLING=SAMPLING)
    )
    model = get_model(cfg)
    branch, _ = make_synthetic_branch(
        cfg, batch_size=BATCH, num_person=3, with_images=True
    )
    branch1, _ = make_synthetic_branch(cfg, batch_size=1, num_person=3, with_images=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)}, branch1
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    results = {}

    def apply(method):
        def fn(p, s, *args):
            return model.apply(
                {"params": p, "batch_stats": s}, *args, method=method
            )

        return jax.jit(fn)

    full = apply("do_inference")
    results["full"] = timeit(full, params, stats, branch)

    backbone = apply(lambda mdl, br: mdl._heatmaps(br, train=False))
    results["backbone"] = timeit(backbone, params, stats, branch)
    heatmaps = backbone(params, stats, branch)

    rootnet = apply(
        lambda mdl, hm, br: mdl.root_net(
            mdl._root_heatmaps(hm), br.cam, br.trans, br.orig_wh,
            hflip=None, train=False,
        )
    )
    results["rootnet"] = timeit(rootnet, params, stats, heatmaps, branch)
    _, centers = rootnet(params, stats, heatmaps, branch)

    posenet = apply(
        lambda mdl, hm, br, gc: mdl.pose_net(
            hm, br.cam, br.trans, br.orig_wh, gc, hflip=None, train=False
        )
    )
    results["posenet"] = timeit(posenet, params, stats, heatmaps, branch, centers)

    # posenet sampling alone (no V2V): replicate PoseNet.__call__ up to cubes
    def sampling_only(mdl, hm, br, gc):
        import jax as _jax
        import jax.numpy as jnp

        from selfpose3d_tpu.geometry.grid import compute_grid
        from selfpose3d_tpu.ops.unproject import (
            compute_sample_grid,
            sample_and_aggregate_cmajor,
            sample_and_aggregate_slicewarp,
            slicewarp_supported,
        )

        pn = mdl.pose_net
        B, V, H, W, J = hm.shape
        K = gc.shape[1]
        X, Y, Z = (int(s) for s in pn.cube_size)
        N = X * Y * Z
        centers3 = gc[..., :3]
        grids = _jax.vmap(_jax.vmap(
            lambda c: compute_grid(pn.grid_size, c, pn.cube_size)
        ))(centers3)
        flat_grids = grids.reshape(B, 1, K * N, 3)
        sample_grid, bounding = compute_sample_grid(
            flat_grids, br.cam, br.trans, pn.image_wh, (W, H),
            hflip=None, orig_wh=br.orig_wh,
        )
        if pn.sampling == "slicewarp" and slicewarp_supported(hm, pn.cube_size):
            return sample_and_aggregate_slicewarp(
                hm, sample_grid, bounding, pn.cube_size, num_cubes=K
            )
        return sample_and_aggregate_cmajor(hm, sample_grid, bounding)

    psamp = apply(sampling_only)
    results["posenet_sampling"] = timeit(psamp, params, stats, heatmaps, branch, centers)

    results["sampling_mode"] = SAMPLING
    results["batch"] = BATCH
    results["per_frame_ms"] = {
        k: round(v / BATCH * 1000, 2)
        for k, v in results.items()
        if isinstance(v, float)
    }
    print(json.dumps(results, indent=2, default=str))


if __name__ == "__main__":
    main()
