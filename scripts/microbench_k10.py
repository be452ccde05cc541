"""Attribute the full-K=10 PoseNet cost on the real chip (r4 task:
9.98 -> >=16 fps on SP3D_BENCH_BUCKETS=10).

All timings use the scalar-reducing-jit + float(np.asarray(...)) pattern —
the only sync that measures truthfully through the axon tunnel
(block_until_ready returns early; large-output np.asarray measures the
network transfer).

Env: BATCH (default 8), K (default 10).
"""
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import dataclasses

import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BATCH", "8"))
K_ENV = int(os.environ.get("K", "10"))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from __graft_entry__ import _flagship_cfg
    from selfpose3d_tpu.data.synthetic import make_synthetic_branch
    from selfpose3d_tpu.models import get_model

    cfg = _flagship_cfg(tiny=False)
    # force the single full-K branch, exactly like SP3D_BENCH_BUCKETS=10
    cfg = dataclasses.replace(cfg, MULTI_PERSON=dataclasses.replace(
        cfg.MULTI_PERSON, CANDIDATE_BUCKETS=[], MAX_PEOPLE_NUM=K_ENV))
    model = get_model(cfg)
    branch, _ = make_synthetic_branch(
        cfg, batch_size=BATCH, num_person=3, with_images=True
    )
    branch1, _ = make_synthetic_branch(
        cfg, batch_size=1, num_person=3, with_images=True
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
        branch1,
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    res = {"batch": BATCH, "K": K_ENV}

    def apply(method):
        def fn(p, s, *args):
            out = model.apply(
                {"params": p, "batch_stats": s}, *args, method=method
            )
            return jax.tree.reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)), out, 0.0
            )

        return jax.jit(fn)

    # heatmaps once (host-side), reused as stage input
    hm_fn = jax.jit(
        lambda p, s, br: model.apply(
            {"params": p, "batch_stats": s}, br,
            method=lambda mdl, b: mdl._heatmaps(b, train=False),
        )
    )
    heatmaps = jax.block_until_ready(hm_fn(params, stats, branch))
    gc_fn = jax.jit(
        lambda p, s, hm, br: model.apply(
            {"params": p, "batch_stats": s}, hm, br,
            method=lambda mdl, h, b: mdl.root_net(
                mdl._root_heatmaps(h), b.cam, b.trans, b.orig_wh,
                hflip=None, train=False,
            )[1],
        )
    )
    centers = jax.block_until_ready(gc_fn(params, stats, heatmaps, branch))

    res["full_do_inference_ms"] = round(
        timeit(apply("do_inference"), params, stats, branch), 1
    )
    res["posenet_full_ms"] = round(
        timeit(
            apply(lambda mdl, hm, br, gc: mdl.pose_net(
                hm, br.cam, br.trans, br.orig_wh, gc, hflip=None, train=False
            )),
            params, stats, heatmaps, branch, centers,
        ),
        1,
    )

    # ---- pieces of PoseNet._run, measured separately, faithful dtypes
    from selfpose3d_tpu.geometry.grid import compute_grid
    from selfpose3d_tpu.ops.softargmax import soft_argmax
    from selfpose3d_tpu.ops.unproject import (
        compute_sample_grid,
        sample_and_aggregate_slicewarp,
    )

    pn_cube = tuple(int(s) for s in cfg.PICT_STRUCT.CUBE_SIZE)
    pn_grid = tuple(float(s) for s in cfg.PICT_STRUCT.GRID_SIZE)
    X, Y, Z = pn_cube
    N = X * Y * Z
    B = BATCH
    K = K_ENV
    image_wh = tuple(cfg.NETWORK.IMAGE_SIZE)
    Hh, Wh = heatmaps.shape[2], heatmaps.shape[3]
    J = heatmaps.shape[4]

    def grids_and_coords(gc, cam, trans, orig_wh):
        grids = jax.vmap(jax.vmap(
            lambda c: compute_grid(pn_grid, c, pn_cube)
        ))(gc[..., :3])
        sg, bnd = compute_sample_grid(
            grids.reshape(B, 1, K * N, 3), cam, trans, image_wh, (Wh, Hh),
            hflip=None, orig_wh=orig_wh,
        )
        return grids, sg, bnd

    f_coords = jax.jit(
        lambda gc, cam, trans, wh: jax.tree.reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)),
            grids_and_coords(gc, cam, trans, wh), 0.0,
        )
    )
    res["coords_ms"] = round(
        timeit(f_coords, centers, branch.cam, branch.trans, branch.orig_wh), 1
    )

    grids, sg, bnd = jax.jit(grids_and_coords)(
        centers, branch.cam, branch.trans, branch.orig_wh
    )
    grids, sg, bnd = jax.block_until_ready((grids, sg, bnd))

    f_samp = jax.jit(lambda hm, sgrid, bound: jnp.sum(
        sample_and_aggregate_slicewarp(
            hm, sgrid, bound, pn_cube, num_cubes=K, mode="flags",
            dtype=jnp.bfloat16,
        ).astype(jnp.float32)
    ))
    res["sampling_bf16_ms"] = round(timeit(f_samp, heatmaps, sg, bnd), 1)

    f_samp32 = jax.jit(lambda hm, sgrid, bound: jnp.sum(
        sample_and_aggregate_slicewarp(
            hm, sgrid, bound, pn_cube, num_cubes=K, mode="flags", dtype=None,
        ).astype(jnp.float32)
    ))
    res["sampling_f32_ms"] = round(timeit(f_samp32, heatmaps, sg, bnd), 1)

    # V2V on the candidate fold
    from selfpose3d_tpu.models.v2v_net import V2VNet

    v2v = V2VNet(out_ch=J, dtype=jnp.bfloat16)
    cubes = jax.random.uniform(
        jax.random.PRNGKey(2), (B * K, X, Y, Z, J), jnp.bfloat16
    )
    v2v_vars = v2v.init(jax.random.PRNGKey(3), cubes[:2], train=False)
    f_v2v = jax.jit(lambda v, c: jnp.sum(
        v2v.apply(v, c, train=False).astype(jnp.float32)))
    res["v2v_fold_ms"] = round(timeit(f_v2v, v2v_vars, cubes), 1)

    # soft-argmax over (B, K, J, N)
    scores = jax.random.normal(
        jax.random.PRNGKey(4), (B, K, N, J), jnp.bfloat16
    )
    f_sa = jax.jit(lambda s, g: jnp.sum(soft_argmax(
        s.reshape(B, K, N, J).transpose(0, 1, 3, 2), g, beta=100.0)))
    res["softargmax_ms"] = round(timeit(f_sa, scores, grids), 1)

    res["per_frame_ms"] = {
        k: round(v / BATCH, 2) for k, v in res.items()
        if k.endswith("_ms") and isinstance(v, float)
    }
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
