"""Attribute the PoseNet sampling WRAPPER cost (sampling_only measured
56.8 ms/frame at K=10 vs ~21 ms/frame raw kernel): compute_sample_grid
(projection+distortion), slice reordering + flip-pitch, kernel+scan, and
full wrapper, at bench shapes (B=8, K=10, 64^3, 5 views)."""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_cfg
from selfpose3d_tpu.data.synthetic import make_synthetic_branch
from selfpose3d_tpu.geometry.grid import compute_grid
from selfpose3d_tpu.models import get_model
from selfpose3d_tpu.ops.unproject import (
    compute_sample_grid,
    sample_and_aggregate_slicewarp,
)

B, K = 8, 10


def timeit(fn, *args, iters=8):
    out = fn(*args)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    cfg = _flagship_cfg(tiny=False)
    model = get_model(cfg)
    branch, _ = make_synthetic_branch(cfg, batch_size=B, num_person=3,
                                      with_images=False)
    hm = branch.input_heatmaps.astype(jnp.bfloat16)
    Bv, V, H, W, J = hm.shape
    X, Y, Z = (int(s) for s in cfg.PICT_STRUCT.CUBE_SIZE)
    N = X * Y * Z

    rs = np.random.RandomState(0)
    ss, sc = cfg.MULTI_PERSON.SPACE_SIZE, cfg.MULTI_PERSON.SPACE_CENTER
    lo = np.array([sc[d] - ss[d] / 3 for d in range(3)])
    hi = np.array([sc[d] + ss[d] / 3 for d in range(3)])
    centers = jnp.asarray(rs.uniform(lo, hi, size=(B, K, 3)).astype(np.float32))

    cube = tuple(int(s) for s in cfg.PICT_STRUCT.CUBE_SIZE)

    def grids_of(c):
        g = jax.vmap(jax.vmap(lambda cc: compute_grid(cube, cc, cube)))(c)
        return g.reshape(B, 1, K * N, 3)

    def rec(name, ms):
        print(json.dumps({name: {"ms": round(ms, 1),
                                 "per_frame": round(ms / B, 1)}}), flush=True)

    f_grid = jax.jit(lambda c: jnp.sum(grids_of(c)))
    rec("compute_grid", timeit(f_grid, centers))

    def csg(c):
        fg = grids_of(c)
        sg, bd = compute_sample_grid(
            fg, branch.cam, branch.trans, tuple(cfg.NETWORK.IMAGE_SIZE),
            (W, H), hflip=None, orig_wh=branch.orig_wh,
        )
        return jnp.sum(sg) + jnp.sum(bd)

    rec("grid_plus_projection", timeit(jax.jit(csg), centers))

    def full(c):
        fg = grids_of(c)
        sg, bd = compute_sample_grid(
            fg, branch.cam, branch.trans, tuple(cfg.NETWORK.IMAGE_SIZE),
            (W, H), hflip=None, orig_wh=branch.orig_wh,
        )
        out = sample_and_aggregate_slicewarp(
            hm, sg, bd, cube, num_cubes=K, dtype=jnp.bfloat16,
        )
        return jnp.sum(out.astype(jnp.float32))

    rec("full_sampling", timeit(jax.jit(full), centers))

    def grids_zxy(c):
        g = jax.vmap(jax.vmap(
            lambda cc: compute_grid(cube, cc, cube, order="zxy")
        ))(c)
        return g.reshape(B, 1, K * N, 3)

    def full_presliced(c):
        fg = grids_zxy(c)
        sg, bd = compute_sample_grid(
            fg, branch.cam, branch.trans, tuple(cfg.NETWORK.IMAGE_SIZE),
            (W, H), hflip=None, orig_wh=branch.orig_wh,
        )
        out = sample_and_aggregate_slicewarp(
            hm, sg, bd, cube, num_cubes=K, dtype=jnp.bfloat16,
            pre_sliced=True, out_layout="ndhwc",
        )
        return jnp.sum(out.astype(jnp.float32))

    rec("full_presliced_ndhwc", timeit(jax.jit(full_presliced), centers))

    def full_fused(c):
        fg = grids_zxy(c)
        sg, bd = compute_sample_grid(
            fg, branch.cam, branch.trans, tuple(cfg.NETWORK.IMAGE_SIZE),
            (W, H), hflip=None, orig_wh=branch.orig_wh,
        )
        out = sample_and_aggregate_slicewarp(
            hm, sg, bd, cube, num_cubes=K, dtype=jnp.bfloat16,
            pre_sliced=True, out_layout="ndhwc", fused=True,
        )
        return jnp.sum(out.astype(jnp.float32))

    rec("full_fused_agg", timeit(jax.jit(full_fused), centers))


if __name__ == "__main__":
    main()
