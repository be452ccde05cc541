"""TPU timing of the sampling wrapper at PoseNet/RootNet shapes."""
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from selfpose3d_tpu.config import load_config
from selfpose3d_tpu.data.synthetic import make_synthetic_branch
from selfpose3d_tpu.geometry.grid import compute_grid
from selfpose3d_tpu.ops.unproject import (
    compute_sample_grid, sample_and_aggregate_cmajor,
    sample_and_aggregate_slicewarp,
)

def timeit(fn, *args, iters=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000

cfg = load_config(overrides={
    "NETWORK": {"IMAGE_SIZE": [960, 512], "HEATMAP_SIZE": [240, 128],
                "NUM_JOINTS": 15, "SIGMA": 3},
    "DATASET": {"CAMERA_NUM": 5},
})
B, V, K, X = 4, 5, 10, 64
branch, _ = make_synthetic_branch(cfg, batch_size=B, num_person=3, with_images=False)
hm = branch.input_heatmaps
W, H = 240, 128
roots = jnp.asarray(np.random.RandomState(0).randn(B, K, 3).astype(np.float32) * 800 + np.array([0, -500, 900], np.float32))
grids = jax.vmap(jax.vmap(lambda c: compute_grid((2000.,)*3, c, (X,)*3)))(roots)
sg, bnd = compute_sample_grid(grids.reshape(B, 1, K*X*X*X, 3), branch.cam,
                              branch.trans, (960, 512), (W, H), orig_wh=branch.orig_wh)
res = {}
for mode in ("flags", "both", "both_fix"):
    f = jax.jit(lambda h, s, b, m=mode: sample_and_aggregate_slicewarp(h, s, b, (X, X, X), num_cubes=K, mode=m))
    res[f"posenet_{mode}_ms"] = round(timeit(f, hm, sg, bnd), 1)

# rootnet shape
rgrid = compute_grid((8000., 8000., 2000.), jnp.asarray([0., -500., 800.]), (80, 80, 20))
sg2, bnd2 = compute_sample_grid(rgrid[None, None], branch.cam, branch.trans,
                                (960, 512), (W, H), orig_wh=branch.orig_wh)
hm1 = hm[..., 2:3]
for mode in ("both", "both_fix"):
    f = jax.jit(lambda h, s, b, m=mode: sample_and_aggregate_slicewarp(h, s, b, (80, 80, 20), mode=m))
    res[f"rootnet_{mode}_ms"] = round(timeit(f, hm1, sg2, bnd2), 1)

print(json.dumps(res))
