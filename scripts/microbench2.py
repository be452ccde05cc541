"""Posenet non-sampling breakdown + V2V re-measure with forced outputs."""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

results = {}


def timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# ---- V2V with random input, summed output (no DCE possible)
from selfpose3d_tpu.models.v2v_net import V2VNet

BK, X, J = 40, 64, 15
model = V2VNet(out_ch=J, dtype=jnp.bfloat16)
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (BK, X, X, X, J), jnp.bfloat16)
vs = model.init(key, x, train=False)


@jax.jit
def v2v_sum(vs, x):
    return jnp.sum(model.apply(vs, x, train=False).astype(jnp.float32))


s = v2v_sum(vs, x)
print("v2v checksum:", float(s))
results["v2v_bf16_sum_ms"] = timeit(v2v_sum, vs, x) * 1000


@jax.jit
def v2v_full(vs, x):
    return model.apply(vs, x, train=False)


results["v2v_bf16_full_ms"] = timeit(v2v_full, vs, x) * 1000

# K=4 bucket
x4 = jax.random.uniform(key, (16, X, X, X, J), jnp.bfloat16)
results["v2v_bf16_k4_ms"] = timeit(v2v_full, vs, x4) * 1000

# ---- posenet coord pipeline alone (grids + compute_sample_grid), B=4 K=10
import dataclasses

from __graft_entry__ import _flagship_cfg
from selfpose3d_tpu.data.synthetic import make_synthetic_branch
from selfpose3d_tpu.geometry.grid import compute_grid
from selfpose3d_tpu.ops.unproject import compute_sample_grid

cfg = _flagship_cfg(tiny=False)
B, K, V = 4, 10, 5
branch, _ = make_synthetic_branch(cfg, batch_size=B, num_person=3, with_images=False)
centers = jnp.zeros((B, K, 3))
N = 64 * 64 * 64


@jax.jit
def coords(cam, trans, orig_wh, centers):
    grids = jax.vmap(jax.vmap(
        lambda c: compute_grid((2000.0, 2000.0, 2000.0), c, (64, 64, 64))
    ))(centers)
    flat = grids.reshape(B, 1, K * N, 3)
    sg, bnd = compute_sample_grid(
        flat, cam, trans, (960, 512), (240, 128), hflip=None, orig_wh=orig_wh
    )
    return sg, bnd


results["posenet_coords_ms"] = (
    timeit(coords, branch.cam, branch.trans, branch.orig_wh, centers) * 1000
)

# ---- the zeroing multiply + reshape into cubes (feats -> B*K NDHWC)
feats = jnp.zeros((B, J, K * N), jnp.float32)
valid = jnp.ones((B, K), jnp.float32)


@jax.jit
def to_cubes(feats, valid):
    cubes = (
        feats.reshape(B, J, K, 64, 64, 64)
        .transpose(0, 2, 3, 4, 5, 1)
        .reshape(B * K, 64, 64, 64, J)
    )
    return cubes * valid.reshape(B * K, 1, 1, 1, 1)


results["to_cubes_ms"] = timeit(to_cubes, feats, valid) * 1000

print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=2))
