"""Microbenchmarks for round-2 kernel design decisions (run on the v5e).

Measures, on real posenet shapes (B=4, K=10, 64^3 cubes, J=15):
  A. V2VNet bf16 forward on the folded candidate batch
  B. the channel-major -> NDHWC feats transpose
  C. soft-argmax
  D. Mosaic primitive rates inside a Pallas kernel: lane dynamic_gather,
     (256,128) f32 transpose — the slicewarp-v2 cost model inputs.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


results = {}

# ---------------------------------------------------------------- A: V2V
from selfpose3d_tpu.models.v2v_net import V2VNet

BK, X, J = 40, 64, 15
model = V2VNet(out_ch=J, dtype=jnp.bfloat16)
x = jnp.zeros((BK, X, X, X, J), jnp.bfloat16)
vs = model.init(jax.random.PRNGKey(0), x, train=False)


@jax.jit
def v2v(vs, x):
    return model.apply(vs, x, train=False)


results["v2v_bf16_40x64c15_ms"] = timeit(v2v, vs, x) * 1000

x32 = jnp.zeros((BK, X, X, X, J), jnp.float32)
model32 = V2VNet(out_ch=J, dtype=jnp.float32)
vs32 = model32.init(jax.random.PRNGKey(0), x32, train=False)


@jax.jit
def v2v32(vs, x):
    return model32.apply(vs, x, train=False)


results["v2v_f32_40x64c15_ms"] = timeit(v2v32, vs32, x32) * 1000

# ------------------------------------------------------------ B: transpose
B, K = 4, 10
N = X * X * X
feats = jnp.zeros((B, J, K * N), jnp.float32)


@jax.jit
def to_ndhwc(f):
    return (
        f.reshape(B, J, K, X, X, X).transpose(0, 2, 3, 4, 5, 1).reshape(B * K, X, X, X, J)
    )


results["feats_transpose_ms"] = timeit(to_ndhwc, feats) * 1000

# ------------------------------------------------------------ C: softargmax
scores = jnp.zeros((B, K, J, N), jnp.float32)
grids = jnp.zeros((B, K, N, 3), jnp.float32)
from selfpose3d_tpu.ops.softargmax import soft_argmax


@jax.jit
def sam(s, g):
    return soft_argmax(s, g, beta=100.0)


results["softargmax_ms"] = timeit(sam, scores, grids) * 1000

# ------------------------------------------------- D: Mosaic primitive rates
LANE = 128
REPS = 200


def bench_kernel(body, shapes, name, reps=REPS):
    """Run `body(refs..., i)` reps times inside one pallas program."""

    def kernel(*refs):
        def loop(i, c):
            body(refs, i)
            return c

        jax.lax.fori_loop(0, reps, loop, 0)

    args = [jnp.ones(s, jnp.float32) for s in shapes[:-1]]
    out_shape = jax.ShapeDtypeStruct(shapes[-1], jnp.float32)
    f = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
    )
    jf = jax.jit(f)
    t = timeit(jf, *args, warmup=2, iters=10)
    results[name + "_us_per_op"] = t / reps * 1e6


# D1: dynamic_gather on (256, 128): idx (256,128) into tbl (256,128) lanes
def g_body(refs, i):
    tbl, out = refs
    idx = jnp.clip(tbl[:].astype(jnp.int32) + i, 0, LANE - 1)
    out[:] = jnp.take_along_axis(tbl[:], idx, axis=1, mode="promise_in_bounds")


bench_kernel(g_body, [(256, LANE), (256, LANE)], "gather_256x128")


# D2: f32 transpose (256,128)->(128,256)
def t_body(refs, i):
    a, out = refs
    out[:] = a[:].T + i.astype(jnp.float32)


bench_kernel(t_body, [(256, LANE), (LANE, 256)], "transpose_256x128")


# D3: compare+add over (64, 256) (segment-search inner op)
def c_body(refs, i):
    a, out = refs
    out[:] = out[:] + (a[:] <= i.astype(jnp.float32)).astype(jnp.float32)


bench_kernel(c_body, [(64, 256), (64, 256)], "cmp_add_64x256")


# D4: int transpose (64,256)->(256,64)... use f32 carrier
def t2_body(refs, i):
    a, out = refs
    out[:, :64] = a[:].T + i.astype(jnp.float32)


bench_kernel(t2_body, [(64, 256), (256, LANE)], "transpose_64x256")

print(json.dumps({k: round(v, 4) for k, v in results.items()}, indent=2))
