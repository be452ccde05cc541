"""Attribute sampling-wrapper cost: kernel passes vs reshapes vs fix."""
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from selfpose3d_tpu.ops.slicewarp import slice_warp_sample

def timeit(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # full host sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # sync
    return (time.perf_counter() - t0) / iters * 1000

B, H, W, J = 4, 128, 240, 15
K, X, Y, Z = 10, 64, 64, 64
S = K * Z
rs = np.random.RandomState(0)
hm = jnp.asarray(rs.rand(B, H, W, J).astype(np.float32))
u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
xs = (10 + 0.3*v + 0.05*u)[None, None] + 0.02*np.arange(S)[None, :, None, None]
ys = (5 + 0.25*u + 0.04*v)[None, None] + 0.01*np.arange(S)[None, :, None, None]
xs = jnp.asarray(np.ascontiguousarray(np.broadcast_to(xs, (B, S, X, Y))).astype(np.float32))
ys = jnp.asarray(np.ascontiguousarray(np.broadcast_to(ys, (B, S, X, Y))).astype(np.float32))

res = {}
f_none = jax.jit(lambda h, a, b: slice_warp_sample(h, a, b)[0])
res["kernel_noflip_ms"] = round(timeit(f_none, hm, xs, ys), 2)
ones = jnp.ones((B, S), jnp.int32)
f_ones = jax.jit(lambda h, a, b: slice_warp_sample(h, a, b, flip=ones)[0])
res["kernel_allflip_ms"] = round(timeit(f_ones, hm, xs, ys), 2)
mixed = jnp.asarray((np.arange(S) % 2)[None].repeat(B, 0).astype(np.int32))
f_mix = jax.jit(lambda h, a, b: slice_warp_sample(h, a, b, flip=mixed)[0])
res["kernel_mixedflip_ms"] = round(timeit(f_mix, hm, xs, ys), 2)

# the big layout transform alone
def to_slices(a):
    return a.reshape(B, 1, K, X, Y, Z).transpose(0, 1, 2, 5, 3, 4).reshape(B, 1, S, X, Y)
flat = jnp.asarray(rs.rand(B, 1, K*X*Y*Z).astype(np.float32))
f_ts = jax.jit(lambda a: to_slices(a))
res["to_slices_ms"] = round(timeit(f_ts, flat), 2)

# output regroup transform alone
cubes = jnp.asarray(rs.rand(B, S, J, X, Y).astype(np.float32))
f_og = jax.jit(lambda c: c.reshape(B, K, Z, J, X, Y).transpose(0, 3, 1, 4, 5, 2).reshape(B, J, K*X*Y*Z))
res["out_regroup_ms"] = round(timeit(f_og, cubes), 2)

print(json.dumps(res))
