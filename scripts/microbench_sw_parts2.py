"""Attribute sampling cost with scalar-reducing jits (no host transfer)."""
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from selfpose3d_tpu.ops.slicewarp import slice_warp_sample

def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(np.asarray(out))  # scalar sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out))
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
f1 = jax.jit(lambda h, a, b: jnp.sum(slice_warp_sample(h, a, b)[0]))
res["kernel_1pass_ms"] = round(timeit(f1, hm, xs, ys), 1)
ones = jnp.ones((B, S), jnp.int32)
f2 = jax.jit(lambda h, a, b: jnp.sum(slice_warp_sample(h, a, b)[0])
                          + jnp.sum(slice_warp_sample(h, a, b, flip=ones)[0]))
res["kernel_2pass_ms"] = round(timeit(f2, hm, xs, ys), 1)

bad = jnp.asarray((rs.rand(B, S*X*Y) > 0.999).astype(np.float32))
ftk = jax.jit(lambda x: jnp.sum(jax.lax.top_k(x, 4096)[0]))
res["topk4096_on_2p6M_ms"] = round(timeit(ftk, bad), 1)

cubes = jnp.asarray(rs.rand(B, S, J, X, Y).astype(np.float32))
fog = jax.jit(lambda c: jnp.sum(
    c.reshape(B, K, Z, J, X, Y).transpose(0, 3, 1, 4, 5, 2).reshape(B, J, K*X*Y*Z) * 1.000001))
res["out_regroup_ms"] = round(timeit(fog, cubes), 1)

flat = jnp.asarray(rs.rand(B, 1, K*X*Y*Z).astype(np.float32))
fts = jax.jit(lambda a: jnp.sum(
    a.reshape(B, 1, K, X, Y, Z).transpose(0, 1, 2, 5, 3, 4).reshape(B, 1, S, X, Y) * 1.000001))
res["to_slices_ms"] = round(timeit(fts, flat), 1)

print(json.dumps(res))
