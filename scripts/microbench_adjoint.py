"""Attribute the Pallas adjoint's cost at PoseNet shapes (r4 task: backward
4.5x forward -> <=2.5x). Scalar-reduce sync pattern (axon-tunnel safe).

Stages:
  fwd_packed:        channel-pair-packed forward (the production path)
  adj_J15 / adj_J1:  adjoint at 15 vs 1 channels -> separates per-channel
                     pipeline cost from per-slice shared cost (pass-1 +
                     count search)
  vjp_full:          forward + backward through the custom VJP
"""
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from selfpose3d_tpu.ops.slicewarp import slice_warp_adjoint, slice_warp_sample

B, H, W, J = 4, 128, 240, 15
K, X, Y, Z = 10, 64, 64, 64
S = K * Z


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    rs = np.random.RandomState(0)
    hm = jnp.asarray(rs.rand(B, H, W, J).astype(np.float32))
    hm1 = hm[..., :1]
    u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
    xs = (10 + 0.3 * v + 0.05 * u)[None, None] + 0.02 * np.arange(S)[None, :, None, None]
    ys = (5 + 0.25 * u + 0.04 * v)[None, None] + 0.01 * np.arange(S)[None, :, None, None]
    xs = jnp.asarray(np.ascontiguousarray(np.broadcast_to(xs, (B, S, X, Y))).astype(np.float32))
    ys = jnp.asarray(np.ascontiguousarray(np.broadcast_to(ys, (B, S, X, Y))).astype(np.float32))
    g = jnp.asarray(rs.rand(B, S, J, X, Y).astype(np.float32))
    g1 = g[:, :, :1]
    ok = jnp.ones((B, S, X, Y), jnp.float32)

    res = {}

    def rec(name, val):
        res[name] = val
        print(json.dumps({name: val}), flush=True)

    f_fwd = jax.jit(lambda h, a, b: jnp.sum(
        slice_warp_sample(h, a, b, table_dtype=jnp.bfloat16)[0]
        .astype(jnp.float32)))
    rec("fwd_packed_ms", round(timeit(f_fwd, hm, xs, ys), 1))

    f_adj = jax.jit(lambda a, b, gg, o: jnp.sum(
        slice_warp_adjoint((B, H, W, J), a, b, gg, o)))
    rec("adj_J15_ms", round(timeit(f_adj, xs, ys, g, ok), 1))

    f_adj1 = jax.jit(lambda a, b, gg, o: jnp.sum(
        slice_warp_adjoint((B, H, W, 1), a, b, gg, o)))
    rec("adj_J1_ms", round(timeit(f_adj1, xs, ys, g1, ok), 1))

    def vjp_loss(h, a, b):
        out, okk = slice_warp_sample(h, a, b, table_dtype=jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32) * g)

    f_vjp = jax.jit(lambda h, a, b: jnp.sum(
        jax.grad(vjp_loss)(h, a, b)))
    try:
        rec("vjp_full_ms", round(timeit(f_vjp, hm, xs, ys), 1))
    except Exception as e:  # remote-compile size limits etc.
        print(f"vjp_full failed: {e}", flush=True)

    per_ch = (res["adj_J15_ms"] - res["adj_J1_ms"]) / (J - 1)
    res["per_channel_ms"] = round(per_ch, 2)
    res["fixed_per_slice_ms"] = round(res["adj_J1_ms"] - per_ch, 1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
