"""Attribute the adjoint's per-channel cost: run adj at J=15 under
SP3D_ADJ_ABLATE modes ("" full, "nocumsum", "nosegsum"). The deltas
separate prefix-sum arithmetic from boundary epilogue from movement
(gather/transpose) cost. Run each mode as a separate process:

    for m in "" nocumsum nosegsum; do SP3D_ADJ_ABLATE=$m python ...; done
"""
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from selfpose3d_tpu.ops.slicewarp import slice_warp_adjoint

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
    u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
    xs = (10 + 0.3 * v + 0.05 * u)[None, None] + 0.02 * np.arange(S)[None, :, None, None]
    ys = (5 + 0.25 * u + 0.04 * v)[None, None] + 0.01 * np.arange(S)[None, :, None, None]
    xs = jnp.asarray(np.ascontiguousarray(np.broadcast_to(xs, (B, S, X, Y))).astype(np.float32))
    ys = jnp.asarray(np.ascontiguousarray(np.broadcast_to(ys, (B, S, X, Y))).astype(np.float32))
    g = jnp.asarray(rs.rand(B, S, J, X, Y).astype(np.float32))
    ok = jnp.ones((B, S, X, Y), jnp.float32)

    f_adj = jax.jit(lambda a, b, gg, o: jnp.sum(
        slice_warp_adjoint((B, H, W, J), a, b, gg, o)))
    mode = os.environ.get("SP3D_ADJ_ABLATE", "") or "full"
    ms = round(timeit(f_adj, xs, ys, g, ok), 1)
    print(json.dumps({f"adj_J15_{mode}_ms": ms}), flush=True)


if __name__ == "__main__":
    main()
