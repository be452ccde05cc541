"""Real-TPU microbench of the slice-warp v2 kernel at PoseNet shapes."""
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from selfpose3d_tpu.ops.slicewarp import slice_warp_sample

B, H, W, J = 4, 128, 240, 15
K, X, Y, Z = 10, 64, 64, 64
S = K * Z
rs = np.random.RandomState(0)
hm = jnp.asarray(rs.rand(B, H, W, J).astype(np.float32))
u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
xs = (10 + 0.3*v + 0.05*u)[None, None] + 0.02*np.arange(S)[None, :, None, None]
ys = (5 + 0.25*u + 0.04*v)[None, None] + 0.01*np.arange(S)[None, :, None, None]
xs = jnp.asarray(np.broadcast_to(xs, (B, S, X, Y)).astype(np.float32))
ys = jnp.asarray(np.broadcast_to(ys, (B, S, X, Y)).astype(np.float32))

f = jax.jit(lambda h, a, b: slice_warp_sample(h, a, b)[0])
out = f(hm, xs, ys); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(5):
    out = f(hm, xs, ys)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 5
pts = B * S * X * Y
print(json.dumps({"ms_per_call": round(dt*1000, 2),
                  "gpoints_per_s": round(pts/dt/1e9, 3),
                  "ms_per_view_batch": round(dt*1000, 2)}))

# correctness vs exact gather on the TPU result
from selfpose3d_tpu.ops.sampling import grid_sample_bilinear_cmajor
import numpy as _np
grid = _np.stack([_np.asarray(xs)/(W-1)*2-1, _np.asarray(ys)/(H-1)*2-1], -1).reshape(B, S*X*Y, 2)
exact = _np.asarray(jax.vmap(grid_sample_bilinear_cmajor)(hm, jnp.asarray(grid))).reshape(B, J, S, X, Y).transpose(0, 2, 1, 3, 4)
got = _np.asarray(out)
err = _np.abs(got - exact)
print("nonzero frac:", float((_np.abs(got) > 0).mean()), "max err:", float(err.max()), "mean err:", float(err.mean()))
