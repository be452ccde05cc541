"""Cross-check the Pallas sampler adjoint against the XLA scatter-add
backward ON REAL TPU HARDWARE (the interpret-mode tests validate the math;
this validates the Mosaic compilation of the actual training path)."""
import json

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

import selfpose3d_tpu.ops.slicewarp as sw


def main():
    rs = np.random.RandomState(0)
    B, H, W, J = 2, 128, 240, 15
    K, X = 2, 64
    S = K * X
    hm = jnp.asarray(rs.rand(B, H, W, J).astype(np.float32))
    u, v = np.mgrid[0:X, 0:X].astype(np.float32)
    xs = (10 + 0.3 * v + 0.05 * u)[None, None] + 0.8 * np.arange(S)[None, :, None, None]
    ys = (5 + 0.25 * u + 0.04 * v)[None, None] + 0.3 * np.arange(S)[None, :, None, None]
    xs = jnp.asarray(np.broadcast_to(xs, (B, S, X, X)).astype(np.float32))
    ys = jnp.asarray(np.broadcast_to(ys, (B, S, X, X)).astype(np.float32))
    g = jnp.asarray(rs.rand(B, S, J, X, X).astype(np.float32))

    def loss(h):
        out, _ = sw.slice_warp_sample(h, xs, ys)
        return jnp.sum(out * g)

    sw._FORCE_XLA_BWD = False
    g_pallas = np.asarray(jax.jit(jax.grad(loss))(hm))
    sw._FORCE_XLA_BWD = True
    g_xla = np.asarray(jax.jit(jax.grad(loss))(hm))
    sw._FORCE_XLA_BWD = False

    err = np.abs(g_pallas - g_xla)
    denom = max(np.abs(g_xla).max(), 1e-9)
    print(json.dumps({
        "max_abs_err": float(err.max()),
        "mean_abs_err": float(err.mean()),
        "ref_scale": float(denom),
        "rel_max": float(err.max() / denom),
    }))
    assert err.max() / denom < 1e-4, "TPU Pallas adjoint != XLA scatter"
    print("TPU ADJOINT OK")


if __name__ == "__main__":
    main()
