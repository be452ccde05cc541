"""Deconv head: nn.ConvTranspose(4,4,s2) vs subpixel-conv decomposition
at PoseResNet head shapes (backbone runs ~43 TF/s; the dilated-input
transposed conv is the suspected drag)."""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

DT = jnp.bfloat16


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1000


def subpixel_deconv(x, w):
    """Exact nn.ConvTranspose(k=4, s=2, 'SAME') via 4 dense 2x2 convs +
    interleave (validated selections: rows (0,2)/(1,3), unflipped w)."""
    sel = {0: (0, 2), 1: (1, 3)}
    pads = {0: (1, 0), 1: (0, 1)}
    outs = {}
    for r in (0, 1):
        for s in (0, 1):
            K = w[jnp.array(sel[r])][:, jnp.array(sel[s])]
            outs[(r, s)] = jax.lax.conv_general_dilated(
                x, K, (1, 1), (pads[r], pads[s]),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype)
    B, H, W, C = outs[(0, 0)].shape
    yr = jnp.stack(
        [jnp.stack([outs[(r, 0)], outs[(r, 1)]], axis=3) for r in (0, 1)],
        axis=2)
    return yr.reshape(B, 2 * H, 2 * W, C)


def main():
    rs = np.random.RandomState(0)
    results = {}
    for name, (B, H, W, ci, co) in {
        "d1_2048to256_16x30": (8, 16, 30, 2048, 256),
        "d2_256to256_32x60": (8, 32, 60, 256, 256),
        "d3_256to256_64x120": (8, 64, 120, 256, 256),
    }.items():
        x = jnp.asarray(rs.rand(B, H, W, ci).astype(np.float32)).astype(DT)
        w = jnp.asarray(rs.rand(4, 4, ci, co).astype(np.float32) * 0.01).astype(DT)
        mod = nn.ConvTranspose(co, (4, 4), strides=(2, 2), padding="SAME",
                               use_bias=False, dtype=DT)
        vs = {"params": {"kernel": w}}
        f_ref = jax.jit(lambda xx: jnp.sum(mod.apply(vs, xx).astype(jnp.float32)))
        f_sub = jax.jit(lambda xx: jnp.sum(subpixel_deconv(xx, w).astype(jnp.float32)))
        results[name + "_native_ms"] = round(timeit(f_ref, x), 2)
        results[name + "_subpixel_ms"] = round(timeit(f_sub, x), 2)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
