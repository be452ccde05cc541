"""Probe faster formulations of the k3^3 C=32 conv at 64^3 (skip_res1:
140 ms for the res pair at BK=80 = 16.5 TF/s, the worst block in the K=10
PoseNet V2V). Hypothesis: the native lowering starves the MXU on BOTH the
contraction (K=C=32) and output (N=32) dims.

Variants (all exact, same math):
  v0 native          nn.Conv-style k333 (baseline)
  v1 native_32cube   resolution control at 32^3
  v2 zconcat_k96     z-taps folded into INPUT channels (K=96), conv k331
  v3 zk_xn           z-taps into K (96) AND x-taps into OUTPUT channels
                     (N=96), 1-D conv over Y, shifted-slice sum over x
  v4 zyconcat_k288   z+y taps into K (288), conv k311, X-chunked
  v5 zchunk_native   native conv, Z split in 2 halo chunks
Each prints ms + TF/s incrementally; numerical parity vs v0 is asserted on
a small shape first.
"""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

BK, S, C = 80, 64, 32
DT = jnp.bfloat16
GFLOP = 2 * BK * S**3 * 27 * C * C / 1e9


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1000


def conv_native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=DT,
    )


def zpad_shifts(x):
    """[(x shifted by dz) for dz in (-1, 0, 1)] concat on channels (K=3C)."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    Z = x.shape[3]
    return jnp.concatenate(
        [xp[:, :, :, dz : dz + Z, :] for dz in range(3)], axis=-1
    )


def conv_zconcat(x, w):
    # w (3,3,3,C,C): tap dz rides input-channel block dz
    xz = zpad_shifts(x)  # (B, X, Y, Z, 3C)
    w2 = jnp.transpose(w, (0, 1, 2, 3, 4))  # (dx,dy,dz,ci,co)
    w2 = jnp.concatenate([w[:, :, dz] for dz in range(3)], axis=2)
    # -> (3,3,3C,co); conv over (X, Y) with Z as an untouched W dim:
    # reshape to 2D conv: dims (X, Y) kernel, Z folded into batch? Z must
    # stay a spatial dim with kernel 1: use DHWIO with D=X,H=Y,W=Z, k=(3,3,1)
    w3 = w2[:, :, None]  # (3,3,1,3C,co)
    return jax.lax.conv_general_dilated(
        xz, w3, (1, 1, 1), [(1, 1), (1, 1), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=DT,
    )


def conv_zk_xn(x, w):
    """z-taps -> K (3C), x-taps -> N (3C_out); 1-D conv over Y; exact
    shifted-slice reconstruction over x."""
    B, X, Y, Z, Cc = x.shape
    xz = zpad_shifts(x)  # (B, X, Y, Z, 3C)
    # kernel: (dx,dy,dz,ci,co) -> (dy, (dz ci), (dx co))
    wk = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(3, 3 * Cc, 3 * C)
    # conv over Y only: fold (B, X) and Z into batch/space: NHWC with H=Y
    xf = jnp.transpose(xz, (0, 1, 3, 2, 4)).reshape(B * X * Z, Y, 3 * Cc)
    y = jax.lax.conv_general_dilated(
        xf[:, :, None, :], wk[:, None], (1, 1), [(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=DT,
    )[:, :, 0]  # (B*X*Z, Y, 3C)
    y = y.reshape(B, X, Z, Y, 3, C)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))  # (B, X, Y, Z, dx, C)
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0), (0, 0)))
    # out[x] = sum_dx y[x + dx - 1, dx]
    return sum(yp[:, dx : dx + X, :, :, dx, :] for dx in range(3))


def conv_zyconcat(x, w, xch=16):
    B, X, Y, Z, Cc = x.shape
    wk = jnp.transpose(w, (0, 1, 2, 3, 4))  # (dx,dy,dz,ci,co)
    wk = jnp.stack(
        [jnp.concatenate(
            [jnp.concatenate([w[dx, dy, dz] for dz in range(3)], axis=0)
             for dy in range(3)], axis=0)
         for dx in range(3)], axis=0,
    )  # (3, 9C, co)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    outs = []
    for c0 in range(0, X, xch):
        seg = jax.lax.dynamic_slice_in_dim(xp, c0, xch + 2, axis=1)
        # build (B, xch+2, Y, Z, 9C) patches for dy, dz
        pats = jnp.concatenate(
            [seg[:, :, dy : dy + Y, dz : dz + Z, :]
             for dy in range(3) for dz in range(3)], axis=-1,
        )
        # conv over x within the chunk: kernel (3, 9C, co) as 1-D
        pf = pats.reshape(B, xch + 2, Y * Z, 9 * Cc)
        o = jax.lax.conv_general_dilated(
            pf, wk[:, None], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=DT,
        )
        outs.append(o.reshape(B, xch, Y, Z, C))
    return jnp.concatenate(outs, axis=1)


def conv_zchunk(x, w, nch=2):
    B, X, Y, Z, Cc = x.shape
    zc = Z // nch
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    outs = []
    for i in range(nch):
        seg = xp[:, :, :, i * zc : i * zc + zc + 2, :]
        o = jax.lax.conv_general_dilated(
            seg, w, (1, 1, 1), [(1, 1), (1, 1), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=DT,
        )
        outs.append(o)
    return jnp.concatenate(outs, axis=3)


def main():
    key = jax.random.PRNGKey(0)
    w = (jax.random.normal(key, (3, 3, 3, C, C), jnp.float32) * 0.02).astype(DT)

    # ---- correctness on a small shape (vs native)
    xs = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 8, C), DT)
    ref = np.asarray(conv_native(xs, w), np.float32)
    for name, fn in [("zconcat", conv_zconcat), ("zk_xn", conv_zk_xn),
                     ("zyconcat", lambda a, b: conv_zyconcat(a, b, xch=4)),
                     ("zchunk", conv_zchunk)]:
        got = np.asarray(jax.jit(fn)(xs, w), np.float32)
        err = np.abs(got - ref).max()
        print(json.dumps({f"check_{name}": float(err)}), flush=True)
        assert err < 0.02, (name, err)

    x = jax.random.uniform(jax.random.PRNGKey(2), (BK, S, S, S, C), DT)
    x32 = jax.random.uniform(jax.random.PRNGKey(3), (BK, 32, 32, 32, C), DT)

    def bench(name, fn, xx, gflop):
        f = jax.jit(lambda a, b: jnp.sum(fn(a, b).astype(jnp.float32)))
        ms = timeit(f, xx, w)
        print(json.dumps({name: {"ms": round(ms, 1),
                                 "TFs": round(gflop / ms, 1)}}), flush=True)

    bench("v0_native", conv_native, x, GFLOP)
    bench("v1_native_32cube", conv_native, x32, GFLOP / 8)
    bench("v2_zconcat_k96", conv_zconcat, x, GFLOP)
    bench("v3_zk_xn", conv_zk_xn, x, GFLOP)
    bench("v4_zyconcat_k288", conv_zyconcat, x, GFLOP)
    bench("v5_zchunk_native", conv_zchunk, x, GFLOP)


if __name__ == "__main__":
    main()
