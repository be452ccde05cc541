"""Experimental Pallas im2col k3^3 conv vs XLA native at V2V 64^3 shapes.

XLA's native 3D conv runs ~18-24 TF/s at <=32-channel 64^3 blocks (the
matmul N dim underfills the MXU, ARCHITECTURE.md). This kernel builds
(Y*Z, 9C) patch matrices per x-plane in VMEM (lane-concat of 9 shifted
copies) and feeds the MXU one (4096, 9C) @ (9C, co) matmul per x-offset
tap — K = 9C fills the contraction dim; ceiling is set by N = co alone.
Input is pre-chunked into overlapping x-windows outside the kernel.
"""
import functools
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

XCH = 8  # output x-planes per program
PCI = int(os.environ.get("SP3D_PCONV_PCI", "12"))  # taps padded to this count
F32_STAGE = os.environ.get("SP3D_PCONV_F32", "0") == "1"


def _kernel(xw_ref, w_ref, out_ref, *, Y, Z, CI, CO):
    """xw_ref: (1, 1, XCH+2, Y, Z, CI) halo window;
    w_ref: (3, 3, 3*CI, CO) = (dx, dz, (dy, ci), co);
    out_ref: (1, 1, XCH, Y, Z, CO).

    The dy taps lane-concat into the matmul K dim (their Z-row shifts are
    sublane-aligned, which Mosaic's concat accepts); the dz taps become
    OUTPUT-side row shifts of the per-dz matmul results (z-shifted input
    pieces carry sublane-offset layouts that Mosaic's lane concat
    rejects)."""
    f32 = jnp.float32
    N = Y * Z
    zi = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) % Z
    z_lo = (zi > 0).astype(f32)      # out row valid when adding C[z-1]
    z_hi = (zi < Z - 1).astype(f32)  # out row valid when adding C[z+1]

    def dy_patch(plane):
        """(N, CI) -> (N, 3*CI): dy in {-1, 0, 1} (Z-row shifts)."""
        cols = []
        for dy in (-1, 0, 1):
            if dy < 0:
                cols.append(jnp.pad(plane, ((Z, 0), (0, 0)))[:N])
            elif dy > 0:
                cols.append(jnp.pad(plane, ((0, Z), (0, 0)))[Z:])
            else:
                cols.append(plane)
        return jnp.concatenate(cols, axis=1)

    for j in range(XCH):
        accs = [jnp.zeros((N, CO), f32) for _ in range(3)]
        for dx in range(3):
            P = dy_patch(xw_ref[0, 0, j + dx].reshape(N, CI))
            for dz in range(3):
                accs[dz] = accs[dz] + jnp.dot(
                    P, w_ref[dx, dz], preferred_element_type=f32
                )
        # out[z] = C_0[z-(-1)]... : contribution with input z+dz lives at
        # output row z, i.e. shift C_dz by -(dz-1) rows with z-edge masks
        out = accs[1]
        out = out + jnp.pad(accs[0], ((1, 0), (0, 0)))[:N] * z_lo
        out = out + jnp.pad(accs[2], ((0, 1), (0, 0)))[1:] * z_hi
        out_ref[0, 0, j] = out.astype(out_ref.dtype).reshape(Y, Z, CO)


def pallas_conv3(x, w):
    """x: (B, X, Y, Z, CI) bf16; w: (3, 3, 3, CI, CO) -> SAME conv."""
    B, X, Y, Z, CI = x.shape
    CO = w.shape[-1]
    nch = X // XCH
    # overlapping halo windows (materialized once per conv)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    wins = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xp, c * XCH, XCH + 2, axis=1)
         for c in range(nch)], axis=1,
    )  # (B, nch, XCH+2, Y, Z, CI)
    # (dx, dy, dz, ci, co) -> (dx, dz, (dy, ci), co)
    wm = jnp.transpose(w, (0, 2, 1, 3, 4)).reshape(3, 3, 3 * CI, CO)

    kernel = functools.partial(_kernel, Y=Y, Z=Z, CI=CI, CO=CO)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, nch, XCH, Y, Z, CO), x.dtype),
        grid=(B, nch),
        in_specs=[
            pl.BlockSpec((1, 1, XCH + 2, Y, Z, CI),
                         lambda b, c: (b, c, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 3 * CI, CO), lambda b, c: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, XCH, Y, Z, CO),
                               lambda b, c: (b, c, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(wins, wm)
    return out.reshape(B, X, Y, Z, CO)


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
    results = {}
    for name, (BK, CI, CO) in {
        "front_res_c1_16to32": (40, 16, 32),
        "skip_res1_32to32": (40, 32, 32),
    }.items():
        X = 64
        x = jnp.asarray(rs.rand(BK, X, X, X, CI).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray((rs.rand(3, 3, 3, CI, CO) * 0.01).astype(np.float32)).astype(jnp.bfloat16)

        f_pal = jax.jit(lambda a: jnp.sum(pallas_conv3(a, w).astype(jnp.float32)))
        f_nat = jax.jit(lambda a: jnp.sum(jax.lax.conv_general_dilated(
            a.reshape(BK, X, X * X, CI) if False else a,
            w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.bfloat16,
        ).astype(jnp.float32)))
        # correctness spot-check on a small slice
        small = x[:1, :16]
        got = np.asarray(pallas_conv3(small, w), np.float32)
        ref = np.asarray(jax.lax.conv_general_dilated(
            small, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32), np.float32)
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
        results[name + "_relerr"] = round(float(err), 6)
        results[name + "_pallas_ms"] = round(timeit(f_pal, x), 2)
        results[name + "_native_ms"] = round(timeit(f_nat, x), 2)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
