"""k7^3 front-conv folding probe (front_k7: 107.8 ms = 32 TF/s at BK=80,
the 2nd-worst V2V block). Hypothesis: the conv emitter contracts only
ci=15 per MXU pass (~12% K-utilization). Folding z-taps INTO the
contraction dim (K=7*15=105) and x-taps into output channels (N=7*16=112)
should lift MXU utilization ~7x; the cost is a 7x z-concat intermediate,
bounded by X-chunking.

Also probes the k3 variant for the 16->32 front_res conv (K=48, N=96).
"""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

BK = 80
DT = jnp.bfloat16


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


def conv_widened(x, w, x_chunk=16):
    """The current FastConv3D path: x-taps into N, 2D conv over (Y, Z)."""
    k, _, _, ci, co = w.shape
    B, X, Y, Z, _ = x.shape
    half = (k - 1) // 2
    w2 = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(k, k, ci, k * co)
    chunk = min(x_chunk, X)
    while X % chunk:
        chunk -= 1
    xp = jnp.pad(x, ((0, 0), (half, half), (0, 0), (0, 0), (0, 0)))
    rows = chunk + 2 * half
    outs = []
    for c0 in range(0, X, chunk):
        seg = jax.lax.dynamic_slice_in_dim(xp, c0, rows, axis=1)
        y = jax.lax.conv_general_dilated(
            seg.reshape(B * rows, Y, Z, ci), w2,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=DT,
        ).reshape(B, rows, Y, Z, k, co)
        outs.append(sum(y[:, i: i + chunk, :, :, i, :] for i in range(k)))
    return jnp.concatenate(outs, axis=1)


def conv_zk_xn(x, w, x_chunk=8):
    """z-taps -> K (k*ci), x-taps -> N (k*co); conv k(k,1) over (Y, Z)
    carries the y-taps with full-depth contraction. Exact; X-chunked with
    halo so the k-times-wider intermediates stay bounded."""
    k, _, _, ci, co = w.shape
    B, X, Y, Z, _ = x.shape
    half = (k - 1) // 2
    # kernel (dx,dy,dz,ci,co) -> (dy, 1, (dz ci), (dx co))
    wk = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(k, 1, k * ci, k * co)
    chunk = min(x_chunk, X)
    while X % chunk:
        chunk -= 1
    xp = jnp.pad(
        x, ((0, 0), (half, half), (0, 0), (half, half), (0, 0))
    )  # pad x AND z
    rows = chunk + 2 * half
    outs = []
    for c0 in range(0, X, chunk):
        seg = jax.lax.dynamic_slice_in_dim(xp, c0, rows, axis=1)
        # z-shift concat on channels: (B, rows, Y, Z, k*ci)
        zc = jnp.concatenate(
            [seg[:, :, :, dz: dz + Z, :] for dz in range(k)], axis=-1
        )
        y = jax.lax.conv_general_dilated(
            zc.reshape(B * rows, Y, Z, k * ci), wk,
            window_strides=(1, 1), padding=[(half, half), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=DT,
        ).reshape(B, rows, Y, Z, k, co)
        outs.append(sum(y[:, i: i + chunk, :, :, i, :] for i in range(k)))
    return jnp.concatenate(outs, axis=1)


def conv_zk_xn_pad16(x, w, x_chunk=8):
    """r5 variant (a): pad ci 15 -> 16 BEFORE the z-shift concat so every
    slab lands at a 16-lane-multiple offset (the raw 15-channel concat's
    misaligned lane writes were the r4 dead-end hypothesis). K = 7*16 =
    112 with one zero lane per slab (6%% wasted FLOPs)."""
    k, _, _, ci, co = w.shape
    cip = ((ci + 15) // 16) * 16
    x = jnp.pad(x, ((0, 0),) * 4 + ((0, cip - ci),))
    w = jnp.pad(w, ((0, 0),) * 3 + ((0, cip - ci), (0, 0)))
    return conv_zk_xn(x, w, x_chunk)


def conv_zk_xn_stack(x, w, x_chunk=8):
    """r5 variant (b): build the z-window with a STACK on a new axis +
    minor reshape instead of a channel concat — channel order becomes
    (dz major, ci minor) == the same linear order, but XLA sees a stack
    (often a single fused copy) rather than k lane-offset concats. The
    kernel is permuted to match, so the result is exact."""
    k, _, _, ci, co = w.shape
    B, X, Y, Z, _ = x.shape
    half = (k - 1) // 2
    # (dx,dy,dz,ci,co) -> (dy, 1, (dz ci), (dx co)) — same order as zk_xn
    wk = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(k, 1, k * ci, k * co)
    chunk = min(x_chunk, X)
    while X % chunk:
        chunk -= 1
    xp = jnp.pad(x, ((0, 0), (half, half), (0, 0), (half, half), (0, 0)))
    rows = chunk + 2 * half
    outs = []
    for c0 in range(0, X, chunk):
        seg = jax.lax.dynamic_slice_in_dim(xp, c0, rows, axis=1)
        zc = jnp.stack(
            [seg[:, :, :, dz: dz + Z, :] for dz in range(k)], axis=4
        ).reshape(B, rows, Y, Z, k * ci)
        y = jax.lax.conv_general_dilated(
            zc.reshape(B * rows, Y, Z, k * ci), wk,
            window_strides=(1, 1), padding=[(half, half), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=DT,
        ).reshape(B, rows, Y, Z, k, co)
        outs.append(sum(y[:, i: i + chunk, :, :, i, :] for i in range(k)))
    return jnp.concatenate(outs, axis=1)


def main():
    key = jax.random.PRNGKey(0)

    # ---- correctness, small shape
    for k, ci, co in ((7, 15, 16), (3, 16, 32), (3, 32, 32)):
        w = (jax.random.normal(key, (k, k, k, ci, co), jnp.float32) * 0.05).astype(DT)
        xs = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 16, ci), DT)
        ref = np.asarray(jax.jit(conv_native)(xs, w), np.float32)
        for name, fn in (("widened", conv_widened), ("zk_xn", conv_zk_xn),
                         ("zk_xn_pad16", conv_zk_xn_pad16),
                         ("zk_xn_stack", conv_zk_xn_stack)):
            got = np.asarray(jax.jit(lambda a, b: fn(a, b, 4))(xs, w), np.float32)
            err = float(np.abs(got - ref).max())
            print(json.dumps({f"check_{name}_k{k}_{ci}to{co}": err}), flush=True)
            # bf16 accumulation order differs per formulation (verified
            # exact to 5e-6 in f32); 0.08 guards formulation bugs only
            assert err < 0.08, (name, k, err)

    def bench(name, fn, x, w, gflop):
        f = jax.jit(lambda a, b: jnp.sum(fn(a, b).astype(jnp.float32)))
        try:
            ms = timeit(f, x, w)
        except Exception as e:
            print(json.dumps({name: {"error": str(e)[:150]}}), flush=True)
            return
        print(json.dumps({name: {"ms": round(ms, 1),
                                 "TFs": round(gflop / ms, 1)}}), flush=True)

    S = 64
    for k, ci, co, xch in ((7, 15, 16, 8), (3, 16, 32, 16), (3, 32, 32, 16)):
        w = (jax.random.normal(key, (k, k, k, ci, co), jnp.float32) * 0.05).astype(DT)
        x = jax.random.uniform(jax.random.PRNGKey(2), (BK, S, S, S, ci), DT)
        gflop = 2 * BK * S**3 * k**3 * ci * co / 1e9
        tag = f"k{k}_{ci}to{co}"
        bench(f"zk_xn_{tag}", lambda a, b, xc=xch: conv_zk_xn(a, b, xc), x, w, gflop)
        if k == 7:
            bench(f"widened_{tag}", lambda a, b: conv_widened(a, b, 16), x, w, gflop)
            for xc in (4, 8, 16):
                bench(f"zk_xn_pad16_{tag}_xc{xc}",
                      lambda a, b, c=xc: conv_zk_xn_pad16(a, b, c), x, w, gflop)
                bench(f"zk_xn_stack_{tag}_xc{xc}",
                      lambda a, b, c=xc: conv_zk_xn_stack(a, b, c), x, w, gflop)
        if k == 3:
            bench(f"native_{tag}", conv_native, x, w, gflop)


if __name__ == "__main__":
    main()
