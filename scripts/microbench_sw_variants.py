"""Kernel-internal attribution: which stage eats the 26us/slice."""
import functools, json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from selfpose3d_tpu.ops.slicewarp import (
    LANE, _gather_lanes, _round_up, _search_steps
)

B, H, W, J = 4, 128, 240, 15
K, X, Y, Z = 10, 64, 64, 64
S = K * Z
SB = 8
Wp, Xp, Yp, Hp = 256, 64, 128, 128

def make_kernel(mode):
    def kern(hm_ref, xs_ref, ys_ref, out_ref):
        def slice_body(si, _):
            xs = xs_ref[0, 0, si]
            ys = ys_ref[0, 0, si]
            dir_pos = xs[:, Y-1:Y] >= xs[:, 0:1]
            sgn = jnp.where(dir_pos, 1.0, -1.0).astype(jnp.float32)
            xs_m = xs * sgn
            cols = jax.lax.broadcasted_iota(jnp.int32, (Xp, Wp), 1).astype(jnp.float32)
            cols_m = cols * sgn
            seg = jnp.zeros((Xp, Wp), jnp.int32)
            if mode != "nosearch":
                for st in _search_steps(Y - 1):
                    cand = seg + st
                    val = _gather_lanes(xs_m, jnp.minimum(cand, Y - 2))
                    seg = jnp.where((cand <= Y - 2) & (val <= cols_m), cand, seg)
            x_k = _gather_lanes(xs_m, seg); x_k1 = _gather_lanes(xs_m, seg + 1)
            y_k = _gather_lanes(ys, seg); y_k1 = _gather_lanes(ys, seg + 1)
            t = (cols_m - x_k) / (x_k1 - x_k + 1e-6)
            y_hat = jnp.clip(y_k + t * (y_k1 - y_k), -4.0, H + 3.0)
            r = jnp.floor(y_hat).astype(jnp.int32)
            rT = jnp.pad(r.astype(jnp.float32).T, ((0, 0), (0, LANE - Xp))).astype(jnp.int32)
            x0 = jnp.floor(xs).astype(jnp.int32)
            y0 = jnp.floor(ys).astype(jnp.int32)
            vy = ys - jnp.floor(ys)
            ux = xs - jnp.floor(xs)
            x0c = jnp.clip(x0, 0, W - 1); x1c = jnp.clip(x0 + 1, 0, W - 1)
            r_f = r.astype(jnp.float32)
            r0 = _gather_lanes(r_f, x0c).astype(jnp.int32)
            r1 = _gather_lanes(r_f, x1c).astype(jnp.int32)
            s0 = jnp.clip(y0 - r0, -1, 1); s1 = jnp.clip(y0 - r1, -1, 1)
            def sel(s, a, b, c):
                return jnp.where(s == -1, a, jnp.where(s == 0, b, c))
            ntap = 2 if mode == "tap2" else 4
            def channel_body(ch, carry):
                hm_c = hm_ref[0, ch]
                T = []
                for j in range(ntap):
                    idx = jnp.clip(rT + (j - 1), 0, H - 1)
                    TjT = _gather_lanes(hm_c, idx)
                    if mode == "notranspose":
                        T.append(TjT[:Xp, :Wp])  # WRONG values, same shapes
                    else:
                        T.append(TjT.T[:Xp])
                if mode == "nopass2":
                    out_ref[0, 0, si, ch] = sum(Tj[:, :Yp] for Tj in T)[:, :Yp]
                    return carry
                G0 = [_gather_lanes(Tj, x0c) for Tj in T]
                G1 = [_gather_lanes(Tj, x1c) for Tj in T]
                if ntap == 2:
                    F0 = G0[0] * (1 - vy) + G0[1] * vy
                    F1 = G1[0] * (1 - vy) + G1[1] * vy
                else:
                    F0 = sel(s0, G0[0], G0[1], G0[2]) * (1 - vy) + sel(s0, G0[1], G0[2], G0[3]) * vy
                    F1 = sel(s1, G1[0], G1[1], G1[2]) * (1 - vy) + sel(s1, G1[1], G1[2], G1[3]) * vy
                out_ref[0, 0, si, ch] = F0 * (1 - ux) + F1 * ux
                return carry
            nch = 1 if mode == "j1" else J
            jax.lax.fori_loop(0, nch, channel_body, 0)
            return 0
        jax.lax.fori_loop(0, SB, slice_body, 0)
    return kern

def run(mode):
    rs = np.random.RandomState(0)
    hm = jnp.asarray(rs.rand(B, J, Wp, Hp).astype(np.float32))
    xs = jnp.asarray(rs.rand(B, S // SB, SB, Xp, Yp).astype(np.float32) * 200)
    xs = jnp.sort(xs, axis=-1)
    ys = jnp.asarray(rs.rand(B, S // SB, SB, Xp, Yp).astype(np.float32) * 100)
    kern = make_kernel(mode)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, S // SB, SB, J, Xp, Yp), jnp.float32),
        grid=(B, S // SB),
        in_specs=[
            pl.BlockSpec((1, J, Wp, Hp), lambda b, s: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SB, Xp, Yp), lambda b, s: (b, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SB, Xp, Yp), lambda b, s: (b, s, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, SB, J, Xp, Yp), lambda b, s: (b, s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=28 * 1024 * 1024),
    )
    g = jax.jit(lambda a, b, c: jnp.sum(f(a, b, c)))
    out = g(hm, xs, ys); _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(10):
        out = g(hm, xs, ys)
    _ = float(np.asarray(out))
    return round((time.perf_counter() - t0) / 10 * 1000, 1)

res = {}
for mode in ("full", "j1", "nosearch", "notranspose", "nopass2", "tap2"):
    res[mode] = run(mode)
    print(mode, res[mode], flush=True)
print(json.dumps(res))
