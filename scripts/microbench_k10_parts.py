"""Deep attribution for the K=10 path: V2V per-block at BK=80 + sampling
wrapper internals at bench shapes (B=8, 5 views). Scalar-reduce sync.
"""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from selfpose3d_tpu.models.v2v_net import (
    Basic3DBlock,
    EncoderDecoder,
    Res3DBlock,
    Upsample3DBlock,
    V2VNet,
)

BK, X, J = 80, 64, 15
DT = jnp.bfloat16
key = jax.random.PRNGKey(0)


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1000


results = {}


def flops_conv3d(spatial, k, cin, cout):
    return 2 * spatial * (k ** 3) * cin * cout


def bench(name, mod, shape, gflop=None):
    x = jax.random.uniform(key, shape, DT)
    # init on a 2-sample slice: uncompiled init at BK=80 holds every
    # intermediate live and OOMs the chip (params are batch-agnostic)
    x_init = x[:2]
    vs = (
        mod.init(key, x_init, False)
        if not isinstance(mod, V2VNet)
        else mod.init(key, x_init, train=False)
    )
    f = jax.jit(lambda v, a: jnp.sum(mod.apply(v, a, False).astype(jnp.float32)))
    ms = timeit(f, vs, x)
    entry = {"ms": round(ms, 1)}
    if gflop:
        entry["TFs"] = round(gflop / ms, 1)  # GFLOP/ms == TFLOP/s
    results[name] = entry
    print(json.dumps({name: entry}), flush=True)


S64, S32, S16 = 64 ** 3, 32 ** 3, 16 ** 3
bench("front_k7_15to16", Basic3DBlock(16, 7, dtype=DT), (BK, X, X, X, J),
      gflop=BK * flops_conv3d(S64, 7, 15, 16) / 1e9)
bench("front_res_16to32", Res3DBlock(32, dtype=DT), (BK, X, X, X, 16),
      gflop=BK * (flops_conv3d(S64, 3, 16, 32) + flops_conv3d(S64, 3, 32, 32)
                  + 2 * S64 * 16 * 32) / 1e9)
bench("skip_res1_32_at64", Res3DBlock(32, dtype=DT), (BK, X, X, X, 32),
      gflop=BK * 2 * flops_conv3d(S64, 3, 32, 32) / 1e9)
bench("enc_res1_32to64_at32", Res3DBlock(64, dtype=DT), (BK, 32, 32, 32, 32),
      gflop=BK * (flops_conv3d(S32, 3, 32, 64) + flops_conv3d(S32, 3, 64, 64)
                  + 2 * S32 * 32 * 64) / 1e9)
bench("skip_res2_64_at32", Res3DBlock(64, dtype=DT), (BK, 32, 32, 32, 64),
      gflop=BK * 2 * flops_conv3d(S32, 3, 64, 64) / 1e9)
bench("enc_res2_64to128_at16", Res3DBlock(128, dtype=DT), (BK, 16, 16, 16, 64),
      gflop=BK * (flops_conv3d(S16, 3, 64, 128) + flops_conv3d(S16, 3, 128, 128)
                  + 2 * S16 * 64 * 128) / 1e9)
bench("mid_res_128_at16", Res3DBlock(128, dtype=DT), (BK, 16, 16, 16, 128),
      gflop=BK * 2 * flops_conv3d(S16, 3, 128, 128) / 1e9)
bench("up2_128to64_to32", Upsample3DBlock(64, dtype=DT), (BK, 16, 16, 16, 128))
bench("dec_res1_64_at32", Res3DBlock(64, dtype=DT), (BK, 32, 32, 32, 64),
      gflop=BK * 2 * flops_conv3d(S32, 3, 64, 64) / 1e9)
bench("up1_64to32_to64", Upsample3DBlock(32, dtype=DT), (BK, 32, 32, 32, 64))
bench("full_v2v", V2VNet(out_ch=J, dtype=DT), (BK, X, X, X, J))

# ---- sampling wrapper internals at bench shapes ----------------------
from selfpose3d_tpu.ops.slicewarp import slice_warp_sample

B, H, W = 8, 128, 240
K, Y, Z = 10, 64, 64
S = K * Z
rs = np.random.RandomState(0)
hm1 = jnp.asarray(rs.rand(B, H, W, J).astype(np.float32))
u, v = np.mgrid[0:X, 0:Y].astype(np.float32)
xs = (10 + 0.3 * v + 0.05 * u)[None, None] + 0.02 * np.arange(S)[None, :, None, None]
ys = (5 + 0.25 * u + 0.04 * v)[None, None] + 0.01 * np.arange(S)[None, :, None, None]
xs = jnp.asarray(np.ascontiguousarray(np.broadcast_to(xs, (B, S, X, Y))).astype(np.float32))
ys = jnp.asarray(np.ascontiguousarray(np.broadcast_to(ys, (B, S, X, Y))).astype(np.float32))

f_k1 = jax.jit(lambda h, a, b: jnp.sum(
    slice_warp_sample(h, a, b, table_dtype=jnp.bfloat16)[0].astype(jnp.float32)))
results["kernel_1view_B8_bf16_ms"] = {"ms": round(timeit(f_k1, hm1, xs, ys), 1)}
print(json.dumps({"kernel_1view_B8_bf16_ms": results["kernel_1view_B8_bf16_ms"]}), flush=True)

# the 5-view scan accumulate as in sample_and_aggregate_slicewarp
def scan_acc(h, a, b):
    def step(acc, _):
        samp, ok = slice_warp_sample(h, a, b, table_dtype=jnp.bfloat16)
        return acc + samp.astype(jnp.float32), None

    acc0 = jnp.zeros((B, S, J, X, Y), jnp.float32)
    out, _ = jax.lax.scan(step, acc0, jnp.arange(5))
    return jnp.sum(out)

results["kernel_5view_scan_f32acc_ms"] = {
    "ms": round(timeit(jax.jit(scan_acc), hm1, xs, ys), 1)}
print(json.dumps({"kernel_5view_scan_f32acc_ms": results["kernel_5view_scan_f32acc_ms"]}), flush=True)

def scan_acc16(h, a, b):
    def step(acc, _):
        samp, ok = slice_warp_sample(h, a, b, table_dtype=jnp.bfloat16)
        return acc + samp, None

    acc0 = jnp.zeros((B, S, J, X, Y), jnp.bfloat16)
    out, _ = jax.lax.scan(step, acc0, jnp.arange(5))
    return jnp.sum(out.astype(jnp.float32))

results["kernel_5view_scan_bf16acc_ms"] = {
    "ms": round(timeit(jax.jit(scan_acc16), hm1, xs, ys), 1)}
print(json.dumps({"kernel_5view_scan_bf16acc_ms": results["kernel_5view_scan_bf16acc_ms"]}), flush=True)

# flip-pitch metric computation (per view; part of the wrapper)
def pitch(a, b):
    m = [jnp.mean(jnp.abs(jnp.diff(a, axis=-1)), axis=(2, 3)),
         jnp.mean(jnp.abs(jnp.diff(b, axis=-1)), axis=(2, 3)),
         jnp.mean(jnp.abs(jnp.diff(a, axis=-2)), axis=(2, 3)),
         jnp.mean(jnp.abs(jnp.diff(b, axis=-2)), axis=(2, 3))]
    return jnp.sum(jnp.argmax(jnp.stack(m), 0))

results["flip_pitch_1view_ms"] = {"ms": round(timeit(jax.jit(pitch), xs, ys), 1)}

print(json.dumps(results, indent=1))
