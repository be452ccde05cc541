"""Per-block timing of V2VNet at PoseNet shapes (40 cubes of 64^3 x 15ch)."""
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from selfpose3d_tpu.models.v2v_net import (
    Basic3DBlock, Res3DBlock, EncoderDecoder, Upsample3DBlock, V2VNet, _max_pool_3d
)

BK, X, J = 40, 64, 15
DT = jnp.bfloat16
key = jax.random.PRNGKey(0)

def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(np.asarray(out))  # scalar host sync (axon tunnel safe)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1000

results = {}

def bench(name, mod, shape):
    x = jax.random.uniform(key, shape, DT)
    vs = mod.init(key, x, False) if not isinstance(mod, V2VNet) else mod.init(key, x, train=False)
    f = jax.jit(lambda v, a: jnp.sum(mod.apply(v, a, False).astype(jnp.float32)))
    results[name] = round(timeit(f, vs, x), 2)

bench("front_basic_k7_15to16", Basic3DBlock(16, 7, dtype=DT), (BK, X, X, X, J))
bench("front_res_16to32", Res3DBlock(32, dtype=DT), (BK, X, X, X, 16))
bench("skip_res1_32", Res3DBlock(32, dtype=DT), (BK, X, X, X, 32))
bench("enc_res1_32to64_at32", Res3DBlock(64, dtype=DT), (BK, 32, 32, 32, 32))
bench("skip_res2_64_at32", Res3DBlock(64, dtype=DT), (BK, 32, 32, 32, 64))
bench("enc_res2_64to128_at16", Res3DBlock(128, dtype=DT), (BK, 16, 16, 16, 64))
bench("mid_res_128_at16", Res3DBlock(128, dtype=DT), (BK, 16, 16, 16, 128))
bench("dec_res2_128_at16", Res3DBlock(128, dtype=DT), (BK, 16, 16, 16, 128))
bench("up2_128to64_to32", Upsample3DBlock(64, dtype=DT), (BK, 16, 16, 16, 128))
bench("dec_res1_64_at32", Res3DBlock(64, dtype=DT), (BK, 32, 32, 32, 64))
bench("up1_64to32_to64", Upsample3DBlock(32, dtype=DT), (BK, 32, 32, 32, 64))
bench("full_v2v", V2VNet(out_ch=J, dtype=DT), (BK, X, X, X, J))
print(json.dumps(results, indent=1))
