"""Bisect the remaining Res3DBlock overhead (block_prod 138 ms vs manual
block_affine 36.9 ms, both FastBatchNorm-era): flax nn.Conv alone, flax
conv+bn+relu, two flax convs, production block with bn replaced by
identity, etc. All at (80, 64^3, 32) bf16."""
import json
import time
from typing import Any

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from selfpose3d_tpu.models.norm import FastBatchNorm
from selfpose3d_tpu.models.v2v_net import BN_MOMENTUM, conv_init

BK, S, C = 80, 64, 32
DT = jnp.bfloat16
GFLOP1 = 2 * BK * S**3 * 27 * C * C / 1e9


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1000


class FlaxConvOnly(nn.Module):
    dtype: Any = DT

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Conv(C, (3, 3, 3), padding=1, kernel_init=conv_init,
                       dtype=self.dtype, name="conv1")(x)


class FlaxConvNoBias(nn.Module):
    dtype: Any = DT

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Conv(C, (3, 3, 3), padding=1, use_bias=False,
                       kernel_init=conv_init, dtype=self.dtype,
                       name="conv1")(x)


class FlaxConvBnRelu(nn.Module):
    dtype: Any = DT

    @nn.compact
    def __call__(self, x, train=False):
        y = nn.Conv(C, (3, 3, 3), padding=1, kernel_init=conv_init,
                    dtype=self.dtype, name="conv1")(x)
        y = FastBatchNorm(use_running_average=not train,
                          momentum=BN_MOMENTUM, dtype=self.dtype,
                          name="bn1")(y)
        return nn.relu(y)


class FlaxConv2Res(nn.Module):
    """Two flax convs + input residual + relu (no BN at all)."""
    dtype: Any = DT

    @nn.compact
    def __call__(self, x, train=False):
        y = nn.Conv(C, (3, 3, 3), padding=1, kernel_init=conv_init,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(C, (3, 3, 3), padding=1, kernel_init=conv_init,
                    dtype=self.dtype, name="conv2")(y)
        return nn.relu(y + x)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(2), (BK, S, S, S, C), DT)

    def bench(name, mod, gflop):
        vs = mod.init(key, x[:2])
        f = jax.jit(lambda v, a: jnp.sum(mod.apply(v, a, False).astype(jnp.float32)))
        ms = timeit(f, vs, x)
        print(json.dumps({name: {"ms": round(ms, 1),
                                 "TFs": round(gflop / ms, 1)}}), flush=True)

    bench("flax_conv_alone", FlaxConvOnly(), GFLOP1)
    bench("flax_conv_nobias", FlaxConvNoBias(), GFLOP1)
    bench("flax_conv_bn_relu", FlaxConvBnRelu(), GFLOP1)
    bench("flax_conv2_res", FlaxConv2Res(), 2 * GFLOP1)


if __name__ == "__main__":
    main()
