"""Isolate why two chained flax convs + residual run at 17 TF/s while the
same math with closure-constant weights runs at 64 TF/s. Discriminators:
  rawargs_chain2res   raw lax convs, weights as JIT ARGUMENTS
  rawconst_chain2res  raw lax convs, weights as closure constants
  rawargs_chain2      weights as args, no residual/relu
  flax_chain2norelu   flax convs chained, no relu/residual
  flax_const_res      flax module, params CLOSED OVER (constants)
All (80, 64^3, 32) bf16.
"""
import json
import time
from typing import Any

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from selfpose3d_tpu.models.v2v_net import conv_init

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


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=DT,
    )


class FlaxConv2Res(nn.Module):
    dtype: Any = DT

    @nn.compact
    def __call__(self, x, train=False):
        y = nn.Conv(C, (3, 3, 3), padding=1, kernel_init=conv_init,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(C, (3, 3, 3), padding=1, kernel_init=conv_init,
                    dtype=self.dtype, name="conv2")(y)
        return nn.relu(y + x)


class FlaxChain2(nn.Module):
    dtype: Any = DT

    @nn.compact
    def __call__(self, x, train=False):
        y = nn.Conv(C, (3, 3, 3), padding=1, kernel_init=conv_init,
                    dtype=self.dtype, name="conv1")(x)
        return nn.Conv(C, (3, 3, 3), padding=1, kernel_init=conv_init,
                       dtype=self.dtype, name="conv2")(y)


def main():
    key = jax.random.PRNGKey(0)
    w1 = (jax.random.normal(key, (3, 3, 3, C, C), jnp.float32) * 0.02).astype(DT)
    w2 = (jax.random.normal(jax.random.PRNGKey(9), (3, 3, 3, C, C), jnp.float32) * 0.02).astype(DT)
    x = jax.random.uniform(jax.random.PRNGKey(2), (BK, S, S, S, C), DT)

    def rec(name, ms, flops=2 * GFLOP1):
        print(json.dumps({name: {"ms": round(ms, 1),
                                 "TFs": round(flops / ms, 1)}}), flush=True)

    def res2(a, b, c):
        y = jax.nn.relu(conv(a, b))
        return jax.nn.relu(conv(y, c) + a)

    f = jax.jit(lambda a, b, c: jnp.sum(res2(a, b, c).astype(jnp.float32)))
    rec("rawargs_chain2res", timeit(f, x, w1, w2))

    f = jax.jit(lambda a: jnp.sum(res2(a, w1, w2).astype(jnp.float32)))
    rec("rawconst_chain2res", timeit(f, x))

    f = jax.jit(lambda a, b, c: jnp.sum(conv(conv(a, b), c).astype(jnp.float32)))
    rec("rawargs_chain2", timeit(f, x, w1, w2))

    mod = FlaxChain2()
    vs = mod.init(key, x[:2])
    f = jax.jit(lambda v, a: jnp.sum(mod.apply(v, a, False).astype(jnp.float32)))
    rec("flax_chain2norelu", timeit(f, vs, x))

    mod = FlaxConv2Res()
    vs = mod.init(key, x[:2])
    f = jax.jit(lambda a: jnp.sum(mod.apply(vs, a, False).astype(jnp.float32)))
    rec("flax_const_res", timeit(f, x))


if __name__ == "__main__":
    main()
