"""Anatomy of the 64^3 Res3DBlock cost (skip_res1: 140 ms at BK=80 while
its two k3 convs measure 17.8 ms each in isolation -> ~105 ms overhead).

Each variant is the SAME math at (80, 64, 64, 64, 32) bf16; differences
isolate where the overhead lives:
  conv_alone      one native k333 conv
  conv_chain2     conv(conv(x)) — two convs, no elementwise between
  ew_bw           relu(x + y) — elementwise bandwidth floor for this shape
  block_affine    conv-BN(affine)-relu-conv-BN + input add + relu, BN as
                  explicit per-channel scale/shift (eval semantics)
  block_folded    BN scale folded INTO conv weights (bias-only epilogue)
  block_prod      the production Res3DBlock (flax, eval)
"""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from selfpose3d_tpu.models.v2v_net import Res3DBlock

BK, S, C = 80, 64, 32
DT = jnp.bfloat16
GFLOP1 = 2 * BK * S**3 * 27 * C * C / 1e9  # one k333 conv


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


def main():
    key = jax.random.PRNGKey(0)
    w1 = (jax.random.normal(key, (3, 3, 3, C, C), jnp.float32) * 0.02).astype(DT)
    w2 = (jax.random.normal(jax.random.PRNGKey(9), (3, 3, 3, C, C), jnp.float32) * 0.02).astype(DT)
    s1 = jnp.linspace(0.9, 1.1, C).astype(DT)
    b1 = jnp.linspace(-0.1, 0.1, C).astype(DT)
    s2, b2 = s1[::-1], b1[::-1]
    x = jax.random.uniform(jax.random.PRNGKey(2), (BK, S, S, S, C), DT)
    y = jax.random.uniform(jax.random.PRNGKey(3), (BK, S, S, S, C), DT)

    def bench(name, fn, args, gflop=None):
        f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        try:
            ms = timeit(f, *args)
        except Exception as e:
            print(json.dumps({name: {"error": str(e)[:200]}}), flush=True)
            return
        ent = {"ms": round(ms, 1)}
        if gflop:
            ent["TFs"] = round(gflop / ms, 1)
        print(json.dumps({name: ent}), flush=True)

    bench("conv_alone", lambda a: conv(a, w1), (x,), GFLOP1)
    bench("conv_chain2", lambda a: conv(conv(a, w1), w2), (x,), 2 * GFLOP1)
    bench("ew_bw", lambda a, b: jax.nn.relu(a + b), (x, y))

    def block_affine(a):
        r = conv(a, w1) * s1 + b1
        r = jax.nn.relu(r)
        r = conv(r, w2) * s2 + b2
        return jax.nn.relu(r + a)

    bench("block_affine", block_affine, (x,), 2 * GFLOP1)

    wf1 = w1 * s1  # scale folds into output channels
    wf2 = w2 * s2

    def block_folded(a):
        r = jax.nn.relu(conv(a, wf1) + b1)
        return jax.nn.relu(conv(r, wf2) + b2 + a)

    bench("block_folded", block_folded, (x,), 2 * GFLOP1)

    mod = Res3DBlock(C, dtype=DT)
    vs = mod.init(key, x[:2], train=False)
    bench(
        "block_prod",
        lambda v, a: mod.apply(v, a, False),
        (vs, x),
        2 * GFLOP1,
    )


if __name__ == "__main__":
    main()
