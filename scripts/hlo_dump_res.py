"""Dump optimized HLO for the slow (weights-as-args) vs fast (const
weights) chained-conv residual to identify the inserted ops."""
import re
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

BK, S, C = 80, 64, 32
DT = jnp.bfloat16


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=DT,
    )


def res2(a, b, c):
    y = jax.nn.relu(conv(a, b))
    return jax.nn.relu(conv(y, c) + a)


def main():
    import numpy as np

    key = jax.random.PRNGKey(0)
    w1 = (jax.random.normal(key, (3, 3, 3, C, C), jnp.float32) * 0.02).astype(DT)
    w2 = (jax.random.normal(jax.random.PRNGKey(9), (3, 3, 3, C, C), jnp.float32) * 0.02).astype(DT)
    xs = jax.ShapeDtypeStruct((BK, S, S, S, C), DT)
    ws = jax.ShapeDtypeStruct((3, 3, 3, C, C), DT)

    for name, fn, args in (
        ("ARGS", lambda a, b, c: jnp.sum(res2(a, b, c).astype(jnp.float32)),
         (xs, ws, ws)),
        ("CONST", lambda a: jnp.sum(res2(a, w1, w2).astype(jnp.float32)),
         (xs,)),
    ):
        txt = jax.jit(fn).lower(*args).compile().as_text()
        print(f"==== {name}: {len(txt)} chars")
        copies = [l.strip()[:160] for l in txt.splitlines()
                  if re.search(r"= \S+ copy\(|transpose\(", l)]
        print(f"copies/transposes: {len(copies)}")
        for l in copies[:12]:
            print("  ", l)
        convs = [l.strip()[:200] for l in txt.splitlines() if "convolution" in l]
        print(f"convolutions: {len(convs)}")
        for l in convs[:6]:
            print("  ", l)


if __name__ == "__main__":
    main()
