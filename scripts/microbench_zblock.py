"""z-blocked conv3d: fold z-blocks (with halo) into channels -> one dense
2D conv at full MXU lane occupancy. Exactness + speed check."""
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

def conv3d_zblock(x, w, G):
    """x (B, X, Y, Z, C); w (k, k, k, C, Co); SAME, stride 1. Exact."""
    B, X, Y, Z, C = x.shape
    k = w.shape[0]
    Co = w.shape[-1]
    h = (k - 1) // 2
    nb = Z // G
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (h, h), (0, 0)))
    blocks = jnp.stack(
        [xp[:, :, :, i * G : i * G + G + 2 * h, :] for i in range(nb)], axis=1
    )  # (B, nb, X, Y, G+2h, C)
    blocks = blocks.reshape(B * nb, X, Y, (G + 2 * h) * C)
    w2 = jnp.zeros((k, k, (G + 2 * h) * C, G * Co), w.dtype)
    for zo in range(G):
        for dz in range(k):
            zi = zo + dz
            w2 = w2.at[:, :, zi * C : (zi + 1) * C, zo * Co : (zo + 1) * Co].set(
                w[:, :, dz]
            )
    y = jax.lax.conv_general_dilated(
        blocks, w2, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )  # (B*nb, X, Y, G*Co)
    y = y.reshape(B, nb, X, Y, G, Co).transpose(0, 2, 3, 1, 4, 5)
    return y.reshape(B, X, Y, Z, Co)

def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out))
    return round((time.perf_counter() - t0) / iters * 1000, 2)

rs = np.random.RandomState(0)
res = {}

# exactness on small f32
x = jnp.asarray(rs.rand(2, 8, 8, 8, 5).astype(np.float32))
w = jnp.asarray((rs.rand(3, 3, 3, 5, 7) * 0.1).astype(np.float32))
ref = jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
got = conv3d_zblock(x, w, 4)
res["k3_max_err"] = float(jnp.abs(ref - got).max())
w7 = jnp.asarray((rs.rand(7, 7, 7, 5, 7) * 0.1).astype(np.float32))
ref7 = jax.lax.conv_general_dilated(x, w7, (1, 1, 1), "SAME",
    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
got7 = conv3d_zblock(x, w7, 4)
res["k7_max_err"] = float(jnp.abs(ref7 - got7).max())

# speed at V2V shapes, bf16
DT = jnp.bfloat16
BK, XX, C = 40, 64, 32
xb = jnp.asarray(rs.rand(BK, XX, XX, XX, C).astype(np.float32)).astype(DT)
wb = jnp.asarray((rs.rand(3, 3, 3, C, C) * 0.01).astype(np.float32)).astype(DT)
for G in (4, 8, 16):
    f = jax.jit(lambda a, b, G=G: jnp.sum(conv3d_zblock(a, b, G).astype(jnp.float32)))
    res[f"k3_c32_G{G}_ms"] = timeit(f, xb, wb)
w7b = jnp.asarray((rs.rand(7, 7, 7, 15, 16) * 0.01).astype(np.float32)).astype(DT)
x7 = jnp.asarray(rs.rand(BK, XX, XX, XX, 15).astype(np.float32)).astype(DT)
for G in (8, 16):
    f = jax.jit(lambda a, b, G=G: jnp.sum(conv3d_zblock(a, b, G).astype(jnp.float32)))
    res[f"k7_c15_G{G}_ms"] = timeit(f, x7, w7b)
print(json.dumps(res))
