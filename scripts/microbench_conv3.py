"""k3 3D-conv implementation variants at the V2V 64^3/32ch shape."""
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

BK, X, C = 40, 64, 32
DT = jnp.bfloat16
rs = np.random.RandomState(0)
x = jnp.asarray(rs.rand(BK, X, X, X, C).astype(np.float32)).astype(DT)
w = jnp.asarray((rs.rand(3, 3, 3, C, C) * 0.01).astype(np.float32)).astype(DT)

def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out))
    return round((time.perf_counter() - t0) / iters * 1000, 2)

res = {}

def native3d(x, w):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=DT)
    return jnp.sum(y.astype(jnp.float32))
res["native3d"] = timeit(jax.jit(native3d), x, w)

def shift2d_yz(x, w):  # fold X into batch, shift along X
    out = None
    for i in range(3):
        dx = i - 1
        if dx < 0:
            sh = jnp.pad(x[:, :dx], ((0,0),(-dx,0),(0,0),(0,0),(0,0)))
        elif dx > 0:
            sh = jnp.pad(x[:, dx:], ((0,0),(0,dx),(0,0),(0,0),(0,0)))
        else:
            sh = x
        sh = sh.reshape(BK*X, X, X, C)
        y = jax.lax.conv_general_dilated(sh, w[i], (1,1), "SAME",
            dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=DT)
        out = y if out is None else out + y
    return jnp.sum(out.astype(jnp.float32))
res["shift2d_fold_x"] = timeit(jax.jit(shift2d_yz), x, w)

def shift2d_xy(x, w):  # 2D over (X, Y), shift along Z (minor-adjacent)
    out = None
    for i in range(3):
        dz = i - 1
        if dz < 0:
            sh = jnp.pad(x[:, :, :, :dz], ((0,0),(0,0),(0,0),(-dz,0),(0,0)))
        elif dz > 0:
            sh = jnp.pad(x[:, :, :, dz:], ((0,0),(0,0),(0,0),(0,dz),(0,0)))
        else:
            sh = x
        sh = jnp.moveaxis(sh, 3, 1).reshape(BK*X, X, X, C)
        y = jax.lax.conv_general_dilated(sh, w[:, :, i], (1,1), "SAME",
            dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=DT)
        out = y if out is None else out + y
    out = jnp.moveaxis(out.reshape(BK, X, X, X, C), 1, 3)
    return jnp.sum(out.astype(jnp.float32))
res["shift2d_fold_z"] = timeit(jax.jit(shift2d_xy), x, w)

def conv2d_zc(x, w):  # one 2D conv over (X, Y); Z*C as channels, banded weights
    xz = x.reshape(BK, X, X, X*C)
    wz = jnp.zeros((3, 3, X*C, X*C), DT)
    for dz in range(3):
        for z in range(X):
            zo = z + dz - 1
            if 0 <= zo < X:
                wz = wz.at[:, :, z*C:(z+1)*C, zo*C:(zo+1)*C].set(w[:, :, dz])
    y = jax.lax.conv_general_dilated(xz, wz, (1,1), "SAME",
        dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=DT)
    return jnp.sum(y.astype(jnp.float32))
# banded-dense: 64x FLOPs — only worth testing if MXU runs near peak
res["conv2d_banded_zc"] = timeit(jax.jit(conv2d_zc), x, w)

print(json.dumps(res))
