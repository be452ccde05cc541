"""Flagship inference step through NamedSharding on a 1-device mesh, on the
REAL TPU chip (r4 VERDICT task 6b): proves the Pallas slice-warp kernels and
the candidate-bucket switch execute under the sharded (SPMD) program
structure — the 8-virtual-device dryrun exercises sharding only on CPU,
where slicewarp falls back to the XLA gather path.

Asserts finite outputs and agreement with the unsharded jit of the same
function on the same inputs.
"""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as g
from selfpose3d_tpu.parallel.mesh import make_mesh, batch_sharding, replicated


def main():
    fn, (params, stats, branch) = g.entry()
    mesh = make_mesh(1)
    bs, rep = batch_sharding(mesh), replicated(mesh)

    params_s = jax.tree.map(lambda x: jax.device_put(x, rep), params)
    stats_s = jax.tree.map(lambda x: jax.device_put(x, rep), stats)
    branch_s = jax.tree.map(
        lambda x: jax.device_put(
            jnp.asarray(x), bs if getattr(x, "ndim", 0) else rep
        ),
        branch,
    )

    f_sharded = jax.jit(fn, out_shardings=None)
    t0 = time.perf_counter()
    with mesh:
        out_s = f_sharded(params_s, stats_s, branch_s)
        out_s = jax.tree.map(lambda x: np.asarray(x), out_s)
    t_sharded = time.perf_counter() - t0

    leaves_s = jax.tree.leaves(out_s)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves_s), (
        "non-finite outputs under the sharded program"
    )

    # unsharded reference on the same chip (bench-path program)
    out_u = jax.jit(fn)(params, stats, branch)
    out_u = jax.tree.map(lambda x: np.asarray(x), out_u)
    for a, b in zip(jax.tree.leaves(out_s), jax.tree.leaves(out_u)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2, atol=2e-2,  # bf16 program, different partitioner passes
        )
    print(json.dumps({
        "sharded_1dev_mesh": "ok",
        "first_call_s": round(t_sharded, 1),
        "n_out_leaves": len(leaves_s),
    }))


if __name__ == "__main__":
    main()
