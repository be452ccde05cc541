"""Minimal repro for the CANDIDATE_BUCKETS=(4,5) compiler SIGTERM (r2).

With buckets (4, 5) the PoseNet dispatch becomes a 3-branch lifted
nn.switch ((4, 5, 10) after appending K); the r2 bench subprocess died in
XLA compilation (SIGTERM). This strips the repro to just the PoseNet
subgraph at flagship shapes so the failing scope can be bisected:

  SP3D_BUCKETS="4,5"   bucket list (default the failing one)
  SP3D_SCOPE=posenet|full   compile only PoseNet vs the whole model
  SP3D_REPRO_BATCH     batch size (default 8 = bench)

Prints compile+run wall time, or dies where the compiler dies.
"""

import os
import time


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import dataclasses

    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from selfpose3d_tpu.data.synthetic import make_synthetic_branch
    from selfpose3d_tpu.models import get_model

    buckets = tuple(
        int(b) for b in os.environ.get("SP3D_BUCKETS", "4,5").split(",")
    )
    scope = os.environ.get("SP3D_SCOPE", "posenet")
    batch = int(os.environ.get("SP3D_REPRO_BATCH", "8"))

    cfg = _flagship_cfg(tiny=False)
    cfg = dataclasses.replace(
        cfg, MULTI_PERSON=dataclasses.replace(
            cfg.MULTI_PERSON, CANDIDATE_BUCKETS=list(buckets)
        )
    )
    print(f"buckets={buckets} scope={scope} batch={batch}", flush=True)
    model = get_model(cfg)
    branch, _ = make_synthetic_branch(
        cfg, batch_size=batch, num_person=3, with_images=True
    )
    branch1, _ = make_synthetic_branch(cfg, batch_size=1, num_person=3,
                                       with_images=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
        branch1,
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    if scope == "posenet":
        hm_shape = (batch, branch.cam.batch_shape[1],
                    cfg.NETWORK.HEATMAP_SIZE[1], cfg.NETWORK.HEATMAP_SIZE[0],
                    cfg.NETWORK.NUM_JOINTS)
        hm = jnp.zeros(hm_shape, jnp.float32)
        K = cfg.MULTI_PERSON.MAX_PEOPLE_NUM
        gc = jnp.zeros((batch, K, 5))
        gc = gc.at[:, :3, 3].set(0.0).at[:, 3:, 3].set(-1.0)

        def fn(p, s, hm_, gc_):
            return jnp.sum(model.apply(
                {"params": p, "batch_stats": s},
                hm_, branch.cam, branch.trans, branch.orig_wh, gc_,
                method=lambda mdl, *a: mdl.pose_net(*a),
            )[0])

        jitted = jax.jit(fn)
        t0 = time.perf_counter()
        out = jitted(params, stats, hm, gc)
        out.block_until_ready()
        print(f"posenet compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
    else:
        @jax.jit
        def infer(p, s, br):
            return model.apply(
                {"params": p, "batch_stats": s}, br, method="do_inference"
            )

        t0 = time.perf_counter()
        out = infer(params, stats, branch)
        jax.block_until_ready(out)
        print(f"full model compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
