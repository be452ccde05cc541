"""Training-path benchmark: flagship SSV train step on the real chip.

Reports (JSON):
  * sampler_fwd_ms / sampler_bwd_ms — the slice-warp kernel's forward vs
    its VJP (exact 4-tap scatter-add adjoint, ops/slicewarp.py) at PoseNet
    shapes, isolating whether the backward is a wall;
  * train_step_ms / train_steps_per_s — the full jitted SSV train step
    (backbone + rootnet(+synth) + posenet + all six losses, batch
    SP3D_TRAIN_BATCH per step over 3 aug branches x 5 views), matching the
    reference's finetune-stage workload (ref: lib/core/function.py:27-151,
    configs/panoptic_ssl/.../cam5_posenet_finetune.yaml).

Env: SP3D_TRAIN_BATCH (default 1, the reference's per-GPU batch),
SP3D_PROFILE=/path for an xprof trace of the timed steps.
"""

import json
import os
import time

import numpy as np


def timeit_scalar(fn, *args, iters=5):
    out = fn(*args)
    _ = float(np.asarray(out))  # scalar host sync (axon tunnel safe)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    results = {}

    # ---- sampler forward vs VJP at PoseNet shapes (K=5 bucket, 1 view)
    from selfpose3d_tpu.ops.slicewarp import slice_warp_sample

    B, H, W, J = 4, 128, 240, 15
    K, X = 5, 64
    S = K * X
    rs = np.random.RandomState(0)
    hm = jnp.asarray(rs.rand(B, H, W, J).astype(np.float32))
    u, v = np.mgrid[0:X, 0:X].astype(np.float32)
    xs = (10 + 0.3 * v + 0.05 * u)[None, None] + 0.02 * np.arange(S)[None, :, None, None]
    ys = (5 + 0.25 * u + 0.04 * v)[None, None] + 0.01 * np.arange(S)[None, :, None, None]
    xs = jnp.asarray(np.broadcast_to(xs, (B, S, X, X)).astype(np.float32))
    ys = jnp.asarray(np.broadcast_to(ys, (B, S, X, X)).astype(np.float32))

    fwd = jax.jit(lambda h: jnp.sum(slice_warp_sample(h, xs, ys)[0]))
    results["sampler_fwd_ms"] = round(timeit_scalar(fwd, hm), 1)
    bwd = jax.jit(jax.grad(lambda h: jnp.sum(slice_warp_sample(h, xs, ys)[0])))
    bwd_s = jax.jit(lambda h: jnp.sum(bwd(h)))
    results["sampler_fwdbwd_ms"] = round(timeit_scalar(bwd_s, hm), 1)
    results["sampler_bwd_over_fwd"] = round(
        max(0.0, results["sampler_fwdbwd_ms"] / max(results["sampler_fwd_ms"], 1e-9) - 1.0), 2
    )
    print(json.dumps(results), flush=True)  # partial: sampler numbers first

    # ---- full SSV train step at flagship shapes
    import dataclasses

    from __graft_entry__ import _flagship_cfg
    from selfpose3d_tpu.data.synthetic import make_synthetic_branch
    from selfpose3d_tpu.models import get_model
    from selfpose3d_tpu.train.step import make_ssv_train_step
    from selfpose3d_tpu.train.train_state import create_train_state

    batch = int(os.environ.get("SP3D_TRAIN_BATCH", "1"))
    cfg = _flagship_cfg(tiny=False)
    bk = os.environ.get("SP3D_TRAIN_BUCKETS")
    if bk is not None:  # e.g. "" = no switch (single full-K branch)
        import dataclasses as _dc

        buckets = [int(x) for x in bk.split(",") if x]
        cfg = _dc.replace(cfg, MULTI_PERSON=_dc.replace(
            cfg.MULTI_PERSON, CANDIDATE_BUCKETS=buckets))
    model = get_model(cfg)
    mk = lambda rot, seed: make_synthetic_branch(
        cfg, batch_size=batch, num_person=3, with_images=True,
        rot_deg=rot, seed=seed,
    )[0]
    b1, b2, b3 = mk(12.0, 3), mk(-9.0, 3), mk(0.0, 3)
    b1_init, _ = make_synthetic_branch(cfg, batch_size=1, num_person=3,
                                       with_images=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
        b1_init, b1_init, b1_init,
        train_posenet_stage=True, use_l1_stage=bool(cfg.USE_L1), train=True,
        method="ssv_losses",
    )
    state = create_train_state(cfg, variables)
    step_fn = make_ssv_train_step(model, train_posenet_stage=True,
                                  use_l1_stage=bool(cfg.USE_L1))
    rng = jax.random.PRNGKey(7)

    state, metrics = step_fn(state, b1, b2, b3, rng)  # compile
    jax.block_until_ready(metrics["loss"])
    state, metrics = step_fn(state, b1, b2, b3, rng)
    jax.block_until_ready(metrics["loss"])

    import contextlib

    prof_dir = os.environ.get("SP3D_PROFILE", "")
    ctx = jax.profiler.trace(prof_dir) if prof_dir else contextlib.nullcontext()
    iters = 5
    with ctx:
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step_fn(state, b1, b2, b3, rng)
        jax.block_until_ready(metrics["loss"])
        dt = (time.perf_counter() - t0) / iters
    results["train_batch"] = batch
    results["train_step_ms"] = round(dt * 1000, 1)
    results["train_steps_per_s"] = round(1.0 / dt, 3)
    results["train_samples_per_s"] = round(batch / dt, 3)
    print(json.dumps(results), flush=True)

    # ---- optional soak: SP3D_TRAIN_SOAK=N steps with per-term loss logs,
    # asserting bf16 + the Pallas adjoint keep every term finite over real
    # optimization (VERDICT r3 task 1: on-chip stability evidence to pair
    # with the CPU convergence proof)
    soak = int(os.environ.get("SP3D_TRAIN_SOAK", "0"))
    if soak:
        hist = []
        for i in range(soak):
            state, metrics = step_fn(state, b1, b2, b3, rng)
            vals = {k: float(v) for k, v in metrics.items()}
            assert all(np.isfinite(x) for x in vals.values()), (i, vals)
            hist.append(vals)
            if i % 10 == 0 or i == soak - 1:
                print(json.dumps({"soak_step": i, **{
                    k: round(v, 5) for k, v in vals.items()}}), flush=True)
        h = max(1, soak // 5)
        first = {k: float(np.mean([s[k] for s in hist[:h]])) for k in hist[0]}
        last = {k: float(np.mean([s[k] for s in hist[-h:]])) for k in hist[0]}
        print(json.dumps({
            "soak_steps": soak,
            "soak_first_mean": {k: round(v, 5) for k, v in first.items()},
            "soak_last_mean": {k: round(v, 5) for k, v in last.items()},
            "soak_all_finite": True,
        }), flush=True)


if __name__ == "__main__":
    main()
