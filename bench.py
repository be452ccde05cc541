"""Benchmark: 5-view Panoptic inference frames/sec/chip (BASELINE.json metric).

Runs the flagship SSV model (ResNet-50 backbone, 960x512 inputs, 80x80x20
root grid, 10x 64^3 pose cubes) end-to-end — backbone -> RootNet -> proposals
-> PoseNet -> soft-argmax — as one jitted program on the available chip, and
reports frames (5-view frame sets) per second per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md). The denominator is derived in BASELINE_DERIVATION.md from a
measured CPU run of the composed torch reference pipeline, FLOP scaling to
flagship shapes, and a launch-bound CPU->A100 factor: ~8 frame-sets/s
(uncertainty ~+-2x). The north-star target is 2x that per chip.
"""

import json
import time

A100_EST_FPS = 8.0  # torch reference on one A100 — see BASELINE_DERIVATION.md
BATCH = int(__import__("os").environ.get("SP3D_BENCH_BATCH", "8"))
# scene people count: PoseNet cost scales with it through candidate
# bucketing, exactly like the reference's per-valid-candidate loop — run
# SP3D_BENCH_PERSONS=6 for the >=6-person datapoint
PERSONS = int(__import__("os").environ.get("SP3D_BENCH_PERSONS", "3"))
WARMUP = 3
ITERS = 10


def _fallback_occupancy(cfg, branch):
    """Worst per-(sample, view) slice-warp hosting-failure count on the
    RootNet whole-space grid for this scene's real geometry — failures past
    the 8192-slot exact-fix budget (ops/unproject.py:_exact_fix_failed)
    degrade silently, so bench surfaces the occupancy. The ok mask depends
    only on sample coordinates (cameras/grid), so dummy 1-channel heatmaps
    suffice and this compiles as a tiny side program."""
    import jax
    import jax.numpy as jnp

    from selfpose3d_tpu.geometry.grid import compute_grid
    from selfpose3d_tpu.ops.unproject import (
        compute_sample_grid,
        sample_whole_space_slicewarp,
    )

    cube = tuple(cfg.MULTI_PERSON.INITIAL_CUBE_SIZE)
    hm_w, hm_h = (s // 4 for s in cfg.NETWORK.IMAGE_SIZE)

    @jax.jit
    def occupancy(cam, trans, orig_wh):
        B = trans.shape[0]
        grid = compute_grid(
            tuple(cfg.MULTI_PERSON.SPACE_SIZE),
            jnp.asarray(cfg.MULTI_PERSON.SPACE_CENTER),
            cube,
        )
        sg, bnd = compute_sample_grid(
            grid[None, None], cam, trans, tuple(cfg.NETWORK.IMAGE_SIZE),
            (hm_w, hm_h), orig_wh=orig_wh,
        )
        dummy = jnp.zeros((B, trans.shape[1], hm_h, hm_w, 1), jnp.float32)
        _, stats = sample_whole_space_slicewarp(
            dummy, sg, bnd, cube, return_stats=True,
        )
        return stats["sw_failed_max"]

    return float(occupancy(branch.cam, branch.trans, branch.orig_wh))


def _device_preflight(timeout_s: float = 180.0) -> None:
    """Fail FAST (with a clear message) if the accelerator is unreachable.

    jax.devices() on the axon backend blocks forever when the stdio relay
    tunnel (/root/.tpu_init.py) has died — observed mid-r4 — which would
    hang the whole bench harness. Probe in a subprocess with a timeout so
    a dead tunnel yields a diagnosable non-zero exit instead."""
    import subprocess
    import sys

    probe = "import jax; d = jax.devices(); print(d[0].platform)"
    try:
        proc = subprocess.run(
            [sys.executable, "-c", probe],
            timeout=timeout_s, capture_output=True, text=True,
        )
        if proc.returncode == 0:
            return
        msg = proc.stderr.strip()[-400:]
    except subprocess.TimeoutExpired:
        msg = f"device enumeration hung > {timeout_s:.0f}s (tunnel dead?)"
    print(f"bench: accelerator unreachable — {msg}", file=sys.stderr)
    raise SystemExit(3)


def main():
    _device_preflight()
    import jax

    # persistent compile cache: full-model XLA compiles through the axon
    # remote-compile tunnel take ~25 min; cached reruns start in seconds
    jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from __graft_entry__ import _flagship_cfg
    from selfpose3d_tpu.data.synthetic import make_synthetic_branch
    from selfpose3d_tpu.models import get_model

    import dataclasses

    cfg = _flagship_cfg(tiny=False)
    # SP3D_BENCH_BUCKETS: override candidate buckets, e.g. "10" to force
    # the full-K path (the honest worst case for >5-person scenes —
    # with a random-init RootNet, proposal flags don't track the scene's
    # true person count, so SP3D_BENCH_PERSONS alone can't reach it)
    import dataclasses as _dc
    import os as _os

    bk = _os.environ.get("SP3D_BENCH_BUCKETS", "")
    if bk:
        buckets = [int(x) for x in bk.split(",") if x]
        cfg = _dc.replace(cfg, MULTI_PERSON=_dc.replace(
            cfg.MULTI_PERSON, CANDIDATE_BUCKETS=buckets))
    # production fast path (both default): the exact-within-hosting Pallas
    # slice-warp sampler (ops/slicewarp.py) and <=5-candidate bucketing
    # (cfg MULTI_PERSON.CANDIDATE_BUCKETS) — PoseNet compute scales with the
    # scene's people count exactly like the reference's per-valid-candidate
    # python loop (ref: multi_person_posenet_ssv.py:365-383)
    model = get_model(cfg)  # bf16 compute path
    branch, _ = make_synthetic_branch(
        cfg, batch_size=BATCH, num_person=PERSONS, with_images=True
    )
    # init at B=1: uncompiled init at full batch would blow HBM; params are
    # batch-agnostic.
    import jax.numpy as jnp

    branch1, _ = make_synthetic_branch(cfg, batch_size=1, num_person=3, with_images=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
        branch1,
    )

    # The timed program reduces its outputs to ONE scalar checksum inside
    # the jit: on the axon backend, jax.block_until_ready on large outputs
    # returns without waiting (measured r5: a 1.1 TF matmul "finished" in
    # 30 us under it), so the only honest sync is a 4-byte scalar pull —
    # which also avoids dragging full outputs over the ~10 MB/s tunnel.
    @jax.jit
    def infer(params, batch_stats, br):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            br,
            method="do_inference",
        )
        return sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)
        )

    params = variables["params"]
    stats = variables.get("batch_stats", {})

    import numpy as _np

    for _ in range(WARMUP):
        out = infer(params, stats, branch)
    _ = float(_np.asarray(out))

    # xprof capture: SP3D_PROFILE=/path dumps a jax.profiler trace of the
    # timed region for TensorBoard/xprof analysis
    import contextlib
    import os

    prof_dir = os.environ.get("SP3D_PROFILE", "")
    ctx = jax.profiler.trace(prof_dir) if prof_dir else contextlib.nullcontext()
    with ctx:
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = infer(params, stats, branch)
        _ = float(_np.asarray(out))  # syncs the serial device queue
        dt = time.perf_counter() - t0

    fps = BATCH * ITERS / dt
    import sys

    try:
        occ = _fallback_occupancy(cfg, branch)
        print(
            f"slice-warp fallback occupancy: max {occ:.0f} both-slicings-"
            f"failed points per (sample, view) on the RootNet grid "
            f"(exact-fix budget 16384)",
            file=sys.stderr,
        )
    except Exception as e:  # telemetry must never sink the bench number
        occ = None
        print(f"fallback-occupancy probe failed: {e}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "panoptic_5view_inference_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / A100_EST_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
