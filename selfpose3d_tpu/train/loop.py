"""Training/validation loops wiring datasets, jitted steps, sharding,
checkpointing, and metric logging together.

Replaces lib/core/function.py:27-508 and the epoch orchestration in
tools/train_3d.py:78-236.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional

import jax
import numpy as np

from selfpose3d_tpu.config import Config
from selfpose3d_tpu.data.loader import PrefetchLoader, collate_branch
from selfpose3d_tpu.parallel.mesh import (
    local_batch_size,
    local_rows,
    make_mesh,
    process_allgather_tree,
    replicate,
    shard_batch,
)
from selfpose3d_tpu.train.step import (
    make_inference_step,
    make_ssv_train_step,
    make_supervised_train_step,
)
from selfpose3d_tpu.train.train_state import TrainState, create_train_state
from selfpose3d_tpu.utils.meters import AverageMeter

logger = logging.getLogger(__name__)


def train_epoch_ssv(
    cfg: Config,
    model,
    state: TrainState,
    dataset,
    epoch: int,
    mesh=None,
    rng: Optional[jax.Array] = None,
    writer=None,
    load_images: bool = True,
    output_dir: str = "",
) -> TrainState:
    """One SSV training epoch (ref: function.py:27-217)."""
    meters: Dict[str, AverageMeter] = {}
    batch_time, data_time = AverageMeter(), AverageMeter()

    posenet_stage = epoch >= cfg.NETWORK.INIT_TRAIN_EPOCHS_ROOTNET
    l1_stage = epoch >= cfg.TRAIN.L1_EPOCH
    step_fn = make_ssv_train_step(
        model, train_posenet_stage=posenet_stage, use_l1_stage=l1_stage
    )
    # host-level PoseNet bucket dispatch (TRAIN.BUCKET_DISPATCH='meta'):
    # pick the per-bucket compiled single-branch step from the batch's
    # person count (see config.py) — the in-graph switch is inference-only
    K_max = cfg.MULTI_PERSON.MAX_PEOPLE_NUM
    dispatch_buckets = ()
    if (
        cfg.TRAIN.BUCKET_DISPATCH == "meta"
        and posenet_stage
        and cfg.MULTI_PERSON.CANDIDATE_BUCKETS
    ):
        dispatch_buckets = tuple(
            b for b in cfg.MULTI_PERSON.CANDIDATE_BUCKETS if b < K_max
        ) + (K_max,)

    def pick_step(b3):
        if not dispatch_buckets:
            return step_fn
        need = min(int(np.max(np.asarray(b3.num_person))) + 1, K_max)
        if jax.process_count() > 1:
            # every host must dispatch the SAME compiled program: the jitted
            # step carries cross-host collectives, so disagreeing bucket
            # choices desynchronize SPMD training (advisor r4). Agree on the
            # global max person count before choosing.
            from jax.experimental import multihost_utils

            need = int(
                np.max(multihost_utils.process_allgather(np.int32(need)))
            )
        k = next(b for b in dispatch_buckets if b >= need)
        return make_ssv_train_step(
            model, train_posenet_stage=posenet_stage, use_l1_stage=l1_stage,
            k_cap=None if k == K_max else k,
        )

    if rng is None:
        rng = jax.random.PRNGKey(epoch)

    # per-HOST batch: the loader stripes data per process and shard_batch
    # assembles the global batch as per-host x process_count
    batch = local_batch_size(mesh, cfg.TRAIN.BATCH_SIZE)

    def make_batch(idxs):
        b1s, b2s, b3s = [], [], []
        for i in idxs:
            b1, b2, b3 = dataset.get_ssv_frame(i, seed=epoch, load_images=load_images)
            b1s.append(b1)
            b2s.append(b2)
            b3s.append(b3)
        return (collate_branch(b1s), collate_branch(b2s), collate_branch(b3s))

    loader = PrefetchLoader(
        len(dataset), batch, make_batch,
        shuffle=cfg.TRAIN.SHUFFLE, num_workers=cfg.WORKERS, seed=epoch,
        drop_last=True,
    )

    # xprof: SP3D_PROFILE=/path captures a jax.profiler trace of steps
    # [2, 2+SP3D_PROFILE_STEPS) of epoch 0 for TensorBoard/xprof analysis
    import os

    prof_dir = os.environ.get("SP3D_PROFILE", "")
    prof_steps = max(1, int(os.environ.get("SP3D_PROFILE_STEPS", "3")))
    prof_active = False

    end = time.time()
    for i, (b1, b2, b3) in enumerate(loader):
        data_time.update(time.time() - end)
        if prof_dir and epoch == 0 and i == 2:
            jax.profiler.start_trace(prof_dir)
            prof_active = True
        if prof_active and i == 2 + prof_steps:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            prof_active = False
        fn = pick_step(b3)
        if mesh is not None:
            b1, b2, b3 = (shard_batch(b, mesh) for b in (b1, b2, b3))
        state, metrics = fn(state, b1, b2, b3, rng)
        if i % cfg.PRINT_FREQ == 0:
            jax.block_until_ready(metrics["loss"])
            batch_time.update(time.time() - end)
            for k, v in metrics.items():
                meters.setdefault(k, AverageMeter()).update(float(v))
            speed = batch / max(batch_time.val, 1e-9)
            msg = (
                f"Epoch: [{epoch}][{i}/{len(loader)}] "
                f"Time: {batch_time.val:.3f}s ({batch_time.avg:.3f}s) "
                f"Speed: {speed:.1f} samples/s "
                f"Data: {data_time.val:.3f}s ({data_time.avg:.3f}s) "
                + " ".join(
                    f"{k}: {m.val:.6f} ({m.avg:.6f})" for k, m in meters.items()
                )
            )
            logger.info(msg)
            if writer is not None:
                step = int(state.step)
                for k, m in meters.items():
                    writer.add_scalar(f"train/{k}", m.val, step)
            if cfg.DEBUG.DEBUG and output_dir:
                from selfpose3d_tpu.train.step import make_ssv_debug_forward
                from selfpose3d_tpu.utils.vis import save_debug_images

                # prediction-bearing dump (ref: function.py:176-217):
                # re-run a forward on this batch for heatmaps/poses/roots
                dbg_fn = make_ssv_debug_forward(
                    model,
                    train_posenet_stage=epoch >= cfg.NETWORK.INIT_TRAIN_EPOCHS_ROOTNET,
                    use_l1_stage=epoch >= cfg.TRAIN.L1_EPOCH,
                )
                pred2, hm3, gc = dbg_fn(
                    state.params, state.batch_stats, b1, b2, b3, rng
                )
                prefix = f"{output_dir}/debug/train_{epoch}_{i}"
                save_debug_images(cfg, b3, hm3, pred2, gc, prefix)
        end = time.time()
    if prof_active:
        # short epochs: close the trace so the capture isn't lost
        jax.block_until_ready(state.params)
        jax.profiler.stop_trace()
    return state


def train_epoch_supervised(
    cfg: Config, model, state: TrainState, dataset, epoch: int,
    mesh=None, writer=None, load_images: bool = True,
) -> TrainState:
    """One supervised (VoxelPose baseline) epoch (ref: function.py:219-350)."""
    meters: Dict[str, AverageMeter] = {}
    batch_time, data_time = AverageMeter(), AverageMeter()
    step_fn = make_supervised_train_step(model)

    batch = local_batch_size(mesh, cfg.TRAIN.BATCH_SIZE)

    def make_batch(idxs):
        # seed=epoch: fresh RandAugment draws every epoch (advisor r3;
        # ref: JointsDataset.py:148 draws from the global RNG each call)
        frames = [
            dataset.get_frame(i, load_images=load_images, seed=epoch)
            for i in idxs
        ]
        return collate_branch([f["views"] for f in frames])

    loader = PrefetchLoader(
        len(dataset), batch, make_batch,
        shuffle=cfg.TRAIN.SHUFFLE, num_workers=cfg.WORKERS, seed=epoch,
        drop_last=True,
    )

    end = time.time()
    for i, branch in enumerate(loader):
        data_time.update(time.time() - end)
        if mesh is not None:
            branch = shard_batch(branch, mesh)
        state, metrics = step_fn(state, branch)
        if i % cfg.PRINT_FREQ == 0:
            jax.block_until_ready(metrics["loss"])
            batch_time.update(time.time() - end)
            for k, v in metrics.items():
                meters.setdefault(k, AverageMeter()).update(float(v))
            logger.info(
                f"Epoch: [{epoch}][{i}/{len(loader)}] "
                f"Time: {batch_time.val:.3f}s "
                f"Data: {data_time.val:.3f}s "
                + " ".join(f"{k}: {m.avg:.6f}" for k, m in meters.items())
            )
        end = time.time()
    return state


def validate_3d(
    cfg: Config,
    model,
    state: TrainState,
    dataset,
    output_dir: str = "",
    load_images: bool = True,
    mesh=None,
    metrics_out: Optional[dict] = None,
) -> Optional[float]:
    """Validation pass + dataset.evaluate (ref: function.py:352-490).

    With ``mesh``, inference runs SPMD over all devices (batch sharded on
    the data axis, params replicated) so per-epoch validation scales with
    chips like the train step does; the final partial batch is padded to
    the full size (also avoiding a ragged-shape recompile) and trimmed.

    Returns the model-selection metric (mean AP over thresholds).
    """
    infer = make_inference_step(model)
    batch = local_batch_size(mesh, cfg.TEST.BATCH_SIZE)

    def make_batch(idxs):
        frames = [dataset.get_frame(i, load_images=load_images) for i in idxs]
        views = [f["views"] for f in frames]
        while len(views) < batch:  # pad the last batch to a full shape
            views.append(views[-1])
        return collate_branch(views), list(idxs)

    loader = PrefetchLoader(
        len(dataset), batch, make_batch, shuffle=False, num_workers=cfg.WORKERS
    )

    params, stats = state.params, state.batch_stats
    if mesh is not None:
        params, stats = replicate((params, stats), mesh)

    multihost = jax.process_count() > 1
    idx_list, pred_list, root_list = [], [], []
    for branch, idxs in loader:
        if mesh is not None:
            branch = shard_batch(branch, mesh)
        pred, _, gc = infer(params, stats, branch)
        # multi-host: the outputs are global arrays of which only this
        # host's stripe is addressable — pull back exactly the rows this
        # host fed (advisor r3: np.asarray on a non-fully-addressable
        # global array errors, and evaluate needs ALL hosts' predictions)
        pred = local_rows(pred) if multihost else np.asarray(pred)
        gc = local_rows(gc) if multihost else np.asarray(gc)
        n = len(idxs)
        idx_list.extend(idxs)
        pred_list.append(pred[:n])
        root_list.append(gc[:n])

    idx_arr = np.asarray(idx_list, np.int64)
    preds = np.concatenate(pred_list) if pred_list else np.zeros((0,))
    roots = np.concatenate(root_list) if root_list else np.zeros((0,))
    if multihost:
        # per-host stripe lengths can differ by 1: pad to the max before the
        # fixed-shape allgather, then drop the padding via idx == -1
        cap = -(-len(dataset) // jax.process_count())
        assert len(idx_arr) <= cap, (
            f"host {jax.process_index()} produced {len(idx_arr)} rows, more "
            f"than the per-host stripe cap {cap} — loader striping and the "
            "fixed-shape allgather disagree"
        )
        pad = cap - len(idx_arr)
        if pad > 0:
            if len(preds) == 0:
                # empty stripe (len(dataset) < process_count): there is no
                # row to repeat, so pad with zeros of the known pred shapes
                K = cfg.MULTI_PERSON.MAX_PEOPLE_NUM
                J = cfg.NETWORK.NUM_JOINTS
                preds = np.zeros((0, K, J, 5), np.float32)
                roots = np.zeros((0, K, 5), np.float32)
            idx_arr = np.concatenate([idx_arr, np.full(pad, -1, np.int64)])
            fill_p = np.zeros((pad,) + preds.shape[1:], preds.dtype)
            fill_r = np.zeros((pad,) + roots.shape[1:], roots.dtype)
            preds = np.concatenate([preds, fill_p])
            roots = np.concatenate([roots, fill_r])
        idx_arr, preds, roots = process_allgather_tree((idx_arr, preds, roots))
        keep = idx_arr >= 0
        idx_arr, preds, roots = idx_arr[keep], preds[keep], roots[keep]
    order = np.argsort(idx_arr, kind="stable")
    all_preds = [preds[i] for i in order]
    all_roots = [roots[i] for i in order]

    metrics = dataset.evaluate(all_preds, all_roots, output_dir)
    if metrics_out is not None:
        metrics_out.update(metrics)
    aps = metrics.get("aps")
    if aps is None:
        if "avg_pcp" in metrics:  # shelf/campus PCP protocol (ref: :477-487)
            logger.info(
                "actor PCP: %s | avg PCP: %.4f | recall@500: %.4f",
                np.round(metrics["actor_pcp"], 4).tolist(),
                metrics["avg_pcp"],
                metrics["recall500"],
            )
            return float(metrics["avg_pcp"])
        return None
    msg = (
        "AP@25..150: " + " ".join(f"{a*100:.2f}" for a in metrics["aps"])
        + f" | MPJPE@500: {metrics['mpjpe']:.2f}mm"
        + f" | recall@500: {metrics['recall500']*100:.2f}"
    )
    if "aps_root" in metrics:
        msg += (
            " || root AP@25..150: "
            + " ".join(f"{a*100:.2f}" for a in metrics["aps_root"])
            + f" | root MPJPE: {metrics['mpjpe_root']:.2f}mm"
        )
    logger.info(msg)
    return float(np.mean(metrics["aps"]))
