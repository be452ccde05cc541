"""Training CLI (ref: tools/train_3d.py).

Usage: sp3d-train --cfg configs/panoptic_ssl/resnet50/cam5_posenet.yaml
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from selfpose3d_tpu.config import load_config
from selfpose3d_tpu.data.registry import get_dataset
from selfpose3d_tpu.models import get_model
from selfpose3d_tpu.parallel.mesh import make_mesh, replicate
from selfpose3d_tpu.train import checkpoint as ckpt
from selfpose3d_tpu.train.loop import train_epoch_ssv, train_epoch_supervised, validate_3d
from selfpose3d_tpu.train.train_state import create_train_state
from selfpose3d_tpu.utils.logging_utils import create_logger, TBWriter


def parse_args():
    p = argparse.ArgumentParser(description="Train multi-view 3D pose network")
    p.add_argument("--cfg", required=True, type=str)
    p.add_argument("--no-images", action="store_true",
                   help="drive the pipeline from input heatmaps only")
    p.add_argument("--platform", type=str, default="",
                   help="force a jax platform (e.g. cpu); the container's "
                        "sitecustomize pins the axon TPU backend otherwise")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "(auto-discovers the coordinator on TPU pods / via "
                        "JAX_COORDINATOR_ADDRESS). The mesh then spans all "
                        "hosts' devices and the loader stripes each host's "
                        "input shard by process_index (data/loader.py).")
    return p.parse_args()


def init_variables(cfg, model):
    """Initialize model variables on a representative synthetic batch."""
    from selfpose3d_tpu.data.synthetic import make_synthetic_branch

    branch, _ = make_synthetic_branch(cfg, batch_size=1, with_images=True)
    rngs = {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)}
    if cfg.MODEL == "multi_person_posenet_ssv":
        return model.init(
            rngs, branch, branch, branch,
            train_posenet_stage=True, use_l1_stage=bool(cfg.USE_L1), train=True,
            method="ssv_losses",
        )
    return model.init(rngs, branch, train=True)


def main():
    args = parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        # multi-host SPMD: after this, jax.devices() is global, make_mesh
        # spans every host, and the PrefetchLoader feeds each process its
        # jax.process_index() stripe. Without the flag the CLIs are
        # single-process (all reference-scale configs fit one host).
        jax.distributed.initialize()
    cfg = load_config(args.cfg)
    logger, output_dir, tb_dir = create_logger(cfg, args.cfg, "train")
    logger.info("devices: %s", jax.devices())

    model = get_model(cfg)
    variables = init_variables(cfg, model)

    # staged weight surgery (ref: tools/train_3d.py:150-180). Missing files
    # and key-layout mismatches are hard errors — the curriculum must never
    # silently train a stage from random init.
    mapping = tuple(cfg.COCO_TO_PANOPTIC_MAPPING)
    if cfg.NETWORK.PRETRAINED and os.path.isfile(cfg.NETWORK.PRETRAINED):
        # at-model-build COCO warm start (ref: pose_resnet.py:274-284); the
        # reference tolerates a missing file here (it ships a default path),
        # so presence is checked — but a present file must load.
        logger.info("loading pretrained backbone+attn from %s", cfg.NETWORK.PRETRAINED)
        variables = ckpt.load_torch_stage(
            variables, cfg.NETWORK.PRETRAINED, "pretrained", coco_mapping=mapping
        )
    if cfg.NETWORK.PRETRAINED_BACKBONE:
        logger.info("loading backbone from %s", cfg.NETWORK.PRETRAINED_BACKBONE)
        variables = ckpt.load_torch_stage(
            variables, cfg.NETWORK.PRETRAINED_BACKBONE, "backbone",
            coco_mapping=mapping,
        )
    if cfg.NETWORK.INIT_ROOTNET:
        logger.info("loading rootnet from %s", cfg.NETWORK.INIT_ROOTNET)
        variables = ckpt.load_torch_stage(variables, cfg.NETWORK.INIT_ROOTNET, "root_net")
    if cfg.NETWORK.INIT_ALL:
        logger.info("loading all weights from %s", cfg.NETWORK.INIT_ALL)
        variables = ckpt.load_torch_stage(variables, cfg.NETWORK.INIT_ALL, "all")

    train_ds = get_dataset(cfg, cfg.DATASET.TRAIN_DATASET, cfg.DATASET.TRAIN_SUBSET, True)
    test_ds = get_dataset(cfg, cfg.DATASET.TEST_DATASET, cfg.DATASET.TEST_SUBSET, False)
    steps_per_epoch = max(1, len(train_ds) // max(1, cfg.TRAIN.BATCH_SIZE))

    state = create_train_state(cfg, variables, steps_per_epoch)
    start_epoch = cfg.TRAIN.BEGIN_EPOCH
    best_precision = 0.0
    if cfg.TRAIN.RESUME:
        state, start_epoch, best_precision = ckpt.load_checkpoint(output_dir, state)
        logger.info("resumed at epoch %d (best %.4f)", start_epoch, best_precision)

    mesh = make_mesh() if jax.device_count() > 1 else None
    if mesh is not None:
        state = replicate(state, mesh)
        logger.info("data-parallel over %d devices", mesh.size)

    writer = TBWriter(tb_dir)
    with_ssv = cfg.MODEL == "multi_person_posenet_ssv"
    for epoch in range(start_epoch, cfg.TRAIN.END_EPOCH):
        logger.info("Epoch: %d", epoch)
        if with_ssv:
            state = train_epoch_ssv(
                cfg, model, state, train_ds, epoch, mesh=mesh, writer=writer,
                load_images=not args.no_images, output_dir=output_dir,
            )
        else:
            state = train_epoch_supervised(
                cfg, model, state, train_ds, epoch, mesh=mesh, writer=writer,
                load_images=not args.no_images,
            )
        precision = None
        if not cfg.NETWORK.TRAIN_ONLY_2D:
            precision = validate_3d(
                cfg, model, state, test_ds, output_dir,
                load_images=not args.no_images, mesh=mesh,
            )
        is_best = precision is not None and precision > best_precision
        if is_best:
            best_precision = precision
        logger.info("saving checkpoint (best: %s)", is_best)
        ckpt.save_checkpoint(output_dir, state, epoch + 1, best_precision, is_best)
    writer.close()


if __name__ == "__main__":
    main()
