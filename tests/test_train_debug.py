"""Prediction-bearing debug dumps during SSV training
(ref: lib/core/function.py:176-217 — the reference renders predicted
heatmaps, 3D poses, and root cubes every PRINT_FREQ batch)."""

import os

import jax
import numpy as np
import pytest

from selfpose3d_tpu.data.synthetic_dataset import SyntheticSceneDataset
from selfpose3d_tpu.models import get_model
from selfpose3d_tpu.train.loop import train_epoch_ssv
from selfpose3d_tpu.train.train_state import create_train_state

from tests.test_multi_person import small_cfg


def test_debug_dumps_carry_predictions(tmp_path):
    cfg = small_cfg(
        TRAIN={"BATCH_SIZE": 1, "SHUFFLE": False},
        WORKERS=1,
        PRINT_FREQ=1,
        DEBUG={
            "DEBUG": True,
            "SAVE_BATCH_IMAGES_GT": True,
            "SAVE_BATCH_IMAGES_PRED": True,
            "SAVE_HEATMAPS_PRED": True,
            "SAVE_3D_POSES": True,
            "SAVE_3D_ROOTS": True,
        },
    )
    model = get_model(cfg)
    ds = SyntheticSceneDataset(cfg, num_frames=1)
    from selfpose3d_tpu.data.loader import collate_branch

    b1, b2, b3 = (collate_branch([x]) for x in ds.get_ssv_frame(0, seed=0))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
        b1, b2, b3, train=True, method="ssv_losses",
    )
    state = create_train_state(cfg, variables)
    out_dir = str(tmp_path)
    os.makedirs(os.path.join(out_dir, "debug"), exist_ok=True)
    train_epoch_ssv(
        cfg, model, state, ds, epoch=100, output_dir=out_dir,
    )
    dumped = os.listdir(os.path.join(out_dir, "debug"))
    # prediction-bearing artifacts, not just GT overlays
    assert any("hm_pred" in f for f in dumped), dumped
    assert any("3d_poses" in f for f in dumped), dumped
    assert any("3d_roots" in f for f in dumped), dumped
    # all-camera composite with projected predicted skeletons
    assert any("views_pred" in f for f in dumped), dumped
