"""Supervised (VoxelPose baseline) model + train step tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from selfpose3d_tpu.config import load_config
from selfpose3d_tpu.data.synthetic import make_synthetic_branch
from selfpose3d_tpu.models import MultiPersonPoseNet
from selfpose3d_tpu.train.train_state import create_train_state, trainable_labels
from selfpose3d_tpu.train.step import make_supervised_train_step


def sup_cfg(**over):
    base = {
        "MODEL": "multi_person_posenet",
        "DTYPE": "float32",
        "NETWORK": {
            "NUM_JOINTS": 15,
            "IMAGE_SIZE": [128, 64],
            "HEATMAP_SIZE": [32, 16],
            "IMAGE_SIZE_ORIG": [1920, 1080],
            "SIGMA": 3,
            "TRAIN_BACKBONE": True,
        },
        "POSE_RESNET": {"NUM_LAYERS": 18},
        "MULTI_PERSON": {
            "SPACE_SIZE": [8000.0, 8000.0, 2000.0],
            "SPACE_CENTER": [0.0, -500.0, 800.0],
            "INITIAL_CUBE_SIZE": [16, 16, 8],
            "MAX_PEOPLE_NUM": 5,
            "THRESHOLD": -100.0,
        },
        "PICT_STRUCT": {"CUBE_SIZE": [16, 16, 16]},
        "DATASET": {"ROOTIDX": 2, "CAMERA_NUM": 2},
        "TRAIN": {"BATCH_SIZE": 2},
    }
    for k, v in over.items():
        if isinstance(v, dict):
            base.setdefault(k, {}).update(v)
        else:
            base[k] = v
    return load_config(overrides=base)


class TestSupervised:
    def test_train_step(self):
        cfg = sup_cfg()
        model = MultiPersonPoseNet(cfg=cfg)
        branch, _ = make_synthetic_branch(cfg, batch_size=2, num_person=2, with_images=True)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, branch, train=True
        )
        state = create_train_state(cfg, variables)
        params_before = jax.tree.map(jnp.copy, state.params)  # state is donated
        step = make_supervised_train_step(model)
        new_state, metrics = step(state, branch)
        for k in ("loss_2d", "loss_3d", "loss_cord", "loss"):
            assert k in metrics and np.isfinite(float(metrics[k])), k
        assert int(new_state.step) == 1
        # parameters actually moved
        d = jax.tree.map(lambda a, b: jnp.abs(a - b).max(), params_before, new_state.params)
        assert max(float(x) for x in jax.tree.leaves(d)) > 0

    def test_freeze_labels(self):
        # USE_GT so candidates are always matched and pose_net gets gradient
        # (threshold-matched random proposals can land > 500mm from GT)
        cfg = sup_cfg(NETWORK={"TRAIN_BACKBONE": False, "USE_GT": True})
        model = MultiPersonPoseNet(cfg=cfg)
        branch, _ = make_synthetic_branch(cfg, batch_size=1, num_person=1, with_images=True)
        variables = model.init({"params": jax.random.PRNGKey(0)}, branch, train=True)
        labels = trainable_labels(cfg, variables["params"])
        assert all(v == "freeze" for v in jax.tree.leaves(labels["backbone"]))
        assert all(v == "train" for v in jax.tree.leaves(labels["pose_net"]))

        state = create_train_state(cfg, variables)
        params_before = jax.tree.map(jnp.copy, state.params)  # state is donated
        step = make_supervised_train_step(model)
        new_state, _ = step(state, branch)
        # frozen backbone unchanged, pose_net moved
        db = jax.tree.map(
            lambda a, b: jnp.abs(a - b).max(),
            params_before["backbone"], new_state.params["backbone"],
        )
        assert max(float(x) for x in jax.tree.leaves(db)) == 0.0
        dp = jax.tree.map(
            lambda a, b: jnp.abs(a - b).max(),
            params_before["pose_net"], new_state.params["pose_net"],
        )
        assert max(float(x) for x in jax.tree.leaves(dp)) > 0

    def test_use_gt_path(self):
        cfg = sup_cfg(NETWORK={"USE_GT": True})
        model = MultiPersonPoseNet(cfg=cfg)
        branch, poses = make_synthetic_branch(cfg, batch_size=1, num_person=2, with_images=True)
        variables = model.init({"params": jax.random.PRNGKey(0)}, branch, train=False)
        pred, hm, gc, losses = model.apply(variables, branch, train=False)
        np.testing.assert_allclose(
            np.asarray(gc)[0, :2, :3], np.asarray(branch.roots_3d)[0, :2], atol=1e-4
        )
