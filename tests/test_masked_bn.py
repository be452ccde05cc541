"""Masked BatchNorm: PoseNet BN statistics exclude invalid candidates.

The reference runs V2V only on valid candidates (ref:
lib/models/pose_regression_net.py:49-51), so BN batch moments never see
padding. Here candidates are a fixed-shape masked axis; the V2V BatchNorms
take a statistics mask instead. These tests pin the invariant: padding the
candidate axis with invalid entries changes neither the updated running
statistics nor the valid candidates' predictions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selfpose3d_tpu.models.pose_net import PoseNet
from selfpose3d_tpu.models.v2v_net import V2VNet

from tests.test_multi_person import small_cfg
from selfpose3d_tpu.data.synthetic import make_synthetic_branch


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


class TestV2VMask:
    def test_mask_restricts_stats(self, rng):
        x_valid = jnp.asarray(rng.rand(2, 8, 8, 8, 3), jnp.float32)
        pad = jnp.zeros((3, 8, 8, 8, 3), jnp.float32)
        x_padded = jnp.concatenate([x_valid, pad], axis=0)
        mask = jnp.array([True, True, False, False, False]).reshape(5, 1, 1, 1, 1)

        model = V2VNet(out_ch=3)
        vars0 = model.init(jax.random.PRNGKey(0), x_valid, train=False)

        _, st_valid = model.apply(
            vars0, x_valid, train=True, mutable=["batch_stats"]
        )
        _, st_masked = model.apply(
            vars0, x_padded, train=True, mask=mask, mutable=["batch_stats"]
        )
        for a, b in zip(_leaves(st_valid), _leaves(st_masked)):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

        # sanity: without the mask the zero-padding skews the stats
        _, st_unmasked = model.apply(
            vars0, x_padded, train=True, mutable=["batch_stats"]
        )
        diffs = [
            float(np.max(np.abs(a - b)))
            for a, b in zip(_leaves(st_valid), _leaves(st_unmasked))
        ]
        assert max(diffs) > 1e-3


class TestPoseNetMaskedBN:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = small_cfg()
        branch, _ = make_synthetic_branch(cfg, batch_size=1, with_images=False)
        V = cfg.DATASET.CAMERA_NUM
        J = cfg.NETWORK.NUM_JOINTS
        hm_w, hm_h = cfg.NETWORK.HEATMAP_SIZE
        rng = np.random.RandomState(0)
        heatmaps = jnp.asarray(rng.rand(1, V, hm_h, hm_w, J), jnp.float32)
        pose_net = PoseNet(
            cube_size=tuple(cfg.PICT_STRUCT.CUBE_SIZE),
            image_wh=tuple(cfg.NETWORK.IMAGE_SIZE),
            num_joints=J,
        )
        centers_valid = jnp.array(
            [[[100.0, -400.0, 900.0, 1.0, 0.9], [-500.0, 0.0, 800.0, 0.0, 0.8]]]
        )  # (1, 2, 5) both valid (flag >= 0)
        invalid = jnp.array([[[0.0, 0.0, 0.0, -1.0, 0.0]]])  # flag < 0
        centers_padded = jnp.concatenate(
            [centers_valid, jnp.tile(invalid, (1, 4, 1))], axis=1
        )  # (1, 6, 5)
        variables = pose_net.init(
            jax.random.PRNGKey(0),
            heatmaps, branch.cam, branch.trans, branch.orig_wh, centers_valid,
        )
        return pose_net, variables, heatmaps, branch, centers_valid, centers_padded

    def test_stats_and_preds_invariant_to_padding(self, setup):
        pose_net, variables, heatmaps, branch, cv, cp = setup

        def run(centers):
            (pred, valid), st = pose_net.apply(
                variables, heatmaps, branch.cam, branch.trans, branch.orig_wh,
                centers, train=True, mutable=["batch_stats"],
            )
            return pred, valid, st

        pred_v, valid_v, st_v = run(cv)
        pred_p, valid_p, st_p = run(cp)

        assert valid_v.sum() == 2 and valid_p.sum() == 2
        for a, b in zip(_leaves(st_v), _leaves(st_p)):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(pred_p[:, :2], pred_v, rtol=1e-5, atol=1e-4)
        # padded candidates emit zeros
        np.testing.assert_array_equal(np.asarray(pred_p[:, 2:]), 0.0)

    def test_all_invalid_keeps_stats_finite(self, setup):
        pose_net, variables, heatmaps, branch, cv, _ = setup
        none_valid = cv.at[..., 3].set(-1.0)
        (pred, valid), st = pose_net.apply(
            variables, heatmaps, branch.cam, branch.trans, branch.orig_wh,
            none_valid, train=True, mutable=["batch_stats"],
        )
        assert float(valid.sum()) == 0.0
        assert all(np.isfinite(np.asarray(l)).all() for l in _leaves(st))
        assert np.isfinite(np.asarray(pred)).all()
