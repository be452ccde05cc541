"""The branch-folding in ssv_losses must be algebraically exact: each loss
term must equal the reference-style per-branch computation on the same
parameters (eval-mode BN so statistics don't differ)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from selfpose3d_tpu.data.synthetic import make_synthetic_branch
from selfpose3d_tpu.models import get_model
from tests.test_multi_person import small_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg(WITH_ATTN=False, USE_L1=False)
    model = get_model(cfg)
    b1, _ = make_synthetic_branch(cfg, with_images=False, rot_deg=18.0, seed=9)
    b2, _ = make_synthetic_branch(cfg, with_images=False, rot_deg=-12.0, seed=9)
    b3, _ = make_synthetic_branch(cfg, with_images=False, seed=9)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
        b1, b2, b3, train_posenet_stage=True, use_l1_stage=False, train=True,
        method="ssv_losses",
    )
    return cfg, model, variables, (b1, b2, b3)


class TestFoldParity:
    def test_losses_match_per_branch(self, setup):
        cfg, model, variables, (b1, b2, b3) = setup

        # folded (train=False so BN uses running stats in both paths;
        # ROOTNET_TRAIN_SYNTH branch skipped at train=False -> compare
        # loss_2d, loss_root_reg (supervised form), loss_pose3d_ssv)
        _, _, gc, losses = model.apply(
            variables, b1, b2, b3,
            train_posenet_stage=True, use_l1_stage=False, train=False,
            method="ssv_losses",
        )

        # per-branch reference-style recomputation with bound submodules
        bound = model.bind(variables)
        hm1, hm2, hm3 = (br.input_heatmaps for br in (b1, b2, b3))

        l2d = (
            jnp.mean((b1.target_2d - hm1) ** 2)
            + jnp.mean((b2.target_2d - hm2) ** 2)
            + jnp.mean((b3.target_2d - hm3) ** 2)
        ) / 3.0
        np.testing.assert_allclose(
            float(losses["loss_2d"]), float(l2d), rtol=1e-6
        )

        def root_main(br, hm):
            main, gc_b = bound.root_net(
                bound._root_heatmaps(hm), br.cam, br.trans, br.orig_wh,
                hflip=br.hflip, train=False,
            )
            return main, gc_b

        main1, _ = root_main(b1, hm1)
        main2, _ = root_main(b2, hm2)
        main3, gc_ref = root_main(b3, hm3)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_ref), atol=1e-5)

        # supervised root loss form (train=False skips synth)
        lroot = jnp.mean((main1 - b1.target_3d) ** 2) + jnp.mean(
            (main2 - b2.target_3d) ** 2
        )
        np.testing.assert_allclose(
            float(losses["loss_root_reg"]), float(lroot), rtol=1e-5
        )

        # posenet: folded pred must equal per-branch preds
        pred1_ref, valid = bound.pose_net(
            hm1, b1.cam, b1.trans, b1.orig_wh, gc_ref, hflip=b1.hflip, train=False
        )
        pred2_ref, _ = bound.pose_net(
            hm2, b2.cam, b2.trans, b2.orig_wh, gc_ref, hflip=b2.hflip, train=False
        )

        from selfpose3d_tpu.geometry.cameras import project_points_with_trans
        from selfpose3d_tpu.ops.gaussian import render_gaussian_heatmaps

        B, K = gc_ref.shape[:2]
        J = cfg.NETWORK.NUM_JOINTS
        hm_wh = (hm1.shape[3], hm1.shape[2])

        def render(pred, br):
            kps = project_points_with_trans(
                pred.reshape(B, 1, K * J, 3), br.cam, br.trans
            ).reshape(B, br.num_views, K, J, 2)
            hm = render_gaussian_heatmaps(
                kps, hm_wh, sigma=3.0, coord_scale=0.25,
                mask=jnp.broadcast_to(valid[:, None], (B, br.num_views, K)),
            )
            return jnp.transpose(hm, (0, 1, 3, 4, 2))

        hm21 = render(pred2_ref, b1)
        hm12 = render(pred1_ref, b2)
        lp = jnp.mean((b1.target_2d - hm21) ** 2) + jnp.mean(
            (b2.target_2d - hm12) ** 2
        )
        any_valid = (jnp.sum(valid) > 0).astype(jnp.float32)
        np.testing.assert_allclose(
            float(losses["loss_pose3d_ssv"]), float(lp * any_valid), rtol=1e-4
        )
