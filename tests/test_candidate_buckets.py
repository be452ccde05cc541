"""Candidate-count bucketing: truncating the candidate axis to the smallest
bucket covering every valid proposal must not change any output (the
TPU-native analogue of the reference's valid-candidates-only python loop,
ref: multi_person_posenet_ssv.py:365-383)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selfpose3d_tpu.data.synthetic import make_synthetic_branch
from selfpose3d_tpu.models.pose_net import PoseNet

from tests.test_multi_person import small_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    branch, _ = make_synthetic_branch(cfg, batch_size=2, with_images=False)
    V = cfg.DATASET.CAMERA_NUM
    J = cfg.NETWORK.NUM_JOINTS
    hm_w, hm_h = cfg.NETWORK.HEATMAP_SIZE
    rng = np.random.RandomState(0)
    heatmaps = jnp.asarray(rng.rand(2, V, hm_h, hm_w, J), jnp.float32)

    K = 8
    gc = np.zeros((2, K, 5), np.float32)
    gc[..., 3] = -1.0
    gc[0, :2, :3] = [[100.0, -400.0, 900.0], [-500.0, 0.0, 800.0]]
    gc[0, :2, 3] = 0.0
    gc[1, :3, :3] = [[0.0, 0.0, 850.0], [300.0, -200.0, 900.0], [-100.0, 100.0, 800.0]]
    gc[1, :3, 3] = 0.0
    gc = jnp.asarray(gc)

    def mk(buckets):
        return PoseNet(
            cube_size=tuple(cfg.PICT_STRUCT.CUBE_SIZE),
            image_wh=tuple(cfg.NETWORK.IMAGE_SIZE),
            num_joints=J,
            buckets=buckets,
        )

    base = mk(())
    variables = base.init(
        jax.random.PRNGKey(0), heatmaps, branch.cam, branch.trans,
        branch.orig_wh, gc,
    )
    return branch, heatmaps, gc, mk, variables


class TestCandidateBuckets:
    def test_bucketed_matches_full(self, setup):
        branch, hm, gc, mk, variables = setup
        full = mk(())
        buck = mk((4,))
        p0, v0 = full.apply(variables, hm, branch.cam, branch.trans,
                            branch.orig_wh, gc)
        p1, v1 = buck.apply(variables, hm, branch.cam, branch.trans,
                            branch.orig_wh, gc)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))

    def test_small_bucket_selected_under_jit(self, setup):
        """Valid count 3 -> the 4-bucket branch runs; outputs match full."""
        branch, hm, gc, mk, variables = setup
        buck = mk((4,))

        @jax.jit
        def run(gc_):
            return buck.apply(variables, hm, branch.cam, branch.trans,
                              branch.orig_wh, gc_)

        p1, _ = run(gc)
        full = mk(())
        p0, _ = full.apply(variables, hm, branch.cam, branch.trans,
                           branch.orig_wh, gc)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   rtol=1e-5, atol=1e-4)

    def test_overflow_uses_full_branch(self, setup):
        """6 valid candidates overflow the 4-bucket -> full-K branch."""
        branch, hm, gc, mk, variables = setup
        gc6 = gc.at[0, :6, 3].set(0.0)
        gc6 = gc6.at[0, 2:6, 0].set(jnp.asarray([200.0, -300.0, 400.0, 50.0]))
        buck = mk((4,))
        full = mk(())
        p1, _ = buck.apply(variables, hm, branch.cam, branch.trans,
                           branch.orig_wh, gc6)
        p0, _ = full.apply(variables, hm, branch.cam, branch.trans,
                           branch.orig_wh, gc6)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   rtol=1e-5, atol=1e-4)

    def test_train_mode_with_masked_bn(self, setup):
        """Bucketed train-mode run: BN stats equal the full run's (masked
        stats only see valid candidates either way)."""
        branch, hm, gc, mk, variables = setup
        buck = mk((4,))
        full = mk(())
        (_, _), st1 = buck.apply(
            variables, hm, branch.cam, branch.trans, branch.orig_wh, gc,
            train=True, mutable=["batch_stats"],
        )
        (_, _), st0 = full.apply(
            variables, hm, branch.cam, branch.trans, branch.orig_wh, gc,
            train=True, mutable=["batch_stats"],
        )
        for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st0)):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


class TestHostBucketDispatch:
    """TRAIN.BUCKET_DISPATCH='meta': per-step compiled single-branch graphs
    with a static candidate cap (the in-graph switch TRAIN graph OOMs remote
    compilation, ARCHITECTURE.md). When every valid candidate fits under the
    cap, losses must equal the full-K step's exactly."""

    def test_kcap_losses_match_full_k(self):
        import dataclasses

        from selfpose3d_tpu.models import get_model

        # USE_GT proposals: valid count == num_person, so a scene with 2
        # people fits k_cap=2 exactly
        cfg = small_cfg(
            NETWORK={"USE_GT": True},
            MULTI_PERSON={"MAX_PEOPLE_NUM": 4},
        )
        model = get_model(cfg)
        B = 2
        b1, _ = make_synthetic_branch(cfg, batch_size=B, num_person=2,
                                      with_images=False, rot_deg=10.0, seed=3)
        b2, _ = make_synthetic_branch(cfg, batch_size=B, num_person=2,
                                      with_images=False, rot_deg=-8.0, seed=3)
        b3, _ = make_synthetic_branch(cfg, batch_size=B, num_person=2,
                                      with_images=False, seed=3)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
            b3,
        )

        def run(k_cap):
            pred2, _, _, losses = model.apply(
                variables, b1, b2, b3,
                train_posenet_stage=True, use_l1_stage=True, train=True,
                bn_eval=True, k_cap=k_cap,
                rngs={"synth": jax.random.PRNGKey(5)},
                method="ssv_losses",
            )
            return pred2, losses

        pred_full, losses_full = run(None)
        pred_cap, losses_cap = run(2)
        assert set(losses_full) == set(losses_cap)
        for k in losses_full:
            np.testing.assert_allclose(
                np.asarray(losses_cap[k]), np.asarray(losses_full[k]),
                rtol=1e-5, atol=1e-7, err_msg=k,
            )
        # padded candidate slots carry no pose
        assert pred_cap.shape == pred_full.shape
        np.testing.assert_allclose(
            np.asarray(pred_cap)[:, :2, :, :3],
            np.asarray(pred_full)[:, :2, :, :3], atol=1e-5,
        )
        assert np.all(np.asarray(pred_cap)[:, 2:, :, :3] == 0)

    def test_kcap_truncation_drops_lowest_score(self):
        """Pin the documented 'meta'-dispatch deviation (config.py
        TRAIN.BUCKET_DISPATCH): when more proposals are valid than the cap,
        the k_cap slice keeps the FIRST Kp (highest-score) proposals and the
        losses equal a full-K run in which the dropped proposals were
        invalidated — i.e. truncation behaves exactly like invalidation, it
        never corrupts the kept candidates' losses."""
        from selfpose3d_tpu.models import get_model

        cfg = small_cfg(
            NETWORK={"USE_GT": True},
            MULTI_PERSON={"MAX_PEOPLE_NUM": 4},
        )
        model = get_model(cfg)
        B = 2
        # 3 valid GT proposals per sample; the cap keeps only 2
        b1, _ = make_synthetic_branch(cfg, batch_size=B, num_person=3,
                                      with_images=False, rot_deg=10.0, seed=7)
        b2, _ = make_synthetic_branch(cfg, batch_size=B, num_person=3,
                                      with_images=False, rot_deg=-8.0, seed=7)
        b3, _ = make_synthetic_branch(cfg, batch_size=B, num_person=3,
                                      with_images=False, seed=7)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
            b3,
        )

        def run(b3_, k_cap):
            _, _, _, losses = model.apply(
                variables, b1, b2, b3_,
                train_posenet_stage=True, use_l1_stage=True, train=True,
                bn_eval=True, k_cap=k_cap,
                rngs={"synth": jax.random.PRNGKey(5)},
                method="ssv_losses",
            )
            return losses

        # truncated: 3 valid proposals, cap 2
        losses_cap = run(b3, 2)
        # oracle: full K with the third proposal explicitly invalidated
        # (same roots; only num_person, which feeds _gt_grid_centers's
        # validity flags, changes)
        b3_inval = b3.replace(num_person=jnp.minimum(b3.num_person, 2))
        losses_inval = run(b3_inval, None)
        assert set(losses_cap) == set(losses_inval)
        for k in losses_cap:
            np.testing.assert_allclose(
                np.asarray(losses_cap[k]), np.asarray(losses_inval[k]),
                rtol=1e-5, atol=1e-7, err_msg=k,
            )

    def test_train_step_dispatch_runs(self):
        """A k_cap'd compiled train step steps and yields finite losses."""
        from selfpose3d_tpu.models import get_model
        from selfpose3d_tpu.train.step import make_ssv_train_step
        from selfpose3d_tpu.train.train_state import create_train_state

        cfg = small_cfg(
            NETWORK={"USE_GT": True},
            MULTI_PERSON={"MAX_PEOPLE_NUM": 4},
        )
        model = get_model(cfg)
        B = 2
        b1, _ = make_synthetic_branch(cfg, batch_size=B, num_person=2,
                                      with_images=False, rot_deg=10.0, seed=3)
        b2, _ = make_synthetic_branch(cfg, batch_size=B, num_person=2,
                                      with_images=False, rot_deg=-8.0, seed=3)
        b3, _ = make_synthetic_branch(cfg, batch_size=B, num_person=2,
                                      with_images=False, seed=3)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
            b3,
        )
        state = create_train_state(cfg, variables, steps_per_epoch=10)
        step = make_ssv_train_step(
            model, train_posenet_stage=True, use_l1_stage=False, k_cap=2
        )
        state2, metrics = step(state, b1, b2, b3, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state2.step) == int(np.asarray(1))
