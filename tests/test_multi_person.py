"""Integration tests: full SSV model inference + loss graph on synthetic scenes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from selfpose3d_tpu.config import load_config
from selfpose3d_tpu.data.synthetic import make_synthetic_branch
from selfpose3d_tpu.models import MultiPersonPoseNetSSV, get_model


def small_cfg(**over):
    base = {
        "MODEL": "multi_person_posenet_ssv",
        "WITH_SSV": True,
        "USE_L1": True,
        "DTYPE": "float32",
        "NETWORK": {
            "NUM_JOINTS": 15,
            "IMAGE_SIZE": [256, 128],
            "HEATMAP_SIZE": [64, 32],
            "IMAGE_SIZE_ORIG": [1920, 1080],
            "SIGMA": 3,
            "ROOTNET_ROOTHM": True,
            "ROOTNET_TRAIN_SYNTH": True,
            "TRAIN_BACKBONE": True,
        },
        "POSE_RESNET": {"NUM_LAYERS": 18},
        "MULTI_PERSON": {
            "SPACE_SIZE": [8000.0, 8000.0, 2000.0],
            "SPACE_CENTER": [0.0, -500.0, 800.0],
            "INITIAL_CUBE_SIZE": [16, 16, 8],
            "MAX_PEOPLE_NUM": 10,
            # keep proposals valid under a random-init rootnet so the
            # pose-loss gate stays open in tests
            "THRESHOLD": -100.0,
        },
        "PICT_STRUCT": {"CUBE_SIZE": [16, 16, 16]},
        "DATASET": {"ROOTIDX": 2, "CAMERA_NUM": 3},
    }
    for k, v in over.items():
        if isinstance(v, dict):
            base.setdefault(k, {}).update(v)
        else:
            base[k] = v
    return load_config(overrides=base)


@pytest.fixture(scope="module")
def cfg():
    return small_cfg()


@pytest.fixture(scope="module")
def model_and_vars(cfg):
    model = get_model(cfg)
    branch, _ = make_synthetic_branch(cfg, with_images=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
        branch,
    )
    return model, variables


class TestInference:
    def test_shapes_and_masks(self, cfg, model_and_vars):
        model, variables = model_and_vars
        branch, poses = make_synthetic_branch(cfg, num_person=3, with_images=False)
        pred, heatmaps, grid_centers = model.apply(
            variables, branch, method="do_inference"
        )
        K = cfg.MULTI_PERSON.MAX_PEOPLE_NUM
        J = cfg.NETWORK.NUM_JOINTS
        assert pred.shape == (1, K, J, 5)
        assert grid_centers.shape == (1, K, 5)
        assert np.all(np.isfinite(np.asarray(pred)))

    def test_gt_roots_path(self, cfg):
        c = cfg.replace(NETWORK=cfg.NETWORK.__class__(
            **{**cfg.NETWORK.__dict__, "USE_GT": True}
        ))
        model = MultiPersonPoseNetSSV(cfg=c)
        branch, poses = make_synthetic_branch(c, num_person=3, with_images=False)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)}, branch
        )
        pred, _, gc = model.apply(variables, branch, method="do_inference")
        gc = np.asarray(gc)
        # first 3 candidates are the GT roots, flags 0,1,2; rest invalid
        np.testing.assert_allclose(gc[0, :3, :3], np.asarray(branch.roots_3d)[0, :3])
        np.testing.assert_allclose(gc[0, :3, 3], [0.0, 1.0, 2.0])
        assert np.all(gc[0, 3:, 3] == -1.0)

    def test_jit_inference(self, cfg, model_and_vars):
        model, variables = model_and_vars
        branch, _ = make_synthetic_branch(cfg, with_images=False)

        @jax.jit
        def infer(v, b):
            return model.apply(v, b, method="do_inference")

        p1, _, _ = infer(variables, branch)
        p2, _, _ = infer(variables, branch)  # cached
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


class TestSSVLosses:
    def test_all_terms_finite(self, cfg, model_and_vars):
        model, variables = model_and_vars
        b1, _ = make_synthetic_branch(cfg, with_images=False, rot_deg=20.0, seed=3)
        b2, _ = make_synthetic_branch(cfg, with_images=False, rot_deg=-15.0, seed=3)
        b3, _ = make_synthetic_branch(cfg, with_images=False, seed=3)

        pred2, hm3, gc, losses = model.apply(
            variables, b1, b2, b3,
            train_posenet_stage=True, use_l1_stage=True, train=True,
            method="ssv_losses",
            rngs={"synth": jax.random.PRNGKey(5)},
            mutable=["batch_stats"],
        )[0]
        for k in ("loss_2d", "loss_root_syn", "loss_root_reg", "loss_pose3d_ssv"):
            assert k in losses, f"{k} missing: {sorted(losses)}"
            assert np.isfinite(float(losses[k])), k
        assert "loss_pose3d_l1_ssv" in losses  # USE_L1 default False -> check cfg
        # pred2 has candidate flags in last channels
        assert pred2.shape[-1] == 5

    def test_gradients_flow(self, cfg, model_and_vars):
        model, variables = model_and_vars
        b1, _ = make_synthetic_branch(cfg, with_images=False, rot_deg=10.0, seed=4)
        b2, _ = make_synthetic_branch(cfg, with_images=False, rot_deg=-10.0, seed=4)
        b3, _ = make_synthetic_branch(cfg, with_images=False, seed=4)

        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, **rest}, b1, b2, b3,
                train_posenet_stage=True, use_l1_stage=False, train=True,
                method="ssv_losses",
                rngs={"synth": jax.random.PRNGKey(6)},
                mutable=["batch_stats"],
            )
            _, _, _, losses = out
            return sum(jnp.mean(v) for v in losses.values())

        grads = jax.grad(loss_fn)(params)
        gnorm = jnp.sqrt(
            sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads))
        )
        assert np.isfinite(float(gnorm)) and float(gnorm) > 0
        # rootnet v2v must receive gradient via synthetic loss
        rn = grads["root_net"]["v2v_net"]
        rn_norm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(rn)))
        assert float(rn_norm) > 0
        # posenet v2v must receive gradient via ssv projection loss
        pn = grads["pose_net"]["v2v_net"]
        pn_norm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(pn)))
        assert float(pn_norm) > 0


class TestSynthRootDraws:
    def test_per_branch_count_independence(self, cfg):
        """The folded 3B train_synth pass must draw an independent
        num_roots per branch group (ref: cuboid_proposal_net_soft.py:154
        is called once per augmentation branch)."""
        from selfpose3d_tpu.models.root_net import RootNet

        branch, _ = make_synthetic_branch(cfg, batch_size=2, with_images=False)
        net = RootNet(
            space_size=tuple(cfg.MULTI_PERSON.SPACE_SIZE),
            space_center=tuple(cfg.MULTI_PERSON.SPACE_CENTER),
            cube_size=tuple(cfg.MULTI_PERSON.INITIAL_CUBE_SIZE),
            image_wh=tuple(cfg.NETWORK.IMAGE_SIZE),
            max_people=cfg.MULTI_PERSON.MAX_PEOPLE_NUM,
        )
        cat3 = lambda x: jnp.concatenate([x, x, x], axis=0)
        cam3 = jax.tree.map(cat3, branch.cam)
        trans3, wh3 = cat3(branch.trans), cat3(branch.orig_wh)
        hm_wh = tuple(cfg.NETWORK.HEATMAP_SIZE)

        variables = net.init(
            {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(0)},
            cam3, trans3, wh3, hm_wh, groups=3, method="train_synth",
        )
        params = {"params": variables["params"]}

        def counts(seed):
            (_, _), inter = net.apply(
                params, cam3, trans3, wh3, hm_wh, groups=3,
                method="train_synth",
                rngs={"synth": jax.random.PRNGKey(seed)},
                mutable=["intermediates", "batch_stats"],
            )
            (c,) = inter["intermediates"]["synth_num_roots"]
            return np.asarray(c)

        seen = [counts(s) for s in range(6)]
        assert all(c.shape == (3,) for c in seen)
        P = cfg.MULTI_PERSON.MAX_PEOPLE_NUM
        assert all(((c >= 1) & (c < P)).all() for c in seen)
        # independent draws: at least one step has unequal branch counts
        assert any(len(set(c.tolist())) > 1 for c in seen)
