"""Checkpoint stage-surgery + orbax round trip tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from selfpose3d_tpu.config import load_config
from selfpose3d_tpu.data.synthetic import make_synthetic_branch
from selfpose3d_tpu.models import get_model
from selfpose3d_tpu.train import checkpoint as ckpt
from selfpose3d_tpu.train.train_state import create_train_state
from tests.torch_oracles import TorchPoseResNet, TorchV2V
from tests.test_multi_person import small_cfg


class TestStageSurgery:
    def test_load_torch_backbone_and_rootnet(self, tmp_path, rng):
        cfg = small_cfg(POSE_RESNET={"NUM_LAYERS": 50})
        model = get_model(cfg)
        # with images so the backbone submodule exists in the param tree
        branch, _ = make_synthetic_branch(cfg, with_images=True)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
            branch,
        )

        # fabricate a reference-style stage checkpoint: backbone.* + root_net.*
        tb = TorchPoseResNet(num_joints=15)
        tv = TorchV2V(1, 1)
        sd = {}
        for k, v in tb.state_dict().items():
            sd[f"backbone.{k}"] = v
        for k, v in tv.state_dict().items():
            sd[f"root_net.v2v_net.{k}"] = v
        path = tmp_path / "stage.pth.tar"
        torch.save(sd, str(path))

        out = ckpt.load_torch_stage(variables, str(path), "backbone")
        out = ckpt.load_torch_stage(out, str(path), "root_net")

        # backbone conv1 kernel must now equal the converted torch weights
        from selfpose3d_tpu.convert.torch2jax import conv_kernel

        np.testing.assert_allclose(
            np.asarray(out["params"]["backbone"]["conv1"]["kernel"]),
            conv_kernel(tb.state_dict()["conv1.weight"].numpy()),
            rtol=1e-6,
        )
        # rootnet v2v front conv bias transferred
        np.testing.assert_allclose(
            np.asarray(out["params"]["root_net"]["v2v_net"]["front_basic"]["conv"]["bias"]),
            tv.state_dict()["front_layers.0.block.0.bias"].numpy(),
            rtol=1e-6,
        )
        # shapes still init-compatible (model can apply)
        pred, hm, gc = model.apply(out, branch, method="do_inference")
        assert np.all(np.isfinite(np.asarray(pred)))


def _leaves_with_paths(tree, base=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_leaves_with_paths(v, base + (k,)))
        else:
            out[base + (k,)] = np.asarray(v)
    return out


def _assert_subtree_equal(got, want, what=""):
    g, w = _leaves_with_paths(got), _leaves_with_paths(want)
    assert set(g) == set(w), f"{what}: leaf sets differ"
    for p in w:
        np.testing.assert_allclose(g[p], w[p], rtol=1e-6, err_msg=f"{what}:{p}")


class TestReleasedLayouts:
    """Loading the *actual* released checkpoint formats (VERDICT r1 item 3):
    bare COCO pose_resnet_50_*.pth (unprefixed, 17 joints), module.-wrapped
    full models, and strict/zero-key hard errors."""

    @pytest.fixture(scope="class")
    def model_vars(self):
        cfg = small_cfg(
            POSE_RESNET={"NUM_LAYERS": 50}, WITH_ATTN=True, ATTN_NUM_LAYERS=50
        )
        model = get_model(cfg)
        branch, _ = make_synthetic_branch(cfg, with_images=True)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
            branch, branch, branch,
            train_posenet_stage=True, use_l1_stage=True, train=True,
            method="ssv_losses",
        )
        return cfg, variables

    def test_bare_coco_backbone_remap(self, model_vars, tmp_path):
        """pose_resnet_50_384x288.pth layout: unprefixed keys, 17 COCO joints
        (ref: lib/utils/utils.py:118-149 / pose_resnet.py:216-222)."""
        cfg, variables = model_vars
        tb = TorchPoseResNet(num_joints=17)
        path = tmp_path / "pose_resnet_50_384x288.pth"
        torch.save(tb.state_dict(), str(path))

        mapping = tuple(cfg.COCO_TO_PANOPTIC_MAPPING)
        out = ckpt.load_torch_stage(variables, str(path), "backbone",
                                    coco_mapping=mapping)
        from selfpose3d_tpu.convert.torch2jax import conv_kernel

        sd = {k: v.numpy() for k, v in tb.state_dict().items()}
        np.testing.assert_allclose(
            np.asarray(out["params"]["backbone"]["conv1"]["kernel"]),
            conv_kernel(sd["conv1.weight"]), rtol=1e-6,
        )
        # final layer: COCO->Panoptic channel remap, 17 -> 15
        np.testing.assert_allclose(
            np.asarray(out["params"]["backbone"]["final_layer"]["kernel"]),
            conv_kernel(sd["final_layer.weight"][list(mapping)]), rtol=1e-6,
        )
        # BN running stats landed in batch_stats
        np.testing.assert_allclose(
            np.asarray(out["batch_stats"]["backbone"]["bn1"]["mean"]),
            sd["bn1.running_mean"], rtol=1e-6,
        )

    def test_bare_same_joint_count_zeroes_final(self, model_vars, tmp_path):
        """init_weights quirk: equal joint counts -> final layer zeroed
        (ref: pose_resnet.py:219-221)."""
        cfg, variables = model_vars
        tb = TorchPoseResNet(num_joints=15)
        path = tmp_path / "pose_resnet_15.pth"
        torch.save(tb.state_dict(), str(path))
        out = ckpt.load_torch_stage(
            variables, str(path), "backbone",
            coco_mapping=tuple(cfg.COCO_TO_PANOPTIC_MAPPING),
        )
        assert np.all(np.asarray(out["params"]["backbone"]["final_layer"]["kernel"]) == 0)

    def test_pretrained_loads_backbone_and_attn(self, model_vars, tmp_path):
        """NETWORK.PRETRAINED initializes both nets (ref: pose_resnet.py:282,331)."""
        cfg, variables = model_vars
        tb = TorchPoseResNet(num_joints=17)
        path = tmp_path / "coco.pth"
        torch.save({f"module.{k}": v for k, v in tb.state_dict().items()}, str(path))
        out = ckpt.load_torch_stage(
            variables, str(path), "pretrained",
            coco_mapping=tuple(cfg.COCO_TO_PANOPTIC_MAPPING),
        )
        from selfpose3d_tpu.convert.torch2jax import conv_kernel

        w = conv_kernel(tb.state_dict()["conv1.weight"].numpy())
        np.testing.assert_allclose(
            np.asarray(out["params"]["backbone"]["conv1"]["kernel"]), w, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out["params"]["attn"]["backbone"]["conv1"]["kernel"]),
            w, rtol=1e-6)

    def test_full_model_init_all_replaces_every_leaf(self, model_vars, tmp_path):
        """module.-wrapped full-model state dict -> INIT_ALL: every leaf of
        backbone / attn / root_net.v2v / pose_net.v2v replaced
        (ref: tools/train_3d.py:175-180)."""
        cfg, variables = model_vars
        tb = TorchPoseResNet(num_joints=15)
        ta = TorchPoseResNet(num_joints=15)
        tr = TorchV2V(1, 1)
        tp = TorchV2V(15, 15)
        sd = {}
        for k, v in tb.state_dict().items():
            sd[f"module.backbone.{k}"] = v
        for k, v in ta.state_dict().items():
            sd[f"module.attn.backbone.{k}"] = v
        for k, v in tr.state_dict().items():
            sd[f"module.root_net.v2v_net.{k}"] = v
        for k, v in tp.state_dict().items():
            sd[f"module.pose_net.v2v_net.{k}"] = v
        path = tmp_path / "model_best.pth.tar"
        torch.save({"state_dict": sd}, str(path))

        out = ckpt.load_torch_stage(variables, str(path), "all")

        from selfpose3d_tpu.convert import torch2jax as c

        nsd = {k: v.numpy() for k, v in tb.state_dict().items()}
        conv = c.convert_pose_resnet(nsd)
        _assert_subtree_equal(out["params"]["backbone"], conv["params"], "backbone")
        _assert_subtree_equal(
            out["batch_stats"]["backbone"], conv["batch_stats"], "backbone stats")
        convr = c.convert_v2v_net({k: v.numpy() for k, v in tr.state_dict().items()})
        _assert_subtree_equal(
            out["params"]["root_net"]["v2v_net"], convr["params"], "rootnet")
        convp = c.convert_v2v_net({k: v.numpy() for k, v in tp.state_dict().items()})
        _assert_subtree_equal(
            out["params"]["pose_net"]["v2v_net"], convp["params"], "posenet")
        conva = c.convert_pose_resnet({k: v.numpy() for k, v in ta.state_dict().items()})
        _assert_subtree_equal(
            out["params"]["attn"]["backbone"], conva["params"], "attn")

    def test_zero_keys_hard_error(self, model_vars, tmp_path):
        cfg, variables = model_vars
        path = tmp_path / "garbage.pth.tar"
        torch.save({"unrelated.weight": torch.zeros(3)}, str(path))
        with pytest.raises(ckpt.CheckpointKeyError):
            ckpt.load_torch_stage(variables, str(path), "backbone")
        with pytest.raises(ckpt.CheckpointKeyError):
            ckpt.load_torch_stage(variables, str(path), "root_net")
        with pytest.raises(ckpt.CheckpointKeyError):
            ckpt.load_torch_stage(variables, str(path), "all")

    def test_partial_backbone_hard_error(self, model_vars, tmp_path):
        """Strict load: a prefixed stage file missing keys must abort
        (ref strict=True at tools/train_3d.py:158)."""
        cfg, variables = model_vars
        tb = TorchPoseResNet(num_joints=15)
        sd = {f"backbone.{k}": v for k, v in tb.state_dict().items()}
        sd.pop("backbone.layer3.2.conv1.weight")
        path = tmp_path / "partial.pth.tar"
        torch.save(sd, str(path))
        with pytest.raises(ckpt.CheckpointKeyError):
            ckpt.load_torch_stage(variables, str(path), "backbone")

    def test_missing_file_hard_error(self, model_vars):
        cfg, variables = model_vars
        with pytest.raises(FileNotFoundError):
            ckpt.load_torch_stage(variables, "/nonexistent/file.pth", "backbone")


class TestOrbaxRoundTrip:
    def test_save_load(self, tmp_path):
        cfg = small_cfg()
        model = get_model(cfg)
        branch, _ = make_synthetic_branch(cfg, with_images=False)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
            branch,
        )
        state = create_train_state(cfg, variables)
        ckpt.save_checkpoint(str(tmp_path), state, epoch=3, precision=0.5, is_best=True)

        state2 = create_train_state(cfg, jax.tree.map(jnp.zeros_like, variables))
        restored, epoch, prec = ckpt.load_checkpoint(str(tmp_path), state2)
        assert epoch == 3 and prec == pytest.approx(0.5)
        assert ckpt.best_checkpoint_epoch(str(tmp_path)) == 3
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_resume_trains_identically(self, tmp_path):
        """The full resume contract (ref: tools/train_3d.py resume path):
        after one REAL train step, save -> restore into a zeroed state
        recovers EVERY leaf (params, batch_stats, opt_state, step)
        bitwise, and the next step from the restored state produces
        identical losses to continuing uninterrupted."""
        from selfpose3d_tpu.train.step import make_ssv_train_step

        cfg = small_cfg(WITH_SSV=True, MODEL="multi_person_posenet_ssv")
        model = get_model(cfg)

        def mk(rot, seed):
            b, _ = make_synthetic_branch(cfg, with_images=False,
                                         rot_deg=rot, seed=seed)
            return b

        b1, b2, b3 = mk(10.0, 3), mk(-8.0, 3), mk(0.0, 3)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
            b1, b2, b3, train_posenet_stage=True, use_l1_stage=True,
            train=True, method="ssv_losses",
        )
        step = make_ssv_train_step(model, train_posenet_stage=True,
                                   use_l1_stage=True)
        rng = jax.random.PRNGKey(7)

        def fresh_state():
            vs = jax.tree.map(lambda x: jnp.array(np.asarray(x)), variables)
            return create_train_state(cfg, vs)

        state, _ = step(fresh_state(), b1, b2, b3, rng)
        ckpt.save_checkpoint(str(tmp_path), state, epoch=1, precision=0.1, is_best=False)
        # continue uninterrupted
        cont, m_cont = step(state, b1, b2, b3, rng)

        zero = create_train_state(
            cfg, jax.tree.map(jnp.zeros_like, variables)
        )
        restored, epoch, _ = ckpt.load_checkpoint(str(tmp_path), zero)
        assert epoch == 1
        # ... but `state` was donated by the continuing step; re-make it
        # to compare leaves against the restored copy
        state2, _ = step(fresh_state(), b1, b2, b3, rng)
        for a, b in zip(
            jax.tree.leaves(
                {"p": state2.params, "bs": state2.batch_stats,
                 "o": state2.opt_state, "s": state2.step}
            ),
            jax.tree.leaves(
                {"p": restored.params, "bs": restored.batch_stats,
                 "o": restored.opt_state, "s": restored.step}
            ),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        resumed, m_res = step(restored, b1, b2, b3, rng)
        for k in m_cont:
            assert float(m_cont[k]) == pytest.approx(
                float(m_res[k]), rel=1e-6, abs=1e-7
            ), k
