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
