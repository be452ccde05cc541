"""Model + converter parity tests: flax models must match torch oracles
loaded from the same (randomly initialized) checkpoint weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from selfpose3d_tpu.models import PoseResNet, V2VNet
from selfpose3d_tpu.convert.torch2jax import (
    convert_pose_resnet,
    convert_v2v_net,
    conv_kernel,
    conv_transpose_kernel,
)
from tests.torch_oracles import TorchPoseResNet, TorchV2V


def _randomize(model):
    torch.manual_seed(7)
    for p in model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn_like(p) * 0.05)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.01)
                m.running_var.copy_(1.0 + 0.1 * torch.rand_like(m.running_var))
    return model


class TestLayerMappings:
    def test_conv2d(self, rng):
        w = rng.randn(8, 3, 3, 3).astype(np.float32)
        x = rng.randn(1, 3, 10, 10).astype(np.float32)
        exp = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), padding=1
        ).numpy()
        got = jax.lax.conv_general_dilated(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(conv_kernel(w)),
            (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), exp, rtol=1e-4, atol=1e-5
        )

    def test_conv_transpose3d_k2s2(self, rng):
        from flax import linen as nn

        w = rng.randn(4, 6, 2, 2, 2).astype(np.float32)  # (I, O, k, k, k)
        x = rng.randn(1, 4, 4, 4, 4).astype(np.float32)
        exp = torch.nn.functional.conv_transpose3d(
            torch.from_numpy(x), torch.from_numpy(w), stride=2
        ).numpy()
        mod = nn.ConvTranspose(6, (2, 2, 2), strides=(2, 2, 2), padding="VALID", use_bias=False)
        got = mod.apply(
            {"params": {"kernel": jnp.asarray(conv_transpose_kernel(w))}},
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 4, 1, 2, 3), exp, rtol=1e-4, atol=1e-5
        )


class TestV2VParity:
    def test_forward_matches_torch(self, rng):
        tm = _randomize(TorchV2V(15, 15)).eval()
        variables = convert_v2v_net({k: v for k, v in tm.state_dict().items()})

        jm = V2VNet(out_ch=15)
        x = rng.rand(1, 16, 16, 8, 15).astype(np.float32)

        with torch.no_grad():
            exp = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
        got = jm.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 4, 1, 2, 3), exp, rtol=2e-3, atol=2e-4
        )

    def test_param_count_complete(self):
        tm = TorchV2V(1, 1)
        variables = convert_v2v_net(dict(tm.state_dict()))
        n_torch = sum(p.numel() for p in tm.parameters())
        n_flax = sum(
            np.prod(x.shape) for x in jax.tree.leaves(variables["params"])
        )
        assert n_torch == n_flax

        # converted tree must initialize-compatible with the flax module
        jm = V2VNet(out_ch=1)
        ref = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4, 1)))
        ref_paths = {jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_flatten_with_path(ref["params"])[0]}
        got_paths = {jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
        assert ref_paths == got_paths


class TestPoseResNetParity:
    @pytest.mark.slow
    def test_forward_matches_torch(self, rng):
        tm = _randomize(TorchPoseResNet(num_joints=15)).eval()
        variables = convert_pose_resnet(dict(tm.state_dict()))

        jm = PoseResNet(num_layers=50, num_joints=15)
        x = rng.rand(1, 128, 160, 3).astype(np.float32)

        with torch.no_grad():
            exp = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = jm.apply(variables, jnp.asarray(x), train=False)
        assert got.shape == (1, 32, 40, 15)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), exp, rtol=2e-3, atol=2e-4
        )

    def test_coco_remap(self, rng):
        tm = _randomize(TorchPoseResNet(num_joints=17)).eval()
        mapping = (5, 0, 11, 5, 7, 9, 11, 13, 15, 6, 8, 10, 12, 14, 16)
        variables = convert_pose_resnet(
            dict(tm.state_dict()), coco_to_panoptic=mapping, num_joints=15
        )
        k = variables["params"]["final_layer"]["kernel"]
        assert k.shape[-1] == 15
        k17 = conv_kernel(tm.state_dict()["final_layer.weight"].numpy())
        np.testing.assert_allclose(k[..., 0], k17[..., 5])
        np.testing.assert_allclose(k[..., 1], k17[..., 0])


class TestWidenedConv3D:
    def test_fastconv3d_matches_nn_conv(self, rng):
        """The widened-tap chunked 2D decomposition (FastConv3D) is exact
        vs the native 3D conv for k in {1, 3, 7} incl. non-divisible X."""
        import flax.linen as fnn

        from selfpose3d_tpu.models.v2v_net import FastConv3D, conv_init

        for k, X, Y, ci, co in ((7, 16, 16, 5, 16), (3, 64, 20, 8, 12),
                                (3, 12, 12, 4, 6), (1, 8, 8, 3, 5)):
            x = jnp.asarray(rng.rand(2, X, Y, 8, ci).astype(np.float32))
            fc = FastConv3D(co, k)
            vs = fc.init(jax.random.PRNGKey(1), x)
            ref = fnn.Conv(co, (k,) * 3, padding=(k - 1) // 2,
                           kernel_init=conv_init)
            out_f = fc.apply(vs, x)
            out_r = ref.apply({"params": vs["params"]}, x)
            np.testing.assert_allclose(
                np.asarray(out_f), np.asarray(out_r), atol=1e-4
            )
