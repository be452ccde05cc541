"""SSV training-objective parity: the jax ssv_losses graph vs a composed
torch oracle of the reference's loss code, from identical converted V2V
weights and identical (injected) synthetic-root draws.

Covers five of the six SSV terms on the dual-aug no-attn path:
  loss_2d, loss_root_syn, loss_root_reg, loss_pose3d_ssv, loss_pose3d_l1_ssv
(ref: lib/models/multi_person_posenet_ssv.py:197-501, :155-194;
 lib/models/cuboid_proposal_net_soft.py:152-241).
The sixth term, loss_attn_ssv, is (mse(attns1,1)+mse(attns2,1))*w — a
two-line identity over the attention maps with no geometric content; its
fold algebra is pinned in tests/test_fold_parity.py.

BN runs in running-average mode on both sides (ssv_losses(bn_eval=True) /
torch .eval()): train-mode statistics pooling over the 3B fold is the one
documented numerics deviation (ARCHITECTURE.md), and letting it through
would mask loss-composition errors this test exists to catch.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from selfpose3d_tpu.convert.torch2jax import convert_v2v_net
from selfpose3d_tpu.data.synthetic import make_synthetic_branch
from selfpose3d_tpu.models import get_model

from tests.test_full_parity import _cams_to_torch, _randomize
from tests.test_multi_person import small_cfg
from tests.torch_oracles import TorchSSVLossPipeline, TorchV2V


@pytest.fixture(scope="module")
def loss_parity_setup():
    cfg = small_cfg(
        BACKBONE_MODEL="",  # input_heatmaps path: backbone parity is
        # covered by test_models/test_full_parity; this test targets the
        # loss composition
        USE_L1=True,
        L1_ATTN=True,
        MULTI_PERSON={"MAX_PEOPLE_NUM": 4, "THRESHOLD": -100.0},
    )
    J = cfg.NETWORK.NUM_JOINTS
    B = 2

    # three branches: same scene/cameras, different augmentation transforms
    b1, _ = make_synthetic_branch(cfg, batch_size=B, num_person=3,
                                  with_images=False, rot_deg=15.0, seed=7)
    b2, _ = make_synthetic_branch(cfg, batch_size=B, num_person=3,
                                  with_images=False, rot_deg=-12.0, seed=7)
    b3, _ = make_synthetic_branch(cfg, batch_size=B, num_person=3,
                                  with_images=False, seed=7)

    root_t = _randomize(TorchV2V(1, 1), seed=1).eval()
    pose_t = _randomize(TorchV2V(J, J), seed=2).eval()
    with torch.no_grad():
        root_t.output_layer.bias.fill_(1.0)  # lift maxima clear of NMS ties

    model = get_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)}, b3
    )
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    for name, tm in (("root_net", root_t), ("pose_net", pose_t)):
        conv = convert_v2v_net(dict(tm.state_dict()))
        params[name] = dict(params[name])
        params[name]["v2v_net"] = conv["params"]
        stats[name] = dict(stats[name])
        stats[name]["v2v_net"] = conv["batch_stats"]

    # injected synthetic-root draws: one count per branch, roots in the
    # capture space, heatmap noise — identical values feed both stacks
    P = cfg.MULTI_PERSON.MAX_PEOPLE_NUM
    V = b1.cam.batch_shape[1]
    Hh, Wh = b1.input_heatmaps.shape[2], b1.input_heatmaps.shape[3]
    rs = np.random.RandomState(11)
    counts = rs.randint(1, P, size=(3,))
    ss, sc = cfg.MULTI_PERSON.SPACE_SIZE, cfg.MULTI_PERSON.SPACE_CENTER
    lo = np.array([sc[d] - ss[d] / 4 for d in range(3)])
    hi = np.array([sc[d] + ss[d] / 4 for d in range(3)])
    roots = rs.uniform(lo, hi, size=(3 * B, P, 3)).astype(np.float32)
    noise = (0.02 * rs.randn(3 * B, V, 1, Hh, Wh)).astype(np.float32)
    inject = {"roots": roots, "counts": counts, "noise": noise}

    return (cfg, (b1, b2, b3), model,
            {"params": params, "batch_stats": stats},
            root_t, pose_t, inject)


class TestSSVLossParity:
    def test_five_terms_match_torch_oracle(self, loss_parity_setup):
        cfg, (b1, b2, b3), model, variables, root_t, pose_t, inject = (
            loss_parity_setup
        )
        B = b1.batch_size

        _, _, gc_j, losses_j = model.apply(
            variables, b1, b2, b3,
            train_posenet_stage=True, use_l1_stage=True, train=True,
            bn_eval=True, synth_inject=inject,
            method="ssv_losses",
        )

        def hm_list(br):
            hm = np.asarray(br.input_heatmaps)  # (B, V, H, W, J)
            return [
                torch.tensor(hm[:, v].transpose(0, 3, 1, 2),
                             dtype=torch.float32)
                for v in range(hm.shape[1])
            ]

        def t2d(br):
            return torch.tensor(
                np.asarray(br.target_2d).transpose(0, 1, 4, 2, 3),
                dtype=torch.float32,
            )

        cams = _cams_to_torch(b1.cam)
        tr = lambda br: torch.tensor(np.asarray(br.trans), dtype=torch.float32)
        jt = lambda br: torch.tensor(np.asarray(br.joints), dtype=torch.float32)
        jv = lambda br: torch.tensor(np.asarray(br.joints_vis), dtype=torch.float32)

        synth_t = {
            "roots": torch.tensor(
                inject["roots"].reshape(3, B, *inject["roots"].shape[1:])
            ),
            "counts": inject["counts"],
            "noise": torch.tensor(
                inject["noise"].reshape(3, B, -1,
                                        *inject["noise"].shape[-2:])
            ),
        }

        oracle = TorchSSVLossPipeline(cfg, root_t, pose_t)
        with torch.no_grad():
            losses_t, gc_t = oracle.losses(
                hm_list(b1), hm_list(b2), hm_list(b3),
                t2d(b1), t2d(b2), t2d(b3),
                cams, tr(b1), tr(b2), tr(b3),
                torch.tensor(np.asarray(b1.orig_wh), dtype=torch.float32),
                jt(b1), jv(b1), jt(b2), jv(b2),
                synth_t,
            )

        # same proposals drive both posenet passes
        np.testing.assert_allclose(
            np.asarray(gc_j)[..., :3], gc_t[..., :3].numpy(), atol=1e-3
        )
        np.testing.assert_array_equal(
            np.asarray(gc_j)[..., 3], gc_t[..., 3].numpy()
        )

        for term in ("loss_2d", "loss_root_syn", "loss_root_reg",
                     "loss_pose3d_ssv", "loss_pose3d_l1_ssv"):
            got = float(losses_j[term])
            exp = float(losses_t[term])
            assert got == pytest.approx(exp, rel=1e-4, abs=1e-7), (
                f"{term}: jax {got:.8f} vs torch {exp:.8f}"
            )

    def test_attention_path_matches_torch_oracle(self, loss_parity_setup):
        """The flagship WITH_ATTN composition: attention-WEIGHTED
        loss_pose3d_ssv + loss_attn_ssv vs the torch oracle, with identical
        fixed attention maps injected on both sides
        (ref: multi_person_posenet_ssv.py:469-483). Together with
        test_five_terms_match_torch_oracle this pins 6/6 terms on the
        flagship loss configuration."""
        import dataclasses

        cfg, (b1, b2, b3), _, variables, root_t, pose_t, inject = (
            loss_parity_setup
        )
        cfg_attn = dataclasses.replace(cfg, WITH_ATTN=True)
        model = get_model(cfg_attn)
        B = b1.batch_size
        V = b1.cam.batch_shape[1]
        J = cfg.NETWORK.NUM_JOINTS
        Hh, Wh = b1.input_heatmaps.shape[2], b1.input_heatmaps.shape[3]

        rs = np.random.RandomState(23)
        attns = rs.uniform(0.05, 1.0, size=(2 * B, V, Hh, Wh, J)).astype(
            np.float32
        )

        _, _, gc_j, losses_j = model.apply(
            variables, b1, b2, b3,
            train_posenet_stage=True, use_l1_stage=True, train=True,
            bn_eval=True, synth_inject=inject,
            attn_inject=jnp.asarray(attns),
            method="ssv_losses",
        )

        def hm_list(br):
            hm = np.asarray(br.input_heatmaps)
            return [
                torch.tensor(hm[:, v].transpose(0, 3, 1, 2),
                             dtype=torch.float32)
                for v in range(hm.shape[1])
            ]

        def t2d(br):
            return torch.tensor(
                np.asarray(br.target_2d).transpose(0, 1, 4, 2, 3),
                dtype=torch.float32,
            )

        cams = _cams_to_torch(b1.cam)
        tr = lambda br: torch.tensor(np.asarray(br.trans), dtype=torch.float32)
        jt = lambda br: torch.tensor(np.asarray(br.joints), dtype=torch.float32)
        jv = lambda br: torch.tensor(np.asarray(br.joints_vis), dtype=torch.float32)
        synth_t = {
            "roots": torch.tensor(
                inject["roots"].reshape(3, B, *inject["roots"].shape[1:])
            ),
            "counts": inject["counts"],
            "noise": torch.tensor(
                inject["noise"].reshape(3, B, -1, *inject["noise"].shape[-2:])
            ),
        }
        # jax layout (2B, V, H, W, J) -> per-branch torch (B, V, J, H, W)
        a_t = attns.transpose(0, 1, 4, 2, 3)
        attns_t = (
            torch.tensor(a_t[:B]), torch.tensor(a_t[B:])
        )

        oracle = TorchSSVLossPipeline(cfg_attn, root_t, pose_t)
        with torch.no_grad():
            losses_t, gc_t = oracle.losses(
                hm_list(b1), hm_list(b2), hm_list(b3),
                t2d(b1), t2d(b2), t2d(b3),
                cams, tr(b1), tr(b2), tr(b3),
                torch.tensor(np.asarray(b1.orig_wh), dtype=torch.float32),
                jt(b1), jv(b1), jt(b2), jv(b2),
                synth_t, attns=attns_t,
            )

        np.testing.assert_array_equal(
            np.asarray(gc_j)[..., 3], gc_t[..., 3].numpy()
        )
        for term in ("loss_2d", "loss_root_syn", "loss_root_reg",
                     "loss_pose3d_ssv", "loss_attn_ssv",
                     "loss_pose3d_l1_ssv"):
            got = float(losses_j[term])
            exp = float(losses_t[term])
            assert got == pytest.approx(exp, rel=1e-4, abs=1e-7), (
                f"{term}: jax {got:.8f} vs torch {exp:.8f}"
            )
