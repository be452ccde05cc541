"""Full-pipeline numerical parity: jax do_inference vs a composed torch oracle.

Runs both stacks — heatmaps -> root unprojection -> root V2V -> NMS/top-k
proposals -> per-candidate pose unprojection -> pose V2V -> soft-argmax —
from the SAME converted random V2V weights on a synthetic multi-view scene,
and asserts final 3D poses agree to < 1 mm per joint (the strongest parity
evidence obtainable without the real dataset; the composition mirrors
ref: lib/models/multi_person_posenet_ssv.py:105-153).
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from selfpose3d_tpu.convert.torch2jax import convert_v2v_net
from selfpose3d_tpu.data.synthetic import make_synthetic_branch
from selfpose3d_tpu.models import get_model

from tests.test_multi_person import small_cfg
from tests.torch_oracles import TorchInferencePipeline, TorchV2V


def _randomize(m, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for b in m.buffers():
            if b.dtype.is_floating_point:
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.5)
            else:
                b.zero_()
    return m


def _cams_to_torch(cam):
    """CameraParams (B, V) -> [view][batch] reference-layout torch dicts."""
    B, V = cam.batch_shape
    out = []
    for v in range(V):
        per_batch = []
        for b in range(B):
            per_batch.append(
                {
                    "R": torch.tensor(np.asarray(cam.R[b, v]), dtype=torch.float32),
                    "T": torch.tensor(np.asarray(cam.T[b, v]), dtype=torch.float32),
                    "f": torch.tensor(
                        np.asarray(cam.f[b, v]).reshape(2, 1), dtype=torch.float32
                    ),
                    "c": torch.tensor(
                        np.asarray(cam.c[b, v]).reshape(2, 1), dtype=torch.float32
                    ),
                    "k": torch.tensor(
                        np.asarray(cam.k[b, v]).reshape(3, 1), dtype=torch.float32
                    ),
                    "p": torch.tensor(
                        np.asarray(cam.p[b, v]).reshape(2, 1), dtype=torch.float32
                    ),
                }
            )
        out.append(per_batch)
    return out


@pytest.fixture(scope="module")
def parity_setup():
    cfg = small_cfg(
        MULTI_PERSON={"MAX_PEOPLE_NUM": 4, "THRESHOLD": -100.0},
    )
    branch, _ = make_synthetic_branch(
        cfg, batch_size=2, num_person=3, with_images=False, seed=3
    )
    J = cfg.NETWORK.NUM_JOINTS

    root_t = _randomize(TorchV2V(1, 1), seed=1).eval()
    pose_t = _randomize(TorchV2V(J, J), seed=2).eval()
    with torch.no_grad():
        # lift the root detection volume positive: under random weights most
        # local maxima are negative, so top-k degenerates to exactly-tied
        # NMS-suppressed zeros whose ordering is implementation-defined
        root_t.output_layer.bias.fill_(1.0)

    model = get_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)}, branch
    )
    params = jax.tree.map(lambda x: x, variables["params"])  # shallow copy
    stats = jax.tree.map(lambda x: x, variables.get("batch_stats", {}))
    for name, tm in (("root_net", root_t), ("pose_net", pose_t)):
        conv = convert_v2v_net(dict(tm.state_dict()))
        params[name] = dict(params[name])
        params[name]["v2v_net"] = conv["params"]
        stats[name] = dict(stats[name])
        stats[name]["v2v_net"] = conv["batch_stats"]

    return cfg, branch, model, {"params": params, "batch_stats": stats}, root_t, pose_t


class TestFullPipelineParity:
    def test_do_inference_matches_torch_oracle(self, parity_setup):
        cfg, branch, model, variables, root_t, pose_t = parity_setup

        pred_j, _, gc_j = model.apply(variables, branch, method="do_inference")

        hm = np.asarray(branch.input_heatmaps)  # (B, V, H, W, J)
        heatmaps_t = [
            torch.tensor(hm[:, v].transpose(0, 3, 1, 2), dtype=torch.float32)
            for v in range(hm.shape[1])
        ]
        oracle = TorchInferencePipeline(cfg, root_t, pose_t)
        pred_t, root_cubes_t, gc_t = oracle.do_inference(
            heatmaps_t,
            _cams_to_torch(branch.cam),
            torch.tensor(np.asarray(branch.trans), dtype=torch.float32),
            torch.tensor(np.asarray(branch.orig_wh), dtype=torch.float32),
        )

        # proposals: locations in mm, scores, valid flags
        gc_j = np.asarray(gc_j)
        gc_t = gc_t.numpy()
        np.testing.assert_allclose(gc_j[..., :3], gc_t[..., :3], atol=1e-3)
        np.testing.assert_allclose(gc_j[..., 4], gc_t[..., 4], atol=1e-4)
        np.testing.assert_array_equal(gc_j[..., 3], gc_t[..., 3])

        # final poses: < 1 mm per joint on valid candidates
        pred_j = np.asarray(pred_j)
        pred_t = pred_t.numpy()
        valid = gc_t[..., 3] >= 0
        assert valid.any()
        err = np.linalg.norm(
            pred_j[..., :3] - pred_t[..., :3], axis=-1
        )  # (B, K, J)
        max_err = float(err[valid].max())
        assert max_err < 1.0, f"max per-joint error {max_err:.3f} mm"
        np.testing.assert_allclose(pred_j[..., 3:], pred_t[..., 3:], atol=1e-5)

    def test_rootnet_cubes_match(self, parity_setup):
        """RootNet detection volume parity (pre-NMS)."""
        cfg, branch, model, variables, root_t, pose_t = parity_setup
        rid = cfg.DATASET.ROOTIDX

        def root_cubes_fn(mdl, br):
            hm = mdl._heatmaps(br, train=False)
            return mdl.root_net(
                mdl._root_heatmaps(hm), br.cam, br.trans, br.orig_wh,
                hflip=None, train=False,
            )[0]

        rc_j = np.asarray(model.apply(variables, branch, method=root_cubes_fn))

        hm = np.asarray(branch.input_heatmaps)
        heatmaps_t = [
            torch.tensor(hm[:, v].transpose(0, 3, 1, 2), dtype=torch.float32)
            for v in range(hm.shape[1])
        ]
        oracle = TorchInferencePipeline(cfg, root_t, pose_t)
        root_hms = [h[:, rid : rid + 1] for h in heatmaps_t]
        cubes_t, _ = oracle.project.get_voxel(
            root_hms,
            _cams_to_torch(branch.cam),
            torch.tensor(np.asarray(branch.trans), dtype=torch.float32),
            torch.tensor(np.asarray(branch.orig_wh), dtype=torch.float32),
            cfg.MULTI_PERSON.SPACE_SIZE,
            [cfg.MULTI_PERSON.SPACE_CENTER],
            cfg.MULTI_PERSON.INITIAL_CUBE_SIZE,
        )
        with torch.no_grad():
            rc_t = root_t(cubes_t).squeeze(1).numpy()
        np.testing.assert_allclose(rc_j, rc_t, rtol=1e-3, atol=1e-4)
