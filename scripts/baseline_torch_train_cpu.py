"""Identical-hardware TRAIN-step comparison: the composed torch reference
SSV training step (3-branch ResNet-50 backbone -> 6-term SSV losses ->
backward -> Adam) vs this repo's jitted jax train step, both on ONE CPU
core at reduced (identical) shapes. Evidence for the train-throughput
denominator in BASELINE_DERIVATION.md ("Training baseline").

Both sides run WITHOUT the attention net (the oracle composes it only as
fixed injected maps) and with the gather sampler (CPU). The torch side
composes tests/torch_oracles.py — the same modules/loop structure as the
reference (ref: lib/models/multi_person_posenet_ssv.py:197-501,
lib/core/function.py:27-151), parity-validated to <=1e-4 on every loss
term (tests/test_ssv_loss_parity.py).
"""
import sys
import time

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from torch_oracles import TorchPoseResNet, TorchSSVLossPipeline, TorchV2V

from selfpose3d_tpu.config import load_config
from selfpose3d_tpu.data.synthetic import make_synthetic_branch
from selfpose3d_tpu.models import get_model
from tests.test_full_parity import _cams_to_torch, _randomize
from tests.test_multi_person import small_cfg  # noqa: F401 (fixture helpers)

B = 1
STEPS = 3

cfg = load_config(overrides={
    "MODEL": "multi_person_posenet_ssv", "WITH_SSV": True, "DTYPE": "float32",
    "WITH_ATTN": False, "USE_L1": True, "L1_WEIGHT": 0.01,
    "NETWORK": {"NUM_JOINTS": 15, "IMAGE_SIZE": [480, 256],
                "HEATMAP_SIZE": [120, 64], "IMAGE_SIZE_ORIG": [1920, 1080],
                "SIGMA": 3, "ROOTNET_ROOTHM": True, "ROOTNET_TRAIN_SYNTH": True,
                "SAMPLING": "gather", "TRAIN_BACKBONE": True},
    "POSE_RESNET": {"NUM_LAYERS": 50},
    "MULTI_PERSON": {"SPACE_SIZE": [8000.0, 8000.0, 2000.0],
                     "SPACE_CENTER": [0.0, -500.0, 800.0],
                     "INITIAL_CUBE_SIZE": [40, 40, 12],
                     "MAX_PEOPLE_NUM": 4, "THRESHOLD": -100.0},
    "PICT_STRUCT": {"CUBE_SIZE": [32, 32, 32]},
    "DATASET": {"ROOTIDX": 2, "CAMERA_NUM": 5},
    "TRAIN": {"BATCH_SIZE": B},
})


def branches():
    b1, _ = make_synthetic_branch(cfg, batch_size=B, num_person=3,
                                  with_images=True, rot_deg=15.0, seed=7)
    b2, _ = make_synthetic_branch(cfg, batch_size=B, num_person=3,
                                  with_images=True, rot_deg=-12.0, seed=7)
    b3, _ = make_synthetic_branch(cfg, batch_size=B, num_person=3,
                                  with_images=True, seed=7)
    return b1, b2, b3


def synth_inject(b1):
    P = cfg.MULTI_PERSON.MAX_PEOPLE_NUM
    V = b1.cam.batch_shape[1]
    Wh, Hh = cfg.NETWORK.HEATMAP_SIZE  # (W, H); branches carry images here
    rs = np.random.RandomState(11)
    counts = rs.randint(1, P, size=(3,))
    ss, sc = cfg.MULTI_PERSON.SPACE_SIZE, cfg.MULTI_PERSON.SPACE_CENTER
    lo = np.array([sc[d] - ss[d] / 4 for d in range(3)])
    hi = np.array([sc[d] + ss[d] / 4 for d in range(3)])
    roots = rs.uniform(lo, hi, size=(3 * B, P, 3)).astype(np.float32)
    noise = (0.02 * rs.randn(3 * B, V, 1, Hh, Wh)).astype(np.float32)
    return {"roots": roots, "counts": counts, "noise": noise}


def torch_train_s_per_step(b1, b2, b3, inject):
    torch.set_num_threads(1)
    backbone = _randomize(TorchPoseResNet(cfg.NETWORK.NUM_JOINTS), seed=0)
    root_t = _randomize(TorchV2V(1, 1), seed=1)
    pose_t = _randomize(TorchV2V(cfg.NETWORK.NUM_JOINTS,
                                 cfg.NETWORK.NUM_JOINTS), seed=2)
    with torch.no_grad():
        root_t.output_layer.bias.fill_(1.0)
    oracle = TorchSSVLossPipeline(cfg, root_t, pose_t)
    params = (list(backbone.parameters()) + list(root_t.parameters())
              + list(pose_t.parameters()))
    opt = torch.optim.Adam(params, lr=1e-4)

    def im(br):
        # (B, V, H, W, 3) float -> per-view NCHW image batches
        v = torch.tensor(np.asarray(br.views), dtype=torch.float32)
        return [v[:, i].permute(0, 3, 1, 2) for i in range(v.shape[1])]

    def t2d(br):
        return torch.tensor(
            np.asarray(br.target_2d).transpose(0, 1, 4, 2, 3),
            dtype=torch.float32)

    cams = _cams_to_torch(b1.cam)
    tr = lambda br: torch.tensor(np.asarray(br.trans), dtype=torch.float32)
    jt = lambda br: torch.tensor(np.asarray(br.joints), dtype=torch.float32)
    jv = lambda br: torch.tensor(np.asarray(br.joints_vis), dtype=torch.float32)
    synth_t = {
        "roots": torch.tensor(
            inject["roots"].reshape(3, B, *inject["roots"].shape[1:])),
        "counts": inject["counts"],
        "noise": torch.tensor(
            inject["noise"].reshape(3, B, -1, *inject["noise"].shape[-2:])),
    }
    ims = [im(b) for b in (b1, b2, b3)]
    t2ds = [t2d(b) for b in (b1, b2, b3)]
    orig = torch.tensor(np.asarray(b1.orig_wh), dtype=torch.float32)

    def step():
        opt.zero_grad()
        hms = [[backbone(x) for x in views] for views in ims]
        losses, _ = oracle.losses(
            hms[0], hms[1], hms[2], t2ds[0], t2ds[1], t2ds[2],
            cams, tr(b1), tr(b2), tr(b3), orig,
            jt(b1), jv(b1), jt(b2), jv(b2), synth_t,
        )
        total = (losses["loss_2d"] + losses["loss_root_syn"]
                 + losses["loss_root_reg"] + losses["loss_pose3d_ssv"]
                 + cfg.L1_WEIGHT * losses["loss_pose3d_l1_ssv"])
        total.backward()
        opt.step()
        return float(total)

    step()  # warm caches
    t0 = time.perf_counter()
    for _ in range(STEPS):
        v = step()
    dt = (time.perf_counter() - t0) / STEPS
    print(f"torch train step: {dt:.2f} s/step (loss {v:.3f})", flush=True)
    return dt


def jax_train_s_per_step(b1, b2, b3, inject):
    from selfpose3d_tpu.train.step import make_ssv_train_step
    from selfpose3d_tpu.train.train_state import create_train_state

    model = get_model(cfg)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
        b1, b2, b3, train_posenet_stage=True, use_l1_stage=True, train=True,
        method="ssv_losses")
    state = create_train_state(cfg, vs)
    step = make_ssv_train_step(model, train_posenet_stage=True,
                               use_l1_stage=True)
    rng = jax.random.PRNGKey(7)
    state, m = step(state, b1, b2, b3, rng)  # compile + 1st step
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, b1, b2, b3, rng)
        jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"jax train step:   {dt:.2f} s/step (loss {float(m['loss']):.3f})",
          flush=True)
    return dt


def main():
    b1, b2, b3 = branches()
    inject = synth_inject(b1)
    tt = torch_train_s_per_step(b1, b2, b3, inject)
    tj = jax_train_s_per_step(b1, b2, b3, inject)
    print(f"ratio jax/torch on identical CPU: {tj / tt:.2f}x")


if __name__ == "__main__":
    main()
