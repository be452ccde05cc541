"""Identical-hardware comparison: the composed torch reference pipeline vs
the jax stack, both on this host's single CPU core, at reduced (but
identical) shapes. Evidence for BASELINE_DERIVATION.md."""
import time
import numpy as np
import torch

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import sys
sys.path.insert(0, "tests")
from torch_oracles import TorchInferencePipeline, TorchV2V, TorchPoseResNet

from selfpose3d_tpu.config import load_config
from selfpose3d_tpu.data.synthetic import make_synthetic_branch
from selfpose3d_tpu.models import get_model
sys.path.insert(0, ".")
from tests.test_full_parity import _cams_to_torch, _randomize

# reduced flagship: quarter-res images, 1/2 voxel grids, K=4 — same for both
cfg = load_config(overrides={
    "MODEL": "multi_person_posenet_ssv", "WITH_SSV": True, "DTYPE": "float32",
    "NETWORK": {"NUM_JOINTS": 15, "IMAGE_SIZE": [480, 256], "HEATMAP_SIZE": [120, 64],
                "IMAGE_SIZE_ORIG": [1920, 1080], "SIGMA": 3,
                "ROOTNET_ROOTHM": True, "ROOTNET_TRAIN_SYNTH": True, "SAMPLING": "gather"},
    "POSE_RESNET": {"NUM_LAYERS": 50},
    "MULTI_PERSON": {"SPACE_SIZE": [8000.0, 8000.0, 2000.0],
                     "SPACE_CENTER": [0.0, -500.0, 800.0],
                     "INITIAL_CUBE_SIZE": [40, 40, 12],
                     "MAX_PEOPLE_NUM": 4, "THRESHOLD": -100.0},
    "PICT_STRUCT": {"CUBE_SIZE": [32, 32, 32]},
    "DATASET": {"ROOTIDX": 2, "CAMERA_NUM": 5},
})
branch, _ = make_synthetic_branch(cfg, batch_size=1, num_person=3, with_images=True, seed=3)

J = cfg.NETWORK.NUM_JOINTS
torch.set_num_threads(1)
root_t = _randomize(TorchV2V(1, 1), seed=1).eval()
pose_t = _randomize(TorchV2V(J, J), seed=2).eval()
with torch.no_grad():
    root_t.output_layer.bias.fill_(1.0)
backbone_t = TorchPoseResNet(num_joints=J).eval()
oracle = TorchInferencePipeline(cfg, root_t, pose_t)

views_t = torch.tensor(np.asarray(branch.views).transpose(0, 1, 4, 2, 3))
cams_t = _cams_to_torch(branch.cam)
trans_t = torch.tensor(np.asarray(branch.trans), dtype=torch.float32)
wh_t = torch.tensor(np.asarray(branch.orig_wh), dtype=torch.float32)

def torch_infer():
    with torch.no_grad():
        hms = [backbone_t(views_t[:, v]) for v in range(views_t.shape[1])]
        return oracle.do_inference(hms, cams_t, trans_t, wh_t)

t0 = time.perf_counter(); torch_infer(); t_first = time.perf_counter() - t0
n = 3
t0 = time.perf_counter()
for _ in range(n):
    torch_infer()
t_torch = (time.perf_counter() - t0) / n

model = get_model(cfg)
variables = model.init({"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)}, branch)
fn = jax.jit(lambda v, b: model.apply(v, b, method="do_inference"))
out = fn(variables, branch); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(n):
    out = fn(variables, branch)
jax.block_until_ready(out)
t_jax = (time.perf_counter() - t0) / n

print({"torch_cpu_s_per_frame": round(t_torch, 3),
       "jax_cpu_s_per_frame": round(t_jax, 3),
       "speedup_same_hw": round(t_torch / t_jax, 2)})
