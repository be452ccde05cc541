"""Sharded validation: validate_3d over an 8-virtual-device mesh must
produce identical metrics to the unsharded path (VERDICT r2 #9 — per-epoch
eval scales with chips; ref role: lib/core/function.py:352-490)."""

import numpy as np
import jax

from selfpose3d_tpu.config import load_config
from selfpose3d_tpu.data.synthetic_dataset import SyntheticSceneDataset
from selfpose3d_tpu.models import get_model
from selfpose3d_tpu.parallel.mesh import make_mesh
from selfpose3d_tpu.train.loop import validate_3d
from selfpose3d_tpu.train.train_state import create_train_state


def test_sharded_eval_matches_unsharded(tmp_path):
    cfg = load_config(overrides={
        "MODEL": "multi_person_posenet_ssv",
        "WITH_SSV": True,
        "DTYPE": "float32",
        "NETWORK": {"NUM_JOINTS": 15, "IMAGE_SIZE": [128, 64],
                    "HEATMAP_SIZE": [32, 16], "IMAGE_SIZE_ORIG": [1920, 1080],
                    "SIGMA": 2, "ROOTNET_ROOTHM": True,
                    "TRAIN_BACKBONE": True},
        "POSE_RESNET": {"NUM_LAYERS": 18},
        "TEST": {"BATCH_SIZE": 1},
        "MULTI_PERSON": {"SPACE_SIZE": [8000.0, 8000.0, 2000.0],
                         "SPACE_CENTER": [0.0, -500.0, 800.0],
                         "INITIAL_CUBE_SIZE": [16, 16, 8],
                         "MAX_PEOPLE_NUM": 5, "THRESHOLD": -100.0},
        "PICT_STRUCT": {"CUBE_SIZE": [16, 16, 16]},
        "DATASET": {"TRAIN_DATASET": "synthetic", "TEST_DATASET": "synthetic",
                    "ROOTIDX": 2, "CAMERA_NUM": 2},
        "WORKERS": 1,
    })
    model = get_model(cfg)
    # 6 frames: not divisible by 8 devices x batch 1 -> exercises padding
    ds = SyntheticSceneDataset(cfg, "validation", False, num_frames=6)

    from selfpose3d_tpu.data.synthetic import make_synthetic_branch

    branch, _ = make_synthetic_branch(cfg, batch_size=1, with_images=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "synth": jax.random.PRNGKey(1)},
        branch,
    )
    state = create_train_state(cfg, variables)

    p_unsharded = validate_3d(cfg, model, state, ds, load_images=True)
    mesh = make_mesh(8)
    p_sharded = validate_3d(cfg, model, state, ds, load_images=True, mesh=mesh)

    assert p_unsharded is not None and p_sharded is not None
    np.testing.assert_allclose(p_sharded, p_unsharded, atol=1e-6)
