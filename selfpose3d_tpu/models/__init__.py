"""Model registry.

The reference selects models via ``eval(cfg.MODEL + '.get_...')``
(ref: tools/train_3d.py:138); here it's an explicit registry.
"""

from selfpose3d_tpu.models.pose_resnet import PoseResNet, PoseResAttnNet
from selfpose3d_tpu.models.v2v_net import V2VNet
from selfpose3d_tpu.models.root_net import RootNet, SupervisedProposal
from selfpose3d_tpu.models.pose_net import PoseNet
from selfpose3d_tpu.models.multi_person import (
    MultiPersonPoseNet,
    MultiPersonPoseNetSSV,
)

_REGISTRY = {
    "multi_person_posenet": MultiPersonPoseNet,
    "multi_person_posenet_ssv": MultiPersonPoseNetSSV,
}


def get_model(cfg, dtype=None):
    """Build the configured top-level model (cfg.MODEL)."""
    import jax.numpy as jnp

    if cfg.MODEL not in _REGISTRY:
        raise KeyError(
            f"unknown MODEL {cfg.MODEL!r}; available: {sorted(_REGISTRY)}"
        )
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.DTYPE == "bfloat16" else jnp.float32
    return _REGISTRY[cfg.MODEL](cfg=cfg, dtype=dtype)


__all__ = [
    "PoseResNet",
    "PoseResAttnNet",
    "V2VNet",
    "RootNet",
    "SupervisedProposal",
    "PoseNet",
    "MultiPersonPoseNet",
    "MultiPersonPoseNetSSV",
    "get_model",
]
