"""Batch structures crossing the host->device boundary.

The reference moves per-view python dicts and 18-slot tuples through the
DataLoader (ref: lib/dataset/JointsDatasetSSV.py:615-640,
lib/core/function.py:50-69). Here each augmentation branch is one fixed-shape
pytree of arrays — jit/shard-friendly, with explicit masks replacing ragged
person counts.

Array layout conventions (TPU-first):
  images      (B, V, H, W, 3)    NHWC, views as an axis
  heatmaps    (B, V, Hh, Wh, J)  channel-minor
  joints      (B, V, P, J, 2)    padded to MAX_PEOPLE_NUM
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from selfpose3d_tpu.geometry.cameras import CameraParams


@struct.dataclass
class AugBranch:
    """One augmentation branch of a multi-view sample batch.

    Mirrors the reference's (inputs, targets_2d, weights_2d, targets_3d,
    meta, input_heatmap) slots for one aug (ref: function.py:50-69), with
    meta dict fields flattened to arrays.
    """

    cam: CameraParams                      # batched (B, V)
    trans: jnp.ndarray                     # (B, V, 3, 3) orig-image -> input
    orig_wh: jnp.ndarray                   # (B, V, 2) original (width, height)
    hflip: jnp.ndarray                     # (B,) bool/float
    views: Optional[jnp.ndarray] = None    # (B, V, H, W, 3) or None
    input_heatmaps: Optional[jnp.ndarray] = None  # (B, V, Hh, Wh, J)
    target_2d: Optional[jnp.ndarray] = None       # (B, V, Hh, Wh, J)
    weights_2d: Optional[jnp.ndarray] = None      # (B, V, J, 1)
    target_3d: Optional[jnp.ndarray] = None       # (B, X, Y, Z)
    joints: Optional[jnp.ndarray] = None          # (B, V, P, J, 2) pseudo 2D
    joints_vis: Optional[jnp.ndarray] = None      # (B, V, P, J, 2)
    joints_3d: Optional[jnp.ndarray] = None       # (B, P, J, 3) GT (supervised)
    joints_3d_vis: Optional[jnp.ndarray] = None   # (B, P, J, 3)
    roots_3d: Optional[jnp.ndarray] = None        # (B, P, 3)
    num_person: Optional[jnp.ndarray] = None      # (B,)

    @property
    def batch_size(self):
        return self.trans.shape[0]

    @property
    def num_views(self):
        return self.trans.shape[1]
