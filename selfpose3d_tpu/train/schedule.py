"""LR schedule: MultiStepLR equivalent (ref: tools/train_3d.py:194-196)."""

from __future__ import annotations

from typing import Sequence

import optax


def multistep_lr(
    base_lr: float,
    lr_steps: Sequence[int],
    lr_factor: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    """Piecewise-constant decay at epoch boundaries, expressed per step."""
    boundaries = {int(e) * steps_per_epoch: lr_factor for e in lr_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)
