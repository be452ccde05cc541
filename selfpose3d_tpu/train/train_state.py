"""Train state: optax Adam + parameter-tree freezing masks.

Replaces the reference's requires_grad surgery (ref: tools/train_3d.py:48-75)
with an optax.masked transform over top-level module names; frozen subtrees
receive zero updates (and keep no optimizer state), exactly mirroring
``filter(lambda p: p.requires_grad, ...)``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from selfpose3d_tpu.config import Config


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def trainable_labels(cfg: Config, params: Dict) -> Dict:
    """Label each top-level module 'train' or 'freeze' per the stage flags
    (ref: tools/train_3d.py:48-75)."""
    with_root_net = not cfg.NETWORK.USE_GT
    decisions = {}
    decisions["backbone"] = bool(cfg.NETWORK.TRAIN_BACKBONE)
    decisions["attn"] = True  # attention net trains whenever present
    decisions["pose_net"] = (
        not cfg.NETWORK.TRAIN_ONLY_2D and not cfg.NETWORK.TRAIN_ONLY_ROOTNET
    )
    decisions["root_net"] = (
        not cfg.NETWORK.TRAIN_ONLY_2D
        and with_root_net
        and not cfg.NETWORK.FREEZE_ROOTNET
    )

    def label(module_name):
        return "train" if decisions.get(module_name, True) else "freeze"

    return {k: jax.tree.map(lambda _: label(k), v) for k, v in params.items()}


def make_optimizer(cfg: Config, params: Dict, steps_per_epoch: int = 1):
    from selfpose3d_tpu.train.schedule import multistep_lr

    lr = multistep_lr(
        cfg.TRAIN.LR, cfg.TRAIN.LR_STEP, cfg.TRAIN.LR_FACTOR, steps_per_epoch
    )
    if cfg.TRAIN.OPTIMIZER == "adam":
        inner = optax.adam(lr)
    elif cfg.TRAIN.OPTIMIZER == "sgd":
        inner = optax.sgd(lr, momentum=cfg.TRAIN.MOMENTUM, nesterov=cfg.TRAIN.NESTEROV)
    else:
        raise ValueError(f"unknown optimizer {cfg.TRAIN.OPTIMIZER}")
    labels = trainable_labels(cfg, params)
    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, labels
    )


def create_train_state(
    cfg: Config, variables: Dict, steps_per_epoch: int = 1
) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict({}))
    tx = make_optimizer(cfg, params, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
