"""Checkpointing: orbax save/load + staged weight surgery.

Replaces save_checkpoint/load_checkpoint (ref: lib/utils/utils.py:91-149) and
the staged loading in tools/train_3d.py:150-185:
  * checkpoint.orbax        — {step, params, batch_stats, opt_state, precision}
  * per-epoch + best copies — model_epoch_N / model_best
  * stage surgery           — load only backbone / root_net / full trees from
                              a previous stage's checkpoint or a converted
                              torch state dict.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(output_dir: str) -> str:
    return os.path.abspath(os.path.join(output_dir, "checkpoints"))


def save_checkpoint(
    output_dir: str,
    state,
    epoch: int,
    precision: float,
    is_best: bool,
) -> None:
    """Write epoch checkpoint (+ 'best' copy) — ref: utils.py:109-115."""
    path = _ckpt_dir(output_dir)
    mngr = ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=None)
    )
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "meta": {
            "epoch": np.asarray(epoch, np.int32),
            "step": np.asarray(state.step),
            "precision": np.asarray(precision, np.float32),
        },
    }
    mngr.save(epoch, args=ocp.args.StandardSave(payload))
    mngr.wait_until_finished()
    if is_best:
        best = os.path.join(path, "best_epoch.txt")
        with open(best, "w") as f:
            f.write(str(epoch))


def latest_checkpoint_epoch(output_dir: str) -> Optional[int]:
    path = _ckpt_dir(output_dir)
    if not os.path.isdir(path):
        return None
    mngr = ocp.CheckpointManager(path)
    return mngr.latest_step()


def load_checkpoint(output_dir: str, state, epoch: Optional[int] = None):
    """Restore a TrainState (ref: utils.py:91-107). Returns (state, epoch,
    precision)."""
    path = _ckpt_dir(output_dir)
    mngr = ocp.CheckpointManager(path)
    if epoch is None:
        epoch = mngr.latest_step()
    if epoch is None:
        return state, 0, 0.0
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "meta": {
            "epoch": np.asarray(0, np.int32),
            "step": np.asarray(state.step),
            "precision": np.asarray(0.0, np.float32),
        },
    }
    restored = mngr.restore(epoch, args=ocp.args.StandardRestore(template))
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(restored["meta"]["step"]),
    )
    return state, int(restored["meta"]["epoch"]), float(restored["meta"]["precision"])


def best_checkpoint_epoch(output_dir: str) -> Optional[int]:
    best = os.path.join(_ckpt_dir(output_dir), "best_epoch.txt")
    if os.path.exists(best):
        return int(open(best).read().strip())
    return None


# ----------------------------------------------------------- stage surgery
def graft_subtree(params: Dict, sub_params: Dict, key: str) -> Dict:
    """Replace params[key] with sub_params (stage handoff, strict shapes).

    Mirrors the prefix-filtered partial loads (ref: tools/train_3d.py:150-180).
    """
    cur = params[key]
    cur_shapes = jax.tree.map(lambda x: x.shape, cur)
    new_shapes = jax.tree.map(lambda x: x.shape, sub_params)
    if cur_shapes != new_shapes:
        raise ValueError(
            f"shape mismatch grafting '{key}': {cur_shapes} vs {new_shapes}"
        )
    out = dict(params)
    out[key] = sub_params
    return out


def load_torch_stage(
    variables: Dict,
    torch_path: str,
    component: str,
) -> Dict:
    """Load a reference .pth.tar stage checkpoint into our variables.

    component: 'backbone' | 'root_net' | 'pose_net' | 'all'
    (ref: tools/train_3d.py:150-180 — PRETRAINED_BACKBONE / INIT_ROOTNET /
    INIT_ALL with 'backbone.' / 'root_net.' prefix stripping).
    """
    from selfpose3d_tpu.convert.torch2jax import (
        load_torch_checkpoint,
        convert_pose_resnet,
        convert_v2v_net,
    )

    sd = load_torch_checkpoint(torch_path)
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))

    def merge(comp_name, conv):
        if comp_name in params and conv["params"]:
            params[comp_name] = {**params[comp_name], **conv["params"]}
        if conv["batch_stats"]:
            stats[comp_name] = {**stats.get(comp_name, {}), **conv["batch_stats"]}

    if component in ("backbone", "all"):
        conv = convert_pose_resnet(sd, prefix="backbone.")
        if conv["params"]:
            merge("backbone", conv)
    if component in ("root_net", "all"):
        conv = convert_v2v_net(sd, prefix="root_net.v2v_net.")
        if conv["params"]:
            params.setdefault("root_net", {})
            params["root_net"] = {**params["root_net"], "v2v_net": conv["params"]}
            stats.setdefault("root_net", {})
            stats["root_net"] = {**stats["root_net"], "v2v_net": conv["batch_stats"]}
    if component in ("pose_net", "all"):
        conv = convert_v2v_net(sd, prefix="pose_net.v2v_net.")
        if conv["params"]:
            params.setdefault("pose_net", {})
            params["pose_net"] = {**params["pose_net"], "v2v_net": conv["params"]}
            stats.setdefault("pose_net", {})
            stats["pose_net"] = {**stats["pose_net"], "v2v_net": conv["batch_stats"]}
    if component == "all":
        conv = convert_pose_resnet(sd, prefix="attn.backbone.")
        if conv["params"]:
            params.setdefault("attn", {})
            params["attn"] = {**params["attn"], "backbone": conv["params"]}
            stats.setdefault("attn", {})
            stats["attn"] = {**stats["attn"], "backbone": conv["batch_stats"]}

    out = {"params": params, "batch_stats": stats}
    for k, v in variables.items():
        if k not in out:
            out[k] = v
    return out
