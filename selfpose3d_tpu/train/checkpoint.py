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
from typing import Any, Dict, Mapping, Optional, Tuple

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


def _leaf_paths(tree: Dict, base: Tuple[str, ...] = ()) -> set:
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _leaf_paths(v, base + (str(k),))
        else:
            out.add(base + (str(k),))
    return out


def _get_path(tree: Dict, path: Tuple[str, ...]):
    cur = tree
    for p in path:
        cur = cur[p]
    return cur


class CheckpointKeyError(ValueError):
    """A torch checkpoint did not cover the target component (strict load)."""


def _require_full(conv: Dict, target: Dict, what: str) -> None:
    """Strict-load semantics (ref: tools/train_3d.py:158,171,178 use
    load_state_dict(strict=True)): every leaf of the target subtree must be
    produced by the conversion, with a matching shape."""
    got = _leaf_paths(conv)
    want = _leaf_paths(target)
    missing = sorted("/".join(p) for p in want - got)
    unexpected = sorted("/".join(p) for p in got - want)
    if missing or unexpected:
        raise CheckpointKeyError(
            f"strict load of {what}: missing={missing[:8]}"
            f"{'...' if len(missing) > 8 else ''} "
            f"unexpected={unexpected[:8]}{'...' if len(unexpected) > 8 else ''} "
            f"({len(missing)} missing / {len(unexpected)} unexpected leaves)"
        )
    for p in want:
        ts, cs = np.shape(_get_path(target, p)), np.shape(_get_path(conv, p))
        if ts != cs:
            raise CheckpointKeyError(
                f"strict load of {what}: shape mismatch at {'/'.join(p)}: "
                f"checkpoint {cs} vs model {ts}"
            )


def _is_bare_pose_resnet(sd: Mapping) -> bool:
    """A state dict saved from a bare PoseResNet (e.g. the released COCO
    pose_resnet_50_384x288.pth) has unprefixed keys like 'conv1.weight'."""
    return "conv1.weight" in sd and not any(
        k.startswith(("backbone.", "root_net.", "pose_net.", "attn.")) for k in sd
    )


def load_torch_stage(
    variables: Dict,
    torch_path: str,
    component: str,
    coco_mapping: Optional[Tuple[int, ...]] = None,
) -> Dict:
    """Load a reference .pth.tar/.pth checkpoint into our variables.

    Handles every released key layout (all are 'module.'-stripped first):
      * full-model state dicts (model.module.state_dict(): keys 'backbone.*',
        'root_net.*', 'pose_net.*', 'attn.backbone.*') — the stage files
        backbone_epoch20 / cam5_rootnet_epoch2 / cam5_posenet
        (ref: tools/train_3d.py:150-180, the _PSEUDOGT prefix-strip path);
      * bare PoseResNet state dicts with unprefixed keys and a possibly
        different final-layer joint count — the released COCO
        pose_resnet_50_384x288.pth. The final layer is channel-remapped via
        ``coco_mapping`` (ref: lib/models/pose_resnet.py:216-222); when the
        joint counts already match the reference *zeroes* the final layer
        (quirk of init_weights, ref pose_resnet.py:219-221) — mirrored here.

    component: 'backbone' | 'root_net' | 'pose_net' | 'all'.

    Raises CheckpointKeyError if the checkpoint does not fully cover the
    requested component (the reference loads these strict=True); loading a
    mismatched file can never silently train from random init.
    """
    from selfpose3d_tpu.convert.torch2jax import (
        load_torch_checkpoint,
        convert_pose_resnet,
        convert_v2v_net,
    )

    sd = load_torch_checkpoint(torch_path)
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    merged_any = False

    def merge_resnet(comp_path: Tuple[str, ...], prefix: str, strict: bool,
                     remap: bool = False):
        nonlocal merged_any
        tgt_p = _get_path(params, comp_path)
        num_joints = tgt_p["final_layer"]["kernel"].shape[-1]
        conv = convert_pose_resnet(
            sd, prefix=prefix,
            coco_to_panoptic=coco_mapping if remap else None,
            num_joints=num_joints if remap else None,
        )
        if not conv["params"]:
            if strict:
                raise CheckpointKeyError(
                    f"{torch_path}: no keys with prefix '{prefix}' convert "
                    f"into {'/'.join(comp_path)}"
                )
            return
        if remap:
            # ref init_weights zeroes a same-joint-count final layer
            fl = conv["params"].get("final_layer")
            ck_joints = sd.get(prefix + "final_layer.weight")
            if fl is not None and ck_joints is not None and (
                ck_joints.shape[0] == num_joints
            ):
                fl["kernel"] = np.zeros_like(fl["kernel"])
                if "bias" in fl:
                    fl["bias"] = np.zeros_like(fl["bias"])
        if strict:
            _require_full(conv["params"], tgt_p, f"{'/'.join(comp_path)} params")
            _require_full(
                conv["batch_stats"], _get_path(stats, comp_path),
                f"{'/'.join(comp_path)} batch_stats",
            )
        _set_component(params, comp_path, conv["params"], tolerant=not strict)
        _set_component(stats, comp_path, conv["batch_stats"], tolerant=not strict)
        merged_any = True

    def merge_v2v(comp: str, prefix: str):
        nonlocal merged_any
        conv = convert_v2v_net(sd, prefix=prefix)
        if not conv["params"]:
            raise CheckpointKeyError(
                f"{torch_path}: no keys with prefix '{prefix}' convert into "
                f"{comp}/v2v_net"
            )
        _require_full(conv["params"], params[comp]["v2v_net"], f"{comp} params")
        _require_full(
            conv["batch_stats"], stats.get(comp, {}).get("v2v_net", {}),
            f"{comp} batch_stats",
        )
        _set_component(params, (comp, "v2v_net"), conv["params"])
        _set_component(stats, (comp, "v2v_net"), conv["batch_stats"])
        merged_any = True

    bare = _is_bare_pose_resnet(sd)
    if component in ("backbone", "all"):
        if bare:
            if component == "all":
                raise CheckpointKeyError(
                    f"{torch_path}: bare PoseResNet state dict cannot "
                    "initialize the full model"
                )
            # ref load_backbone_panoptic / init_weights path: tolerant load
            # with final-layer remap (ref: lib/utils/utils.py:118-149)
            merge_resnet(("backbone",), "", strict=False, remap=True)
        else:
            merge_resnet(("backbone",), "backbone.", strict=True)
    if component in ("root_net", "all") and "root_net" in params:
        merge_v2v("root_net", "root_net.v2v_net.")
    if component in ("pose_net", "all") and "pose_net" in params:
        merge_v2v("pose_net", "pose_net.v2v_net.")
    if component == "all" and "attn" in params:
        merge_resnet(("attn", "backbone"), "attn.backbone.", strict=True)

    if component == "pretrained":
        # NETWORK.PRETRAINED at model build: tolerant bare-file load into the
        # backbone AND the attention net (ref: pose_resnet.py:274-284,321-333)
        if not bare:
            raise CheckpointKeyError(
                f"{torch_path}: NETWORK.PRETRAINED expects a bare PoseResNet "
                "state dict (e.g. pose_resnet_50_384x288.pth)"
            )
        merge_resnet(("backbone",), "", strict=False, remap=True)
        if "attn" in params:
            merge_resnet(("attn", "backbone"), "", strict=False, remap=True)

    if not merged_any:
        raise CheckpointKeyError(
            f"{torch_path}: zero parameters converted for component "
            f"'{component}' — wrong file or wrong key layout "
            f"(first keys: {sorted(sd)[:5]})"
        )

    out = {"params": params, "batch_stats": stats}
    for k, v in variables.items():
        if k not in out:
            out[k] = v
    return out


def _deep_merge(dst: Dict, src: Dict, drop_mismatched: bool) -> Dict:
    """Recursively overlay src onto dst. In tolerant mode (drop_mismatched),
    leaves whose shape differs from the existing one are skipped — the
    reference's shape-matching partial load (ref: lib/utils/utils.py:126-127)."""
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict):
            out[k] = _deep_merge(out.get(k, {}), v, drop_mismatched)
        else:
            if (
                drop_mismatched
                and k in out
                and not isinstance(out[k], dict)
                and np.shape(out[k]) != np.shape(v)
            ):
                continue
            out[k] = v
    return out


def _set_component(
    tree: Dict, path: Tuple[str, ...], value: Dict, tolerant: bool = False
) -> None:
    """Deep-merge value into tree[path] (copy-on-write along path)."""
    if not path:
        raise ValueError("empty component path")
    cur = tree
    for p in path[:-1]:
        cur[p] = dict(cur.get(p, {}))
        cur = cur[p]
    cur[path[-1]] = _deep_merge(cur.get(path[-1], {}), value, tolerant)
