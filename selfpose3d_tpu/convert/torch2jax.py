"""PyTorch checkpoint -> flax params converter.

Converts the reference's released ``.pth.tar`` checkpoints
(backbone_epoch20, cam5_rootnet_epoch2, cam5_posenet — ref: README.md:78-90)
into this framework's parameter pytrees, including:
  * conv / deconv kernel layout changes (OIHW -> HWIO; ConvTranspose
    additionally needs a spatial flip: torch computes the conv gradient,
    flax ConvTranspose a fractionally-strided direct conv),
  * BatchNorm weight/bias -> scale/bias and running stats -> batch_stats,
  * module-name mapping between the reference graph and ours,
  * the COCO->Panoptic final-layer channel remap used when loading ImageNet/
    COCO-pretrained backbones (ref: lib/models/pose_resnet.py:216-222).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------- kernels
def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv{1,2,3}d (O, I, *k) -> flax (*k, I, O)."""
    nd = w.ndim
    return np.ascontiguousarray(w.transpose(*range(2, nd), 1, 0))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose{2,3}d (I, O, *k) -> flax (*k_flipped, I, O)."""
    nd = w.ndim
    w = w[(slice(None), slice(None)) + (slice(None, None, -1),) * (nd - 2)]
    return np.ascontiguousarray(w.transpose(*range(2, nd), 0, 1))


def _to_np(t) -> np.ndarray:
    try:
        import torch

        if isinstance(t, torch.Tensor):
            return t.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


# ------------------------------------------------------- name translation
def _resnet_param(name: str) -> Optional[Tuple[Tuple[str, ...], str, str]]:
    """Map a reference PoseResNet state-dict name to (module path, leaf, kind).

    kind in {conv, deconv, bn_scale, bn_bias, bn_mean, bn_var}.
    Reference names (ref: lib/models/pose_resnet.py:96-207):
      conv1.weight, bn1.{weight,bias,running_mean,running_var},
      layer{1..4}.{i}.conv{1..3}.weight / .bn{1..3}.* / .downsample.{0,1}.*,
      deconv_layers.{0,3,6}.weight (+bn at 1,4,7), final_layer.{weight,bias}
    """
    bn_leaf = {
        "weight": ("scale", "bn_scale"),
        "bias": ("bias", "bn_bias"),
        "running_mean": ("mean", "bn_mean"),
        "running_var": ("var", "bn_var"),
    }

    if name == "conv1.weight":
        return ("conv1",), "kernel", "conv"
    m = re.match(r"^bn1\.(\w+)$", name)
    if m and m.group(1) in bn_leaf:
        leaf, kind = bn_leaf[m.group(1)]
        return ("bn1",), leaf, kind

    m = re.match(r"^layer(\d)\.(\d+)\.conv(\d)\.weight$", name)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}",), "kernel", "conv", f"conv{m.group(3)}"  # type: ignore[return-value]
    m = re.match(r"^layer(\d)\.(\d+)\.bn(\d)\.(\w+)$", name)
    if m and m.group(4) in bn_leaf:
        leaf, kind = bn_leaf[m.group(4)]
        return (f"layer{m.group(1)}_{m.group(2)}", f"bn{m.group(3)}"), leaf, kind
    m = re.match(r"^layer(\d)\.(\d+)\.downsample\.0\.weight$", name)
    if m:
        return (
            f"layer{m.group(1)}_{m.group(2)}",
            "downsample_conv",
        ), "kernel", "conv"
    m = re.match(r"^layer(\d)\.(\d+)\.downsample\.1\.(\w+)$", name)
    if m and m.group(3) in bn_leaf:
        leaf, kind = bn_leaf[m.group(3)]
        return (
            f"layer{m.group(1)}_{m.group(2)}",
            "downsample_bn",
        ), leaf, kind

    m = re.match(r"^deconv_layers\.(\d+)\.(\w+)$", name)
    if m:
        idx, leaf = int(m.group(1)), m.group(2)
        layer_i, role = divmod(idx, 3)
        if role == 0:  # ConvTranspose2d
            if leaf == "weight":
                return (f"deconv{layer_i}",), "kernel", "deconv"
            return (f"deconv{layer_i}",), "bias", "bias"
        if role == 1 and leaf in bn_leaf:  # BatchNorm2d
            l, kind = bn_leaf[leaf]
            return (f"deconv_bn{layer_i}",), l, kind

    m = re.match(r"^final_layer\.(weight|bias)$", name)
    if m:
        if m.group(1) == "weight":
            return ("final_layer",), "kernel", "conv"
        return ("final_layer",), "bias", "bias"
    return None


def _nested_set(d: dict, path: Tuple[str, ...], leaf: str, value):
    cur = d
    for p in path:
        cur = cur.setdefault(p, {})
    cur[leaf] = value


def convert_pose_resnet(
    state_dict: Mapping[str, "np.ndarray"],
    prefix: str = "",
    coco_to_panoptic: Optional[Tuple[int, ...]] = None,
    num_joints: Optional[int] = None,
) -> Dict[str, dict]:
    """Convert a reference PoseResNet state dict to flax variables.

    Returns {'params': ..., 'batch_stats': ...} matching models.PoseResNet.
    ``coco_to_panoptic`` applies the final-layer channel remap when the
    checkpoint's joint count differs (ref: pose_resnet.py:216-222).
    """
    params: dict = {}
    stats: dict = {}
    fixups = []
    for raw_name, tensor in state_dict.items():
        if prefix and not raw_name.startswith(prefix):
            continue
        name = raw_name[len(prefix):]
        mapped = _resnet_param(name)
        if mapped is None:
            continue
        if len(mapped) == 4:  # bottleneck conv with sub-name
            path, leaf, kind, sub = mapped
            path = path + (sub,)
        else:
            path, leaf, kind = mapped
        w = _to_np(tensor).astype(np.float32)
        if kind == "conv":
            if (
                path[-1] == "final_layer"
                and coco_to_panoptic is not None
                and num_joints is not None
                and w.shape[0] != num_joints
            ):
                w = w[list(coco_to_panoptic)]
            w = conv_kernel(w)
        elif kind == "deconv":
            w = conv_transpose_kernel(w)
        elif kind == "bias":
            if (
                path[-1] == "final_layer"
                and coco_to_panoptic is not None
                and num_joints is not None
                and w.shape[0] != num_joints
            ):
                w = w[list(coco_to_panoptic)]
        if kind in ("bn_mean", "bn_var"):
            _nested_set(stats, path, leaf, w)
        else:
            _nested_set(params, path, leaf, w)
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------- V2VNet
_V2V_BLOCK_MAP = {
    # reference module path fragments -> our module names (ref: v2v_net.py)
    "front_layers.0.block.0": ("front_basic", "conv", "conv"),
    "front_layers.0.block.1": ("front_basic", "bn", "bn"),
    "front_layers.1": ("front_res", None, "res"),
    "encoder_decoder.skip_res1": ("encoder_decoder", "skip_res1", "res"),
    "encoder_decoder.encoder_res1": ("encoder_decoder", "encoder_res1", "res"),
    "encoder_decoder.skip_res2": ("encoder_decoder", "skip_res2", "res"),
    "encoder_decoder.encoder_res2": ("encoder_decoder", "encoder_res2", "res"),
    "encoder_decoder.mid_res": ("encoder_decoder", "mid_res", "res"),
    "encoder_decoder.decoder_res2": ("encoder_decoder", "decoder_res2", "res"),
    "encoder_decoder.decoder_res1": ("encoder_decoder", "decoder_res1", "res"),
    "encoder_decoder.decoder_upsample2": ("encoder_decoder", "decoder_upsample2", "up"),
    "encoder_decoder.decoder_upsample1": ("encoder_decoder", "decoder_upsample1", "up"),
    "output_layer": ("output_layer", None, "conv_leaf"),
}

_BN_LEAF = {
    "weight": ("scale", False),
    "bias": ("bias", False),
    "running_mean": ("mean", True),
    "running_var": ("var", True),
}


def convert_v2v_net(
    state_dict: Mapping[str, "np.ndarray"], prefix: str = ""
) -> Dict[str, dict]:
    """Convert a reference V2VNet state dict to flax variables.

    Reference structure (ref: lib/models/v2v_net.py):
      res blocks: res_branch.{0 conv,1 bn,3 conv,4 bn}, skip_con.{0 conv,1 bn}
      upsample blocks: block.{0 deconvT,1 bn}
    """
    params: dict = {}
    stats: dict = {}

    def put(path, leaf, w, is_stat):
        _nested_set(stats if is_stat else params, path, leaf, w)

    for raw_name, tensor in state_dict.items():
        if prefix and not raw_name.startswith(prefix):
            continue
        name = raw_name[len(prefix):]
        w = _to_np(tensor).astype(np.float32)

        hit = None
        for frag, target in _V2V_BLOCK_MAP.items():
            if name.startswith(frag + "."):
                hit = (frag, target, name[len(frag) + 1:])
                break
        if hit is None:
            continue
        frag, (top, subname, kind), rest = hit

        if kind == "conv":  # Basic3DBlock conv: rest = weight|bias
            path = (top, subname)
            if rest == "weight":
                put(path, "kernel", conv_kernel(w), False)
            elif rest == "bias":
                put(path, "bias", w, False)
        elif kind == "bn":
            if rest not in _BN_LEAF:
                continue
            leaf, is_stat = _BN_LEAF[rest]
            put((top, subname), leaf, w, is_stat)
        elif kind == "conv_leaf":  # output 1x1x1 conv
            if rest == "weight":
                put((top,), "kernel", conv_kernel(w), False)
            elif rest == "bias":
                put((top,), "bias", w, False)
        elif kind == "res":
            path_base = (top, subname) if subname else (top,)
            m = re.match(r"^res_branch\.(\d)\.(\w+)$", rest)
            if m:
                idx, leaf = int(m.group(1)), m.group(2)
                sub = {0: "conv1", 1: "bn1", 3: "conv2", 4: "bn2"}[idx]
                if sub.startswith("conv"):
                    if leaf == "weight":
                        put(path_base + (sub,), "kernel", conv_kernel(w), False)
                    elif leaf == "bias":
                        put(path_base + (sub,), "bias", w, False)
                elif leaf in _BN_LEAF:
                    l, is_stat = _BN_LEAF[leaf]
                    put(path_base + (sub,), l, w, is_stat)
                continue
            m = re.match(r"^skip_con\.(\d)\.(\w+)$", rest)
            if m:
                idx, leaf = int(m.group(1)), m.group(2)
                sub = {0: "skip_conv", 1: "skip_bn"}[idx]
                if sub == "skip_conv":
                    if leaf == "weight":
                        put(path_base + (sub,), "kernel", conv_kernel(w), False)
                    elif leaf == "bias":
                        put(path_base + (sub,), "bias", w, False)
                elif leaf in _BN_LEAF:
                    l, is_stat = _BN_LEAF[leaf]
                    put(path_base + (sub,), l, w, is_stat)
        elif kind == "up":
            path_base = (top, subname)
            m = re.match(r"^block\.(\d)\.(\w+)$", rest)
            if m:
                idx, leaf = int(m.group(1)), m.group(2)
                if idx == 0:  # ConvTranspose3d
                    if leaf == "weight":
                        put(path_base + ("deconv",), "kernel",
                            conv_transpose_kernel(w), False)
                    elif leaf == "bias":
                        put(path_base + ("deconv",), "bias", w, False)
                elif leaf in _BN_LEAF:
                    l, is_stat = _BN_LEAF[leaf]
                    put(path_base + ("bn",), l, w, is_stat)
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pth.tar file into a flat numpy state dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        k = k.replace("module.", "", 1) if k.startswith("module.") else k
        out[k] = _to_np(v)
    return out
