"""Checkpointing: Orbax save/resume + reference .pth conversion.

Covers the reference's checkpoint story (/root/reference/train.py:650-675,
764-787, 923-949):

  * per-epoch checkpoints {model, optimizer, lr-step, epoch, args} with a
    rolling "checkpoint" alias, written by rank 0 only
  * --resume: restores params + optimizer + epoch
  * --load-model: weights only, tolerant of missing/extra keys
    (strict=False), with the bbox_pred surgery for --only-one-bbox
    (train.py:669-675: pop a shape-mismatched bbox_pred so the fresh
    4-output init survives the lenient load)
  * released torchvision-layout .pth checkpoints convert via
    ``convert_torch_state_dict`` (torch only used to unpickle)

Layout notes for the conversion: torch conv [O,I,H,W] -> HWIO; torch linear
[out,in] -> [in,out]; fc6's flattened input is (C,7,7)-ordered in torch but
(7,7,C)-ordered here (NHWC RoIAlign), so its rows are permuted; FrozenBN
folds to scale = g/sqrt(var+eps), bias = b - mean*scale.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import numpy as np
import jax

BN_EPS = 1e-5


# ------------------------------------------------------------------ orbax


def _ckpt(path: str):
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer(), os.path.abspath(path)


def save_checkpoint(path: str, state: Dict[str, Any], overwrite: bool = True,
                    args: Optional[Dict[str, Any]] = None):
    """state: any pytree, e.g. {"params", "opt_state", "epoch"}.

    args: run flags saved alongside the pytree as ``args.json`` inside the
    checkpoint directory — the reference stores them in the checkpoint dict
    (train.py:923-949) so a run is reproducible from its checkpoint alone.

    Unlike the reference's save_on_master (utils.py:263-265), this must be
    called on EVERY process: orbax's save is itself a collective (it
    sync_global_processes internally and lets only process 0 write shared
    metadata), so gating it by rank would deadlock multi-host runs — caught
    by tests/test_distributed.py."""
    from snn_automotive_object_detection_tpu.parallel.mesh import is_main_process

    ckptr, path = _ckpt(path)
    ckptr.save(path, state, force=overwrite)
    if args is not None and is_main_process():
        import json

        with open(os.path.join(path, "args.json"), "w") as f:
            json.dump({k: v for k, v in args.items()
                       if isinstance(v, (str, int, float, bool, list, tuple,
                                         type(None)))},
                      f, indent=1, default=str)


def load_checkpoint_args(path: str) -> Optional[Dict[str, Any]]:
    """Read back the args.json written by save_checkpoint (if present)."""
    import json

    p = os.path.join(os.path.abspath(path), "args.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def load_checkpoint(path: str, like: Optional[Dict[str, Any]] = None):
    ckptr, path = _ckpt(path)
    if like is not None:
        return ckptr.restore(path, item=like)
    return ckptr.restore(path)


def load_weights_lenient(params: Dict[str, Any], loaded: Dict[str, Any],
                         verbose: bool = True) -> Dict[str, Any]:
    """strict=False load: copy leaves present in both trees with matching
    shape; keep current values elsewhere. Returns the merged tree."""
    flat_p = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_l = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    out = {}
    missing, mismatched = [], []
    for k, v in flat_p.items():
        if k in flat_l and tuple(np.shape(flat_l[k])) == tuple(np.shape(v)):
            out[k] = flat_l[k]
        else:
            (missing if k not in flat_l else mismatched).append(k)
            out[k] = v
    if verbose and (missing or mismatched):
        print(f"[load_weights_lenient] kept {len(missing)} missing and "
              f"{len(mismatched)} shape-mismatched leaves at their current values")
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.tree_util.tree_flatten_with_path(params)[0]
    return jax.tree_util.tree_unflatten(treedef, [out[k] for k, _ in keys])


# ----------------------------------------------------------- torch .pth


def _t2np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv_w(sd, key):
    return _t2np(sd[key]).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _bn(sd, prefix):
    g = _t2np(sd[f"{prefix}.weight"])
    b = _t2np(sd[f"{prefix}.bias"])
    mean = _t2np(sd[f"{prefix}.running_mean"])
    var = _t2np(sd[f"{prefix}.running_var"])
    scale = g / np.sqrt(var + BN_EPS)
    return {"scale": scale, "bias": b - mean * scale}


def _linear(sd, key_w, key_b=None):
    out = {"w": _t2np(sd[key_w]).T}
    if key_b and key_b in sd:
        out["b"] = _t2np(sd[key_b])
    return out


def _fc6_permuted(sd, key, channels=256, res=7):
    """fc6 weight rows reordered from (C, H, W) to (H, W, C) flattening."""
    w = _t2np(sd[key])  # [out, C*7*7] with (C, H, W) input order
    out_dim = w.shape[0]
    w = w.reshape(out_dim, channels, res, res).transpose(0, 2, 3, 1)
    return {"w": w.reshape(out_dim, -1).T}


def _convert_mobilenet_body(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision 0.13 mobilenet_v3_large features -> models/mobilenet_fpn
    param tree (reference builders faster_rcnn.py:703-831).

    Key layout: backbone.body.0.{0,1} stem conv+BN; backbone.body.{i}.block
    .{j} for features 1..15, each block a Sequential of ConvNormActivation
    ([expand,] dw, [SE,] project) with SE as fc1/fc2 1x1 convs;
    backbone.body.16.{0,1} the final 1x1 conv."""
    from snn_automotive_object_detection_tpu.models.mobilenet_fpn import (
        V3_LARGE,
    )

    def pfx(k):
        for p in ("backbone.body.", "body.", "features.", ""):
            if f"{p}{k}" in sd or f"{p}{k}.weight" in sd:
                return f"{p}{k}"
        raise KeyError(k)

    body: Dict[str, Any] = {
        "stem": {"w": _conv_w(sd, pfx("0.0.weight")), "bn": _bn(sd, pfx("0.1"))}
    }
    cin = 16
    blocks = []
    for i, (k, exp, out, se, hs, stride) in enumerate(V3_LARGE):
        base = pfx(f"{i + 1}.block.0.0.weight")[: -len("0.0.weight")]
        j = 0
        p: Dict[str, Any] = {}
        if exp != cin:
            p["expand"] = {"w": _conv_w(sd, f"{base}{j}.0.weight"),
                           "bn": _bn(sd, f"{base}{j}.1")}
            j += 1
        p["dw"] = {"w": _conv_w(sd, f"{base}{j}.0.weight"),
                   "bn": _bn(sd, f"{base}{j}.1")}
        j += 1
        if se:
            p["se"] = {
                "fc1": {"w": _conv_w(sd, f"{base}{j}.fc1.weight"),
                        "b": _t2np(sd[f"{base}{j}.fc1.bias"])},
                "fc2": {"w": _conv_w(sd, f"{base}{j}.fc2.weight"),
                        "b": _t2np(sd[f"{base}{j}.fc2.bias"])},
            }
            j += 1
        p["project"] = {"w": _conv_w(sd, f"{base}{j}.0.weight"),
                        "bn": _bn(sd, f"{base}{j}.1")}
        blocks.append(p)
        cin = out
    body["blocks"] = blocks
    body["last"] = {"w": _conv_w(sd, pfx("16.0.weight")),
                    "bn": _bn(sd, pfx("16.1"))}
    return body


def _convert_resnet_body(sd: Dict[str, Any], bkey) -> Dict[str, Any]:
    """ResNet-50 trunk (stem + layer1-4) from torchvision keys; ``bkey``
    resolves prefix variants (bare classification keys vs the detector's
    backbone.body. prefix)."""
    backbone = {
        "stem": {"w": _conv_w(sd, bkey("conv1.weight")),
                 "bn": _bn(sd, bkey("bn1"))}
    }
    blocks_per_stage = (3, 4, 6, 3)
    for stage, n_blocks in enumerate(blocks_per_stage, start=1):
        blocks = []
        for b in range(n_blocks):
            pre = bkey(f"layer{stage}.{b}.conv1.weight")[: -len("conv1.weight")]
            blk = {
                "conv1": {"w": _conv_w(sd, f"{pre}conv1.weight"),
                          "bn": _bn(sd, f"{pre}bn1")},
                "conv2": {"w": _conv_w(sd, f"{pre}conv2.weight"),
                          "bn": _bn(sd, f"{pre}bn2")},
                "conv3": {"w": _conv_w(sd, f"{pre}conv3.weight"),
                          "bn": _bn(sd, f"{pre}bn3")},
            }
            if f"{pre}downsample.0.weight" in sd:
                blk["downsample"] = {
                    "w": _conv_w(sd, f"{pre}downsample.0.weight"),
                    "bn": _bn(sd, f"{pre}downsample.1"),
                }
            blocks.append(blk)
        backbone[f"layer{stage}"] = blocks
    return backbone


def convert_torch_backbone_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a BARE torchvision CLASSIFICATION state_dict (resnet50 /
    mobilenet_v3_large ImageNet weights — trunk keys only, no FPN, no
    detection heads) into a partial parameter pytree ``{"backbone": body}``.

    This is the local-file analog of the reference's ``--pretrained`` /
    ``pretrained_backbone=True`` path (train.py:73-76, model.py:28-31,
    faster_rcnn.py:693-699): the trunk is seeded from ImageNet weights
    while FPN and heads keep their fresh initialization — merge the result
    onto an init tree with ``load_weights_lenient``. Classification-only
    keys (``fc.weight``, ``classifier.*``) are ignored.
    """
    sd = {k: v for k, v in sd.items()}
    is_mobilenet = any(".block.0.0.weight" in k for k in sd)
    if is_mobilenet:
        return {"backbone": _convert_mobilenet_body(sd)}

    def bkey(k):
        for p in ("backbone.body.", "body.", ""):
            if f"{p}{k}" in sd or f"{p}{k}.weight" in sd:
                return f"{p}{k}"
        raise KeyError(k)

    return {"backbone": _convert_resnet_body(sd, bkey)}


def load_torch_backbone(path: str) -> Dict[str, Any]:
    """Load a local torchvision ImageNet classification ``.pth`` and return
    the partial ``{"backbone": ...}`` tree (see
    ``convert_torch_backbone_state_dict``)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj.get("state_dict", obj)) \
        if isinstance(obj, dict) else obj
    return convert_torch_backbone_state_dict(sd)


def convert_torch_state_dict(
    sd: Dict[str, Any],
    rpn_snn: bool = True,
    detector_snn: bool = True,
) -> Dict[str, Any]:
    """Convert a reference checkpoint state_dict into this framework's
    parameter pytree. Key layout follows torchvision 0.13's
    fasterrcnn_resnet50_fpn / fasterrcnn_mobilenet_v3_large_fpn (detected
    from the keys) with the reference's SNN replacements (backbone.body.*,
    backbone.fpn.*, rpn.head.*, roi_heads.box_head_and_predictor.* /
    box_head+box_predictor)."""
    sd = {k: v for k, v in sd.items()}
    is_mobilenet = any(".block.0.0.weight" in k for k in sd)

    def bkey(k):
        # accept both bare resnet keys and the detector's backbone.body. prefix
        for p in ("backbone.body.", "body.", ""):
            if f"{p}{k}" in sd or f"{p}{k}.weight" in sd:
                return f"{p}{k}"
        raise KeyError(k)

    if is_mobilenet:
        backbone = _convert_mobilenet_body(sd)
    else:
        backbone = _convert_resnet_body(sd, bkey)

    # FPN: tv<=0.12 keys inner_blocks.<i>.weight, tv 0.13 Conv2dNormActivation
    # keys inner_blocks.<i>.0.weight — accept both. ResNet has 4 lateral
    # pairs, mobilenet 2 (C4/C5 of _mobilenet_extractor).
    def fpn_conv(group, i):
        for pat in (f"backbone.fpn.{group}.{i}.weight",
                    f"backbone.fpn.{group}.{i}.0.weight",
                    f"fpn.{group}.{i}.weight", f"fpn.{group}.{i}.0.weight"):
            if pat in sd:
                return {"w": _conv_w(sd, pat),
                        "b": _t2np(sd[pat.replace("weight", "bias")])}
        raise KeyError(f"fpn {group} {i}")

    n_fpn = 2 if is_mobilenet else 4
    backbone["fpn"] = {
        "inner": [fpn_conv("inner_blocks", i) for i in range(n_fpn)],
        "layer": [fpn_conv("layer_blocks", i) for i in range(n_fpn)],
    }

    params: Dict[str, Any] = {"backbone": backbone}

    if rpn_snn:
        params["rpn_head"] = {
            "shared_conv": {"w": _conv_w(sd, "rpn.head.shared_conv.weight")},
            "conv_cls": {"w": _conv_w(sd, "rpn.head.conv_cls.weight")},
            "conv_bbox": {"w": _conv_w(sd, "rpn.head.conv_bbox.weight")},
        }
    else:
        def rpn_conv(name):
            for pat in (f"rpn.head.{name}.weight", f"rpn.head.{name}.0.weight",
                        f"rpn.head.{name}.0.0.weight"):
                if pat in sd:
                    return {"w": _conv_w(sd, pat),
                            "b": _t2np(sd[pat.replace("weight", "bias")])}
            raise KeyError(name)
        params["rpn_head"] = {
            "conv": rpn_conv("conv"),
            "cls_logits": rpn_conv("cls_logits"),
            "bbox_pred": rpn_conv("bbox_pred"),
        }

    if detector_snn:
        pre = "roi_heads.box_head_and_predictor"
        params["box_head"] = {
            "fc6": _fc6_permuted(sd, f"{pre}.fc6.weight"),
            "fc7": _linear(sd, f"{pre}.fc7.weight"),
            "cls_score": _linear(sd, f"{pre}.cls_score.weight"),
            "bbox_pred": _linear(sd, f"{pre}.bbox_pred.weight"),
        }
    else:
        params["box_head"] = {
            "fc6": _fc6_permuted(sd, "roi_heads.box_head.fc6.weight"),
            "fc7": _linear(sd, "roi_heads.box_head.fc7.weight",
                           "roi_heads.box_head.fc7.bias"),
        }
        params["box_head"]["fc6"]["b"] = _t2np(sd["roi_heads.box_head.fc6.bias"])
        params["box_predictor"] = {
            "cls_score": _linear(sd, "roi_heads.box_predictor.cls_score.weight",
                                 "roi_heads.box_predictor.cls_score.bias"),
            "bbox_pred": _linear(sd, "roi_heads.box_predictor.bbox_pred.weight",
                                 "roi_heads.box_predictor.bbox_pred.bias"),
        }
    return params


def load_torch_checkpoint(path: str, rpn_snn: bool = True,
                          detector_snn: bool = True,
                          only_one_bbox: bool = False) -> Dict[str, Any]:
    """Load a reference .pth (full checkpoint dict or bare state_dict)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj) if isinstance(obj, dict) else obj
    params = convert_torch_state_dict(sd, rpn_snn, detector_snn)
    if only_one_bbox and detector_snn:
        # --only-one-bbox surgery (train.py:669-675): the reference POPS the
        # per-class bbox_pred weight from the checkpoint and relies on
        # strict=False, so the model keeps its fresh 4-output init. Dropping
        # the leaf here makes load_weights_lenient do the same.
        w = params["box_head"]["bbox_pred"]["w"]
        if w.shape[1] != 4:
            del params["box_head"]["bbox_pred"]
    return params
