"""Optimizers, LR schedules and parameter freezing (optax).

Mirrors the reference's options (/root/reference/train.py:52-63, 679-700,
717-755): AdamW (default) or SGD+momentum, MultiStepLR / StepLR / ConstantLR
schedules stepped per EPOCH, and freeze flags for fpn / rpn / detector.
The backbone body is always frozen (SNN rule, model.py:14-20 +
generalized_rcnn.py:93-94).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import optax


def build_schedule(
    base_lr: float,
    steps_per_epoch: int,
    milestones: Sequence[int] = (),
    gamma: float = 0.5,
    step_size: int = 0,
    constant_factor: float = 0.0,
):
    """Epoch-indexed LR schedule as an optax step-indexed schedule.

    milestones: MultiStepLR epochs (train.py lr-decay-milestones)
    step_size/gamma: StepLR (lr-decay-step / lr-decay-rate)
    constant_factor: ConstantLR — multiply lr by the factor during the FIRST
      epoch only (train.py constant_lr_scheduler semantics with total_iters=1).
      The reference CHAINS ConstantLR on top of whichever base scheduler was
      selected (train.py:748-755), so the factor composes multiplicatively
      with MultiStepLR/StepLR here rather than being mutually exclusive.
    """
    if milestones:
        boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
        base = optax.piecewise_constant_schedule(base_lr, boundaries)
    elif step_size:
        def base(count):
            epoch = count // steps_per_epoch
            return base_lr * (gamma ** (epoch // step_size))
    else:
        def base(count):
            return base_lr
    if constant_factor:
        def sched(count):
            import jax.numpy as jnp
            epoch = count // steps_per_epoch
            return base(count) * jnp.where(epoch < 1, constant_factor, 1.0)
        return sched
    if not milestones and not step_size:
        return base_lr
    return base


def build_optimizer(
    opt_name: str = "AdamW",
    learning_rate=0.0025,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """train.py:717-755 equivalents."""
    name = opt_name.lower()
    if name == "adamw":
        return optax.adamw(learning_rate, weight_decay=weight_decay)
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate, momentum=momentum),
        )
    raise ValueError(f"unknown optimizer {opt_name!r} (AdamW or SGD)")


def split_trainable(
    params: Dict[str, Any],
    freeze_fpn: bool = False,
    freeze_rpn: bool = False,
    freeze_detector: bool = False,
    train_backbone: bool = False,
    trainable_backbone_layers: int = 0,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Partition the param tree into (trainable, frozen) by module.

    trainable_backbone_layers = N trains the top N ResNet stages
    (1 -> layer4 ... 5 -> + stem; torchvision _resnet_fpn_extractor order,
    reference train.py:66); train_backbone (the all-or-nothing extension,
    see factory.DetectorConfig) means all 5. --freeze-fpn freezes the FPN
    convs; --freeze-rpn / --freeze-detector freeze the heads
    (train.py:679-700).

    With ZERO trainable stages the FPN goes to the frozen partition even
    without --freeze-fpn: the detector stop_gradients the backbone output
    (the reference's no_grad quirk), so FPN grads are identically zero —
    keeping it "trainable" would let AdamW's weight decay silently erode
    weights that torch (which skips grad-None params) leaves untouched.
    """
    n = 5 if train_backbone else trainable_backbone_layers
    trainable: Dict[str, Any] = {}
    frozen: Dict[str, Any] = {}

    bb = dict(params["backbone"])
    fpn = bb.pop("fpn")
    if n >= 5:
        trainable["backbone"] = bb
    elif n <= 0:
        frozen["backbone"] = bb
    else:
        # Stage-granular: layer{i} trains iff i >= 5 - n. Only the ResNet
        # body has this layout (config validation rejects mobilenet + N).
        t_bb = {k: v for k, v in bb.items()
                if k.startswith("layer") and int(k[len("layer"):]) >= 5 - n}
        f_bb = {k: v for k, v in bb.items() if k not in t_bb}
        trainable["backbone"] = t_bb
        frozen["backbone"] = f_bb

    if freeze_fpn or n == 0:
        frozen["backbone_fpn"] = fpn
    else:
        trainable["backbone_fpn"] = fpn

    (frozen if freeze_rpn else trainable)["rpn_head"] = params["rpn_head"]
    (frozen if freeze_detector else trainable)["box_head"] = params["box_head"]
    if "box_predictor" in params:
        (frozen if freeze_detector else trainable)["box_predictor"] = params[
            "box_predictor"
        ]
    return trainable, frozen


def merge_params(trainable: Dict[str, Any], frozen: Dict[str, Any]) -> Dict[str, Any]:
    """Rebuild the full param tree from a split."""
    parts = {**frozen, **trainable}
    backbone = {}
    for src in (frozen, trainable):  # body may be split across both
        backbone.update(src.get("backbone", {}))
    backbone["fpn"] = parts["backbone_fpn"]
    out = {"backbone": backbone, "rpn_head": parts["rpn_head"],
           "box_head": parts["box_head"]}
    if "box_predictor" in parts:
        out["box_predictor"] = parts["box_predictor"]
    return out
