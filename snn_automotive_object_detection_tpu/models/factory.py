"""Model factory: configuration + parameter initialisation.

Mirrors the reference's ``create_model`` (/root/reference/model.py:7-189):
per-dataset image statistics, SNN/ANN head switches, the hard-coded RPN/RoI
hyperparameters (model.py:50-59, 94-106), and the SNN rule that forces a
frozen backbone (model.py:14-20). The hyperparameters also live in
``configs/model.yaml`` — unlike the reference (whose model.yaml was dead
config), the YAML here is authoritative when passed in.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.models import heads
from snn_automotive_object_detection_tpu.models.resnet_fpn import init_resnet50_fpn
from snn_automotive_object_detection_tpu.models.rpn import RPNConfig
from snn_automotive_object_detection_tpu.models.roi_heads import RoIConfig
from snn_automotive_object_detection_tpu.models.transform import (
    CITYSCAPES_MEAN,
    CITYSCAPES_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
)


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    num_classes: int = 9
    # "resnet50_fpn" (flagship) | "mobilenet_v3_large_fpn" |
    # "mobilenet_v3_large_320_fpn" (reference faster_rcnn.py:628-831)
    backbone: str = "resnet50_fpn"
    rpn_snn: bool = True
    detector_snn: bool = True
    t_rpn: int = 12           # code defaults (train.py:40-43)
    t_det: int = 16
    only_one_bbox: bool = False
    image_mean: Tuple[float, float, float] = IMAGENET_MEAN
    image_std: Tuple[float, float, float] = IMAGENET_STD
    min_size: int = 768       # faster_rcnn.py:163-164
    max_size: int = 1536
    rpn: RPNConfig = RPNConfig()
    roi: RoIConfig = RoIConfig()
    compute_dtype: Any = jnp.bfloat16
    # Dtype carrying the SNN neuron states (encoder/LIF membranes +
    # currents, LI readout) when it should differ from compute_dtype:
    # None -> compute_dtype. The f32 default with bf16 compute reproduces
    # the reference's (default-on) AMP numerics (train.py:79 autocasts
    # convs/GEMMs while norse keeps its state tensors fp32) — and measured
    # FASTER than all-bf16 at inference (55.1 vs 53.9 img/s batch 2,
    # round 4): v5e has no bf16 vector compares, so bf16 states paid
    # per-step f32 casts in the LIF chain anyway. Pure-bf16 states remain
    # reachable via snn_state_dtype=None (bench BENCH_STATE32=0).
    snn_state_dtype: Any = jnp.float32
    fpn_channels: int = 256
    representation_size: int = 1024
    # Fused Pallas RPN head (snn/pallas_rpn.py) — TPU + bf16 only; eval and
    # training (custom VJP); rate collection takes the XLA scan path.
    rpn_pallas: bool = True
    # Patch-based Pallas RoIAlign at inference (ops/pallas_roi_align.py) —
    # TPU + bf16 only; fp32 parity runs keep the XLA gather path.
    roi_pallas: bool = True
    # Fused Pallas ResNet stem (ops/pallas_stem.py) — TPU + bf16 only, and
    # only when the batch carries the host-planarized "images_p" layout.
    stem_pallas: bool = True
    # Fused Pallas encoder + k-tiled fc6 GEMM for the spiking box head
    # (snn/pallas_fc6.py) — TPU + bf16 inference only; removes the encoder
    # membrane's per-step HBM round trip (the box-head scan's dominant
    # non-GEMM cost).
    det_fc6_pallas: bool = True
    # Fused VMEM-resident LIF/fc7/readout tail for the spiking box head
    # (snn/pallas_tail.py) — rides the fc6 kernel's currents; TPU + bf16
    # compute + f32 states (the production AMP mode) only, bit-identical
    # to the XLA tail scan at those numerics.
    det_tail_pallas: bool = True
    # Fused Pallas FPN (ops/pallas_fpn.py): lateral + top-down merge +
    # outer 3x3 per level in one kernel — TPU + bf16 inference, ResNet
    # only.
    fpn_pallas: bool = True
    # EXTENSION (default False = reference parity): let gradients reach the
    # backbone at training time. The reference always runs the backbone
    # under no_grad (generalized_rcnn.py:93-94) because it starts from
    # COCO-pretrained weights; in pretrained-weight-free environments
    # (tools/make_bench_weights.py) a frozen RANDOM backbone cannot learn
    # a working detector, so the synthetic-weights tool flips this.
    train_backbone: bool = False
    # --trainable-backbone-layers N (reference train.py:66, consumed by
    # torchvision's _resnet_fpn_extractor): train the top N ResNet stages
    # (1 -> layer4, ..., 4 -> layer1, 5 -> + stem). Implemented with the
    # semantics torchvision INTENDS — gradients really flow into those
    # stages — unlike the reference, where generalized_rcnn.py:93-94 wraps
    # the backbone in no_grad and silently makes the flag dead (PARITY.md).
    # train_backbone=True is equivalent to 5. ResNet only (the mobilenet
    # builders take the whole-backbone flag).
    trainable_backbone_layers: int = 0
    # Design notes (round-3 housekeeping — the measured-slower alternates
    # are no longer config surface, only documented head-level arguments):
    #   * heads.*_apply(fast_encoder=True): closed-form encoder periods at
    #     XLA level — SLOWER than step simulation on v5e (the period map +
    #     integer mod cost more than the saved membrane traffic; the closed
    #     form only pays inside the Pallas kernels, where it is a VMEM
    #     countdown).
    #   * heads.fastrcnn_snn_apply(precompute_fc6=True): stacked-T fc6 GEMM
    #     — 23.0 vs 7.6 ms at R=2048/T=12; the step-encoder scan is already
    #     at its HBM roofline.

    @property
    def bucket(self) -> Tuple[int, int]:
        """Static padded batch shape (host pads every image to this)."""
        return (self.min_size, self.max_size)

    @property
    def anchor_spec(self):
        from snn_automotive_object_detection_tpu.ops.anchors import AnchorSpec

        if self.backbone == "resnet50_fpn":
            return AnchorSpec()  # 5 levels x 1 size x 3 ratios
        # mobilenet FPN: 3 levels x 5 sizes x 3 ratios
        # (faster_rcnn.py:726-735)
        sizes = ((32.0, 64.0, 128.0, 256.0, 512.0),) * 3
        return AnchorSpec(sizes=sizes, aspect_ratios=((0.5, 1.0, 2.0),) * 3)

    @property
    def num_anchors_per_location(self) -> int:
        return self.anchor_spec.num_anchors_per_location[0]

    @property
    def backbone_trainable_stages(self) -> int:
        """Resolved stage count: train_backbone (the all-or-nothing
        extension) means all 5; otherwise --trainable-backbone-layers."""
        n = 5 if self.train_backbone else self.trainable_backbone_layers
        if n and self.backbone != "resnet50_fpn" and not self.train_backbone:
            raise ValueError(
                "--trainable-backbone-layers is stage-granular for ResNet "
                "only; use train_backbone for the mobilenet families"
            )
        return n

    @property
    def fpn_strides(self) -> Tuple[int, ...]:
        """Per-level feature strides of the configured backbone's FPN.

        resnet50: P2..P6 (strides 4..64); mobilenet_v3: P4, P5, pool
        (models/mobilenet_fpn.py). Consumers (anchor grids, spike-rate /
        energy FLOP bookkeeping) must derive level count from this, not
        assume the 5-level ResNet layout."""
        if self.backbone == "resnet50_fpn":
            return (4, 8, 16, 32, 64)
        # mobilenet: two stride-32 maps + the pool level (see
        # models/mobilenet_fpn.py C4_IDX note).
        return (32, 32, 64)


# Sentinel: create_model's snn_state_dtype default must track the
# DetectorConfig production default (f32 AMP states) instead of silently
# reverting callers to pure-bf16 states (ADVICE r4). Passing None still
# means "states in compute_dtype" explicitly.
_STATE_DTYPE_UNSET = object()


def create_model(
    dataset_name: str,
    num_classes: int,
    rpn_snn: bool,
    detector_snn: bool,
    num_steps_rpn: int = 12,
    num_steps_detector: int = 16,
    only_one_bbox: bool = False,
    seed: int = 0,
    compute_dtype=jnp.bfloat16,
    model_yaml: Optional[Dict[str, Any]] = None,
    backbone: str = "resnet50_fpn",
    snn_state_dtype=_STATE_DTYPE_UNSET,
) -> Tuple[DetectorConfig, Dict[str, Any]]:
    """Build (config, params) for a dataset, mirroring model.py:7-189.

    model_yaml: optional dict from configs/model.yaml overriding the RPN /
    RoI / transform hyperparameters.
    """
    if dataset_name == "cityscapes":
        mean, std = CITYSCAPES_MEAN, CITYSCAPES_STD
    else:
        mean, std = IMAGENET_MEAN, IMAGENET_STD

    rpn_kw: Dict[str, Any] = {}
    # SNN operating point per model.py:98-100; ANN keeps the tuned defaults
    # of faster_rcnn.py:184-185.
    roi_kw: Dict[str, Any] = (
        {"score_thresh": 0.4, "nms_thresh": 0.5}
        if detector_snn
        else {"score_thresh": 0.10, "nms_thresh": 0.45}
    )
    tr_kw: Dict[str, Any] = {}
    if backbone == "mobilenet_v3_large_320_fpn":
        # Low-resolution mobile preset (reference faster_rcnn.py:748-768):
        # 320/640 input, reduced RPN budgets.
        tr_kw.update(min_size=320, max_size=640)
        rpn_kw.update(pre_nms_top_n_test=150, post_nms_top_n_test=150,
                      score_thresh=0.05)
    if model_yaml:
        rpn_map = {
            "rpn_pre_nms_top_n_train": "pre_nms_top_n_train",
            "rpn_pre_nms_top_n_test": "pre_nms_top_n_test",
            "rpn_post_nms_top_n_train": "post_nms_top_n_train",
            "rpn_post_nms_top_n_test": "post_nms_top_n_test",
            "rpn_nms_thresh": "nms_thresh",
            "rpn_fg_iou_thresh": "fg_iou_thresh",
            "rpn_bg_iou_thresh": "bg_iou_thresh",
            "rpn_batch_size_per_image": "batch_size_per_image",
            "rpn_positive_fraction": "positive_fraction",
            "rpn_score_thresh": "score_thresh",
        }
        roi_map = {
            "box_score_thresh": "score_thresh",
            "box_nms_thresh": "nms_thresh",
            "box_detections_per_img": "detections_per_img",
            "box_fg_iou_thresh": "fg_iou_thresh",
            "box_bg_iou_thresh": "bg_iou_thresh",
            "box_batch_size_per_image": "batch_size_per_image",
            "box_positive_fraction": "positive_fraction",
        }
        for k, v in (model_yaml.get("RPN") or {}).items():
            if k in rpn_map:
                rpn_kw[rpn_map[k]] = v
        for k, v in (model_yaml.get("ROIHeads") or {}).items():
            if k in roi_map:
                roi_kw[roi_map[k]] = v
        for k in ("min_size", "max_size"):
            if k in (model_yaml.get("transform") or {}):
                tr_kw[k] = model_yaml["transform"][k]

    config = DetectorConfig(
        num_classes=num_classes,
        backbone=backbone,
        rpn_snn=rpn_snn,
        detector_snn=detector_snn,
        t_rpn=num_steps_rpn,
        t_det=num_steps_detector,
        only_one_bbox=only_one_bbox,
        image_mean=mean,
        image_std=std,
        rpn=RPNConfig(**rpn_kw),
        roi=RoIConfig(**roi_kw),
        compute_dtype=compute_dtype,
        **(
            {}
            if snn_state_dtype is _STATE_DTYPE_UNSET
            else {"snn_state_dtype": snn_state_dtype}
        ),
        **tr_kw,
    )

    params = init_params(config, jax.random.PRNGKey(seed))
    return config, params


def init_params(config: DetectorConfig, key: jax.Array) -> Dict[str, Any]:
    kb, kr, kh, kp = jax.random.split(key, 4)
    in_feats = config.fpn_channels * 7 * 7
    if config.backbone == "resnet50_fpn":
        backbone_params = init_resnet50_fpn(kb)
    elif config.backbone in ("mobilenet_v3_large_fpn", "mobilenet_v3_large_320_fpn"):
        from snn_automotive_object_detection_tpu.models.mobilenet_fpn import (
            init_mobilenet_v3_fpn,
        )

        backbone_params = init_mobilenet_v3_fpn(kb)
    else:
        raise ValueError(f"unknown backbone {config.backbone!r}")
    params: Dict[str, Any] = {"backbone": backbone_params}
    n_anchors = config.num_anchors_per_location
    if config.rpn_snn:
        params["rpn_head"] = heads.init_rpn_head_snn(kr, config.fpn_channels,
                                                     n_anchors)
    else:
        params["rpn_head"] = heads.init_rpn_head_ann(kr, config.fpn_channels,
                                                     n_anchors)
    if config.detector_snn:
        params["box_head"] = heads.init_fastrcnn_snn(
            kh, in_feats, config.representation_size, config.num_classes,
            config.only_one_bbox,
        )
    else:
        params["box_head"] = heads.init_two_mlp_head(
            kh, in_feats, config.representation_size
        )
        params["box_predictor"] = heads.init_fastrcnn_predictor(
            kp, config.representation_size, config.num_classes
        )
    return params
