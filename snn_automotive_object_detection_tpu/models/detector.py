"""Detector assembly: backbone -> RPN -> RoI heads -> postprocess.

Functional equivalent of the reference's ``GeneralizedRCNN`` + ``FasterRCNN``
(/root/reference/generalized_rcnn.py:45-170, faster_rcnn.py:158-317):

  * normalise -> (frozen) ResNet-50-FPN -> 5 feature levels
  * RPN over all 5 levels; RoIAlign/RoI head over levels 0-3 only
    (model.py:118)
  * the backbone runs under stop_gradient, mirroring the reference's
    unconditional ``torch.no_grad()`` (generalized_rcnn.py:93-94)
  * eval: detections are rescaled to original image sizes, and the RPN's
    pre-NMS {proposals, objectness} are merged into each detection dict for
    new-object discovery (generalized_rcnn.py:124-132); ``all_boxes`` and
    ``proposals`` are rescaled too (generalized_rcnn.py:146-170)
  * train: returns the 4 losses {loss_objectness, loss_rpn_box_reg,
    loss_classifier, loss_box_reg}

One jit-compiled function per (bucket shape, mode); all shapes static.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.models import heads
from snn_automotive_object_detection_tpu.models import rpn as rpn_mod
from snn_automotive_object_detection_tpu.models import roi_heads as roi_mod
from snn_automotive_object_detection_tpu.models.resnet_fpn import resnet50_fpn_apply
from snn_automotive_object_detection_tpu.models.transform import (
    normalize_images,
    rescale_boxes,
)
from snn_automotive_object_detection_tpu.ops.anchors import generate_anchors


def wants_planar_input(config, bucket=None) -> bool:
    """True when detector_apply would use the fused Pallas stem
    (ops/pallas_stem.py) if the batch carried the planar s2d image layout.
    The host loader (DetectionLoader planar=...) and bench use this to
    decide whether to emit ``images_p``."""
    hb, wb = bucket if bucket is not None else config.bucket
    return (
        getattr(config, "stem_pallas", True)
        and getattr(config, "backbone", "resnet50_fpn") == "resnet50_fpn"
        and config.compute_dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
        and hb % 8 == 0
        and wb % 256 == 0
    )


def _trainable_stages(config) -> int:
    """Resolved --trainable-backbone-layers / train_backbone stage count."""
    if hasattr(config, "backbone_trainable_stages"):
        return config.backbone_trainable_stages
    return 5 if getattr(config, "train_backbone", False) else 0


def make_head_applies(config, params, collect_rates: bool, training: bool = False):
    """Bind head apply functions for the configured (SNN / ANN) variants."""
    dtype = config.compute_dtype
    # Mixed AMP-style precision: neuron states in snn_state_dtype (f32)
    # while convs/GEMMs stay in compute_dtype (factory.py snn_state_dtype).
    sdt = getattr(config, "snn_state_dtype", None)
    mixed_state = sdt is not None and jnp.dtype(sdt) != jnp.dtype(dtype)

    fast_enc = getattr(config, "fast_encoder", False)
    # Fused Pallas RPN head (snn/pallas_rpn.py): TPU-only (interpret mode is
    # far too slow for real shapes). bf16 only: --fp32 is the exact-parity
    # path and must keep the XLA scan (the kernel's f32 dots don't force
    # Precision.HIGHEST and its reduction order differs ~1e-5 — same rule as
    # the RoIAlign gate below). The f32 kernel variant remains reachable in
    # tests via state_dtype. Training uses the custom-VJP variant (Pallas
    # backward kernel, gradient-parity-tested vs the XLA scan). Eval-time
    # rate collection runs IN-KERNEL (spike-count accumulators); the
    # training+rates combination (--extract-spike-rates train) keeps the
    # XLA scan.
    use_pallas_rpn = (
        getattr(config, "rpn_pallas", True)
        and config.rpn_snn
        and not (collect_rates and training)
        # The Pallas train VJP returns dL/dfeat as zeros (the backbone is
        # frozen in the reference); any trainable backbone stage needs the
        # XLA scan's real feature gradients.
        and not (training and _trainable_stages(config) > 0)
        and dtype == jnp.bfloat16
        # Both the inference kernel and the train VJP kernel have an
        # AMP-style mixed mode (lif_state_dtype=f32 with bf16 matmul
        # operands, gradient-parity-tested vs the XLA mixed scan), so
        # mixed-state training keeps the fused fast path (VERDICT r4 #2).
        and jax.default_backend() == "tpu"
    )

    if config.rpn_snn and use_pallas_rpn and training:
        from snn_automotive_object_detection_tpu.snn.pallas_rpn import (
            rpn_head_snn_pallas_train_apply,
        )

        def rpn_head_apply(features):
            return rpn_head_snn_pallas_train_apply(
                params["rpn_head"], features, config.t_rpn, state_dtype=dtype,
                lif_state_dtype=sdt if mixed_state else None,
            )
    elif config.rpn_snn and use_pallas_rpn:
        from snn_automotive_object_detection_tpu.snn.pallas_rpn import (
            rpn_head_snn_pallas_apply,
        )

        def rpn_head_apply(features):
            return rpn_head_snn_pallas_apply(
                params["rpn_head"], features, config.t_rpn, state_dtype=dtype,
                collect_rates=collect_rates,
                lif_state_dtype=sdt if mixed_state else None,
            )
    elif config.rpn_snn:
        def rpn_head_apply(features):
            return heads.rpn_head_snn_apply(
                params["rpn_head"], features, config.t_rpn,
                collect_rates=collect_rates, compute_dtype=dtype,
                fast_encoder=fast_enc, state_dtype=sdt,
            )
    else:
        def rpn_head_apply(features):
            return heads.rpn_head_ann_apply(params["rpn_head"], features, dtype)

    if config.detector_snn:
        # Optional stacked-T fc6 GEMM (heads._fastrcnn_snn_precomputed) —
        # identical spike trains, fc6 weight read once per forward instead of
        # per step, but measured SLOWER on v5e, so OFF by default (matching
        # the dataclass default in factory.py).
        pre_fc6 = not training and getattr(config, "det_precompute_fc6", False)
        # Fused Pallas encoder+fc6 kernel (snn/pallas_fc6.py): same bf16 +
        # TPU + inference gate as the other kernels (--fp32 keeps the exact
        # XLA scan); needs 128-aligned fc6 dims (true for the 256*7*7 ->
        # 1024 reference head).
        w6_shape = params["box_head"]["fc6"]["w"].shape
        from snn_automotive_object_detection_tpu.snn.pallas_fc6 import (
            fc6_fits_vmem,
        )

        use_pallas_fc6 = (
            getattr(config, "det_fc6_pallas", True)
            and not training
            and not pre_fc6
            and dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and w6_shape[0] % 128 == 0
            and w6_shape[1] % 128 == 0
            # Nonstandard (large) t_det can exceed the kernel's scoped-VMEM
            # budget (the revisited [T, 128, rep] f32 block grows with T);
            # a compile-time VMEM OOM can wedge the TPU worker, so fall
            # back to the XLA scan instead (ADVICE r3).
            and fc6_fits_vmem(config.t_det, w6_shape[0], w6_shape[1],
                              collect_rates)
        )

        # Fused tail kernel (snn/pallas_tail.py): consumes the fc6 kernel's
        # currents with all LIF/LI state VMEM-resident. Same gates as the
        # fc6 kernel plus f32 states (heads.py re-checks shapes/dtypes and
        # falls back to the XLA tail scan otherwise).
        use_pallas_tail = use_pallas_fc6 and getattr(
            config, "det_tail_pallas", True)

        def box_head_apply(flat):
            return heads.fastrcnn_snn_apply(
                params["box_head"], flat, config.t_det,
                collect_rates=collect_rates, compute_dtype=dtype,
                fast_encoder=fast_enc, precompute_fc6=pre_fc6,
                pallas_fc6=use_pallas_fc6, pallas_tail=use_pallas_tail,
                state_dtype=sdt,
            )
    else:
        def box_head_apply(flat):
            rep = heads.two_mlp_head_apply(params["box_head"], flat, dtype)
            cls, reg = heads.fastrcnn_predictor_apply(params["box_predictor"], rep)
            return cls, reg, None

    return rpn_head_apply, box_head_apply


def detector_apply(
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    config,
    training: bool,
    rng: Optional[jax.Array] = None,
    collect_rates: bool = False,
):
    """Run the detector on one (static-shape) batch.

    batch:
      images:         [N, Hb, Wb, 3] float in [0,1] (host-resized + padded)
      image_sizes:    [N, 2] valid (h, w) after resize
      original_sizes: [N, 2] pre-resize (h, w)
      targets (train): boxes [N, G, 4] (resized coords), labels [N, G],
                       valid [N, G]

    Returns (detections, losses):
      eval  -> detections dict (original-image coordinates, masked fixed
               capacity) incl. NOD fields; losses == {}
      train -> detections == {} (plus optional rates); 4-entry losses dict
    """
    is_resnet = getattr(config, "backbone", "resnet50_fpn") == "resnet50_fpn"
    # Top-N trainable backbone stages (--trainable-backbone-layers /
    # train_backbone); 0 outside training.
    tbl = _trainable_stages(config) if training else 0
    # Fused Pallas stem (ops/pallas_stem.py): TPU + bf16 + ResNet only —
    # same gating rule as the other kernels (--fp32 keeps the XLA chain).
    # It consumes the RAW image in planar s2d layout (normalization is
    # folded into its weights); the loader/bench provide batch["images_p"]
    # directly, otherwise we planarize at XLA level (slower fallback).
    # The planar layout must come from the host loader (DetectionLoader
    # planar=True / bench.py): planarizing on device costs 6.4 ms — more
    # than the whole XLA stem — so without images_p we keep the XLA chain.
    use_pallas_stem = (
        getattr(config, "stem_pallas", True)
        and is_resnet
        and config.compute_dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
        and "images_p" in batch
        # The stem kernel has no VJP; fine while the stem is frozen (the
        # stop_gradient boundary sits after it), but a trainable stem
        # (layers=5 / train_backbone) needs the XLA chain.
        and tbl < 5
    )

    if "images" in batch:
        images = batch["images"]
    else:
        from snn_automotive_object_detection_tpu.ops.pallas_stem import (
            unplanarize_image,
        )

        images = unplanarize_image(batch["images_p"])
    n, hb, wb, _ = images.shape
    bucket = (hb, wb)
    # Kernel layout constraints (ops/pallas_stem.py: hs % 4, ws % 128)
    use_pallas_stem = use_pallas_stem and hb % 8 == 0 and wb % 256 == 0

    # Fused Pallas FPN (ops/pallas_fpn.py): same TPU + bf16 + inference
    # gate as the other kernels; ResNet only (the mobilenet FPN sits on 2
    # stages with its own apply).
    use_pallas_fpn = (
        getattr(config, "fpn_pallas", True)
        and is_resnet
        and not training
        and config.compute_dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
    )

    if use_pallas_stem:
        from snn_automotive_object_detection_tpu.models.resnet_fpn import (
            resnet50_fpn_apply_from_p1,
        )
        from snn_automotive_object_detection_tpu.ops.pallas_stem import (
            stem_pallas_apply,
        )

        xp = batch["images_p"]
        p1 = stem_pallas_apply(
            params["backbone"]["stem"], xp,
            config.image_mean, config.image_std,
        )
        feats = resnet50_fpn_apply_from_p1(params["backbone"], p1,
                                           trainable_layers=tbl,
                                           fpn_pallas=use_pallas_fpn)
    elif is_resnet:
        x = normalize_images(images, config.image_mean, config.image_std)
        feats = resnet50_fpn_apply(params["backbone"], x, config.compute_dtype,
                                   trainable_layers=tbl,
                                   fpn_pallas=use_pallas_fpn)
    else:
        from snn_automotive_object_detection_tpu.models.mobilenet_fpn import (
            mobilenet_v3_fpn_apply,
        )

        x = normalize_images(images, config.image_mean, config.image_std)
        feats = mobilenet_v3_fpn_apply(params["backbone"], x, config.compute_dtype)
    # Features stay in compute_dtype (bf16): RoIAlign gathers and the SNN
    # heads are HBM-bandwidth-bound. With zero trainable stages the whole
    # backbone INCLUDING the FPN is stop_gradient-ed — the reference's
    # no_grad quirk (generalized_rcnn.py:93-94). With N > 0 the boundary
    # sits inside the body (resnet50_fpn_apply), so the FPN and the
    # trainable stage suffix receive real gradients.
    if not (training and tbl > 0):
        feats = [jax.lax.stop_gradient(f) for f in feats]

    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_levels = generate_anchors(shapes, bucket, config.anchor_spec)
    level_counts = [a.shape[0] for a in anchor_levels]
    anchors = jnp.concatenate(anchor_levels, axis=0)

    rpn_head_apply, box_head_apply = make_head_applies(params=params, config=config,
                                                       collect_rates=collect_rates,
                                                       training=training)

    key_rpn = key_roi = None
    if training:
        assert rng is not None, "training needs an rng for the samplers"
        key_rpn, key_roi = jax.random.split(rng)

    proposals, rpn_losses = rpn_mod.rpn_forward(
        rpn_head_apply,
        feats,
        anchors,
        level_counts,
        batch["image_sizes"],
        config.rpn,
        training,
        targets=batch.get("targets"),
        loss_key=key_rpn,
    )

    # Patch-based Pallas RoIAlign: TPU inference only, and only in bf16 mode
    # (fp32 parity runs keep the XLA gather path: the kernel's f32 dots
    # differ in reduction order and don't force Precision.HIGHEST).
    pallas_align = (
        getattr(config, "roi_pallas", True)
        and not training
        and config.compute_dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
    )
    det, roi_losses = roi_mod.roi_heads_forward(
        box_head_apply,
        feats[:-1],  # all levels except "pool" (model.py:118)
        proposals["boxes"],
        proposals["valid"],
        batch["image_sizes"],
        bucket,
        config.roi,
        training,
        open_set=config.detector_snn,
        targets=batch.get("targets"),
        loss_key=key_roi,
        pallas_align=pallas_align,
    )

    losses = {**rpn_losses, **roi_losses}

    if training:
        out = {}
        if collect_rates:
            out["rpn_rates"] = proposals["rates"]
            out["det_rates"] = det.get("rates")
        return out, losses

    # ---- eval: rescale everything to original image sizes
    img_sizes = batch["image_sizes"]
    orig_sizes = batch["original_sizes"]
    det_out = {
        "boxes": rescale_boxes(det["boxes"], img_sizes, orig_sizes),
        "scores": det["scores"],
        "labels": det["labels"],
        "valid": det["valid"],
        # Pre-NMS proposal dicts merged into detections
        # (generalized_rcnn.py:124-132).
        "proposals": rescale_boxes(
            proposals["pre_nms_proposals"], img_sizes, orig_sizes
        ),
        "objectness": proposals["pre_nms_objectness"],
    }
    if "all_boxes" in det:
        det_out["all_scores"] = det["all_scores"]
        det_out["all_boxes"] = rescale_boxes(det["all_boxes"], img_sizes, orig_sizes)
    if collect_rates:
        det_out["rpn_rates"] = proposals["rates"]
        det_out["det_rates"] = det.get("rates")
    return det_out, losses
