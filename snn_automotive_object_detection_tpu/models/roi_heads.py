"""RoI heads: training-sample selection, box head dispatch, postprocessing.

Static-shape rebuild of the reference's ``RoIHeads`` / ``RoIHeadsSNN``
(/root/reference/roi_heads.py:496-1347):

  * train: append GT to proposals, match at 0.5/0.5 (no low-quality),
    sample 512/image at 25% positive (roi_heads.py:1037-1073), RoIAlign 7x7
    over FPN levels 0-3, box head, CE + smooth-L1(beta=1/9) loss normalised
    by the sampled count (roi_heads.py:11-53)
  * eval (SNN variant): decode per-class boxes, softmax scores, then the
    open-set postprocess of roi_heads.py:1075-1176 — foreground boxes
    (classes >= 1) are score-thresholded, small-filtered, per-class NMS'd and
    capped at detections_per_img; BACKGROUND (class-0) boxes whose proposal
    was NOT claimed by any above-threshold foreground prediction survive
    their own NMS and are ALL kept (here: up to the proposal capacity, which
    is exact since there is one BG box per proposal); pre-NMS per-class
    scores/boxes are returned for new-object discovery.

Fixed capacities: R proposals in, detections_per_img FG + R BG out, all with
validity masks.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.ops import boxes as box_ops
from snn_automotive_object_detection_tpu.ops import nms as nms_ops
from snn_automotive_object_detection_tpu.ops.matcher import match_boxes
from snn_automotive_object_detection_tpu.ops.roi_align import multiscale_roi_align
from snn_automotive_object_detection_tpu.ops.sampler import balanced_sample
from snn_automotive_object_detection_tpu.models.rpn import smooth_l1

NEG_INF = jnp.finfo(jnp.float32).min


@dataclasses.dataclass(frozen=True)
class RoIConfig:
    """Hyperparameters from /root/reference/model.py:94-106."""

    score_thresh: float = 0.4
    nms_thresh: float = 0.5
    detections_per_img: int = 100
    fg_iou_thresh: float = 0.5
    bg_iou_thresh: float = 0.5
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    bbox_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    min_size: float = 1e-2  # remove_small_boxes threshold (roi_heads.py:1151)


# ------------------------------------------------------------- training


def select_training_samples(
    key: jax.Array,
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: RoIConfig,
):
    """Per-image proposal sampling (roi_heads.py:1037-1073).

    proposals: [P, 4]; gt_boxes: [G, 4]; gt_labels: [G] int.
    Returns fixed-size sampled set of size cfg.batch_size_per_image:
      boxes [S, 4], labels [S] (0 = bg), reg_targets [S, 4], valid [S].
    """
    s = cfg.batch_size_per_image
    # Append GT to proposals (roi_heads.py:1053).
    all_boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    all_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)

    quality = box_ops.box_iou(gt_boxes, all_boxes)
    quality = jnp.where(all_valid[None, :], quality, -1.0)
    matched = match_boxes(
        quality, gt_valid, cfg.fg_iou_thresh, cfg.bg_iou_thresh,
        allow_low_quality_matches=False,
    )
    # Labels: fg -> gt label; BELOW_LOW (-1) -> background 0;
    # BETWEEN (-2) -> ignore (empty when fg==bg thresholds).
    safe_idx = jnp.clip(matched, 0)
    labels = jnp.where(matched >= 0, gt_labels[safe_idx], 0)
    ignore = matched == -2
    # Images without GT: everything is background (torchvision handles this
    # by zero labels; padded-GT rows are masked out of `quality` already).

    positive = (labels > 0) & all_valid & ~ignore
    negative = (labels == 0) & all_valid & ~ignore
    pos_m, neg_m = balanced_sample(key, positive, negative, s, cfg.positive_fraction)

    # Pack sampled rows into S static slots: positives first, then negatives.
    r = jax.random.uniform(jax.random.fold_in(key, 1), all_valid.shape)
    sel_key = jnp.where(pos_m, 2.0 + r, jnp.where(neg_m, 1.0 + r, NEG_INF))
    vals, idx = jax.lax.top_k(sel_key, s)
    sel_valid = vals > NEG_INF

    boxes = all_boxes[idx]
    lab = jnp.where(sel_valid, labels[idx], 0)
    matched_boxes = gt_boxes[safe_idx[idx]]
    # Safe encode: background/invalid rows regress to their own box
    # (target 0), and INVALID slots (padding picked up by the fixed-size
    # top_k) get a unit box — a zero-size box there would put NaNs into
    # encode's log() and poison the masked loss *gradients* through where().
    unit = jnp.asarray([0.0, 0.0, 1.0, 1.0], boxes.dtype)
    boxes = jnp.where(sel_valid[:, None], boxes, unit)
    ref = jnp.where(((lab > 0) & sel_valid)[:, None], matched_boxes, boxes)
    reg_targets = box_ops.encode_boxes(ref, boxes, cfg.bbox_reg_weights)
    return boxes, lab, reg_targets, sel_valid


def fastrcnn_loss(
    class_logits: jnp.ndarray,
    box_regression: jnp.ndarray,
    labels: jnp.ndarray,
    reg_targets: jnp.ndarray,
    valid: jnp.ndarray,
):
    """Classification + box loss (roi_heads.py:11-53), masked.

    class_logits: [S, C]; box_regression: [S, C*4] or [S, 4];
    labels/valid: [S]; reg_targets: [S, 4].
    """
    num = jnp.maximum(valid.sum(), 1)

    logp = jax.nn.log_softmax(class_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    loss_cls = (ce * valid).sum() / num

    s = class_logits.shape[0]
    reg = box_regression.reshape(s, -1, 4)
    cls_idx = jnp.clip(labels, 0, reg.shape[1] - 1)  # only_one_bbox -> 0
    reg_for_label = jnp.take_along_axis(reg, cls_idx[:, None, None], axis=1)[:, 0]
    pos = (labels > 0) & valid
    box_l = smooth_l1(reg_for_label - reg_targets, beta=1.0 / 9).sum(-1)
    loss_box = (box_l * pos).sum() / num
    return loss_cls, loss_box


# ------------------------------------------------------------- inference


def _per_class_nms(boxes, scores, valid, nms_thresh):
    """Per-class NMS over [P, C', ...] inputs, returning the flat p-major
    [P*C'] keep mask (matching ``reshape(-1)`` of the per-class arrays).

    Suppression never crosses classes (torchvision batched_nms with label
    ids, roi_heads.py:1160), so one vmapped NMS per class replaces a single
    NMS over the P*C' concatenation: serial depth P/B blocks instead of
    P*C'/B. Greedy results are identical — argsort is stable, so the
    within-class tie order matches the flat sort's."""
    keep_pc = jax.vmap(
        lambda b, s, v: nms_ops.nms_mask(b, s, v, nms_thresh)[0]
    )(
        jnp.transpose(boxes, (1, 0, 2)),
        jnp.transpose(scores, (1, 0)),
        jnp.transpose(valid, (1, 0)),
    )
    return jnp.transpose(keep_pc, (1, 0)).reshape(-1)


# Pruned per-class NMS (exact, with a whole-batch lax.cond fallback): with
# the SNN score_thresh at 0.4 over a softmax, only a handful of the P
# proposals are valid per FG class, yet the full path stable-argsorts all P
# rows and sweeps P/256 IoU blocks of [256, P] per class. Selecting the
# top-K masked scores (K >= the valid count — greedy NMS only ever looks at
# valid rows) shrinks each FG class to ONE presorted NMS block of K and a
# [K, K] IoU. The BG group is NOT score-thresholded (every unclaimed
# proposal is valid, roi_heads.py:1136-1148) so it stays on the full path.
# Measured on v5e (same-session bench A/B, batch 2): 53.55 -> 57.37 img/s
# at K=128 (the K=256 variant's compile exceeded the 20-min probe cap and
# was not pursued). ON by default since round 5.
_PRUNED_NMS_DEFAULT = os.environ.get("ROI_PRUNED_NMS", "1") == "1"
_PRUNED_NMS_K = int(os.environ.get("ROI_PRUNED_K", "128"))


def _postproc_groups(
    class_logits: jnp.ndarray,
    box_regression: jnp.ndarray,
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    image_size: jnp.ndarray,
    cfg: RoIConfig,
):
    """Per-image first half of the open-set postprocess: softmax/decode/clip
    plus assembly of the G = (C-1) FG + 1 BG NMS groups.

    Returns ((gb [G, P, 4], gs [G, P], gv [G, P]), inter) where ``inter``
    carries everything :func:`_postproc_outputs` needs. Split from
    :func:`postprocess_detections` so the NMS can run OUTSIDE the per-image
    vmap (a lax.cond under vmap degenerates to select-of-both-branches; the
    pruned fast path needs a real whole-batch branch).
    """
    p, c = class_logits.shape
    scores = jax.nn.softmax(class_logits, axis=-1)

    boxes = box_ops.decode_boxes(box_regression, proposals, cfg.bbox_reg_weights)
    boxes = boxes.reshape(p, -1, 4)
    if boxes.shape[1] == 1:
        boxes = jnp.broadcast_to(boxes, (p, c, 4))  # only_one_bbox
    boxes = box_ops.clip_boxes_to_image(boxes, (image_size[0], image_size[1]))

    all_scores = jnp.where(prop_valid[:, None], scores, 0.0)
    all_boxes = jnp.where(prop_valid[:, None, None], boxes, 0.0)

    # ----- foreground: classes 1..C-1 flattened
    fg_boxes = boxes[:, 1:, :].reshape(-1, 4)
    fg_scores = scores[:, 1:].reshape(-1)
    fg_labels = jnp.broadcast_to(jnp.arange(1, c)[None, :], (p, c - 1)).reshape(-1)
    fg_prop_valid = jnp.repeat(prop_valid, c - 1)

    above = fg_scores > cfg.score_thresh
    fg_valid = above & fg_prop_valid & box_ops.small_box_mask(fg_boxes, cfg.min_size)

    # ----- background: one class-0 box per proposal; keep proposals NOT
    # claimed by an above-threshold FG prediction (roi_heads.py:1136-1148).
    # bg_valid depends only on the SCORES (not on the FG NMS outcome), so
    # the BG NMS is independent of the per-class FG NMS — run it as one
    # more group in the same vmap (serial NMS depth P/B once instead of
    # twice; both use cfg.nms_thresh, and cross-group suppression never
    # happens by construction).
    claimed = (above & fg_prop_valid).reshape(p, c - 1).any(axis=1)
    bg_boxes = boxes[:, 0, :]
    bg_scores = scores[:, 0]
    bg_valid = (
        prop_valid & ~claimed & box_ops.small_box_mask(bg_boxes, cfg.min_size)
    )

    gb = jnp.concatenate(
        [jnp.transpose(boxes[:, 1:, :], (1, 0, 2)), bg_boxes[None]], axis=0)
    gs = jnp.concatenate(
        [jnp.transpose(scores[:, 1:], (1, 0)), bg_scores[None]], axis=0)
    gv = jnp.concatenate(
        [jnp.transpose(fg_valid.reshape(p, c - 1), (1, 0)), bg_valid[None]],
        axis=0)
    inter = {
        "fg_boxes": fg_boxes, "fg_scores": fg_scores, "fg_labels": fg_labels,
        "bg_boxes": bg_boxes, "bg_scores": bg_scores,
        "all_scores": all_scores, "all_boxes": all_boxes,
    }
    return (gb, gs, gv), inter


def _postproc_outputs(inter, keep_all: jnp.ndarray, bg_order: jnp.ndarray,
                      cfg: RoIConfig):
    """Per-image second half: top-k after NMS + fixed-size output assembly.

    keep_all: [G, P] NMS keep masks from :func:`_batched_group_nms` (FG
    classes first, BG last); bg_order: [P] the BG NMS's own score-descending
    argsort, reused so the ALL-surviving-BG selection needs no second
    1000-row sort (see ops.nms.select_kept_in_order).
    """
    g, p = keep_all.shape
    fg_keep = jnp.transpose(keep_all[:g - 1], (1, 0)).reshape(-1)
    d = cfg.detections_per_img
    fg_idx, fg_out_valid = nms_ops.topk_after_nms(inter["fg_scores"], fg_keep, d)
    bg_idx, bg_out_valid = nms_ops.select_kept_in_order(
        bg_order, keep_all[g - 1])

    fg_boxes, fg_scores = inter["fg_boxes"], inter["fg_scores"]
    bg_boxes, bg_scores = inter["bg_boxes"], inter["bg_scores"]
    fg_labels = inter["fg_labels"]
    out_boxes = jnp.concatenate([fg_boxes[fg_idx], bg_boxes[bg_idx]], axis=0)
    out_scores = jnp.concatenate([fg_scores[fg_idx], bg_scores[bg_idx]], axis=0)
    out_labels = jnp.concatenate(
        [fg_labels[fg_idx], jnp.zeros(p, fg_labels.dtype)], axis=0
    )
    out_valid = jnp.concatenate([fg_out_valid, bg_out_valid], axis=0)

    return {
        "boxes": jnp.where(out_valid[:, None], out_boxes, 0.0),
        "scores": jnp.where(out_valid, out_scores, 0.0),
        "labels": jnp.where(out_valid, out_labels, 0),
        "valid": out_valid,
        "all_scores": inter["all_scores"],
        "all_boxes": inter["all_boxes"],
    }


def _batched_group_nms(gb, gs, gv, nms_thresh: float, pruned: bool | None = None):
    """NMS over [N, G, P] batched groups, FG classes first and BG last.

    pruned=None reads the ROI_PRUNED_NMS env default. The pruned fast path
    is EXACT: a whole-batch ``lax.cond`` falls back to the full path
    whenever any FG group has more than K valid rows (see
    :func:`ops.nms.nms_mask_pruned`); the BG group (valid ~= all unclaimed
    proposals) always takes the full path.

    Returns (keep [N, G, P], bg_order [N, P]) — the BG group's internal
    score argsort rides along so the output stage can reuse it.
    """
    if pruned is None:
        pruned = _PRUNED_NMS_DEFAULT
    n, g, p = gs.shape

    def full(_):
        keep, order = jax.vmap(
            lambda b, s, v: nms_ops.nms_mask(b, s, v, nms_thresh)
        )(gb.reshape(n * g, p, 4), gs.reshape(n * g, p), gv.reshape(n * g, p))
        return keep.reshape(n, g, p), order.reshape(n, g, p)[:, -1]

    k = min(_PRUNED_NMS_K, p)
    if not pruned or k >= p:
        return full(None)

    def pruned_fn(_):
        keep_fg = jax.vmap(
            lambda b, s, v: nms_ops.nms_mask_pruned(b, s, v, nms_thresh, k)
        )(
            gb[:, :-1].reshape(n * (g - 1), p, 4),
            gs[:, :-1].reshape(n * (g - 1), p),
            gv[:, :-1].reshape(n * (g - 1), p),
        ).reshape(n, g - 1, p)
        keep_bg, order_bg = jax.vmap(
            lambda b, s, v: nms_ops.nms_mask(b, s, v, nms_thresh)
        )(gb[:, -1], gs[:, -1], gv[:, -1])
        return jnp.concatenate([keep_fg, keep_bg[:, None]], axis=1), order_bg

    over = jnp.any(jnp.sum(gv[:, :-1], axis=-1) > k)
    return jax.lax.cond(over, full, pruned_fn, None)


def postprocess_detections(
    class_logits: jnp.ndarray,
    box_regression: jnp.ndarray,
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    image_size: jnp.ndarray,
    cfg: RoIConfig,
):
    """Open-set postprocess for ONE image (roi_heads.py:1075-1176).

    class_logits: [P, C]; box_regression: [P, C*4] or [P, 4];
    proposals: [P, 4]; image_size: (h, w).

    Returns dict of fixed-size outputs:
      boxes/scores/labels/valid: [D + P, ...] — FG detections (D =
        detections_per_img) concatenated with surviving BG boxes (P slots)
      all_scores: [P, C] softmax scores (pre-NMS, all classes)
      all_boxes:  [P, C, 4] clipped per-class boxes (pre-NMS)

    Single-image composition of the split halves (always the full NMS path;
    the batched eval path in :func:`roi_heads_forward` hoists the NMS out of
    the vmap to enable the pruned fast path).
    """
    (gb, gs, gv), inter = _postproc_groups(
        class_logits, box_regression, proposals, prop_valid, image_size, cfg)
    keep_all, bg_order = _batched_group_nms(
        gb[None], gs[None], gv[None], cfg.nms_thresh, pruned=False)
    return _postproc_outputs(inter, keep_all[0], bg_order[0], cfg)


def postprocess_detections_ann(
    class_logits: jnp.ndarray,
    box_regression: jnp.ndarray,
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    image_size: jnp.ndarray,
    cfg: RoIConfig,
):
    """Standard (non-open-set) postprocess used by the ANN ``RoIHeads``
    (roi_heads.py:668-732): BG column dropped, thresh/small/NMS/top-k."""
    p, c = class_logits.shape
    scores = jax.nn.softmax(class_logits, axis=-1)
    boxes = box_ops.decode_boxes(box_regression, proposals, cfg.bbox_reg_weights)
    boxes = boxes.reshape(p, -1, 4)
    if boxes.shape[1] == 1:
        boxes = jnp.broadcast_to(boxes, (p, c, 4))
    boxes = box_ops.clip_boxes_to_image(boxes, (image_size[0], image_size[1]))

    fg_boxes = boxes[:, 1:, :].reshape(-1, 4)
    fg_scores = scores[:, 1:].reshape(-1)
    fg_labels = jnp.broadcast_to(jnp.arange(1, c)[None, :], (p, c - 1)).reshape(-1)
    fg_prop_valid = jnp.repeat(prop_valid, c - 1)

    fg_valid = (
        (fg_scores > cfg.score_thresh)
        & fg_prop_valid
        & box_ops.small_box_mask(fg_boxes, cfg.min_size)
    )
    keep = _per_class_nms(boxes[:, 1:, :], scores[:, 1:],
                          fg_valid.reshape(p, c - 1), cfg.nms_thresh)
    idx, out_valid = nms_ops.topk_after_nms(fg_scores, keep, cfg.detections_per_img)
    return {
        "boxes": jnp.where(out_valid[:, None], fg_boxes[idx], 0.0),
        "scores": jnp.where(out_valid, fg_scores[idx], 0.0),
        "labels": jnp.where(out_valid, fg_labels[idx], 0),
        "valid": out_valid,
    }


# ------------------------------------------------------------- forward


def roi_heads_forward(
    box_head_apply: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray, Any]],
    features,
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    image_sizes: jnp.ndarray,
    image_bucket: Tuple[int, int],
    cfg: RoIConfig,
    training: bool,
    open_set: bool = True,
    targets: Optional[Dict[str, jnp.ndarray]] = None,
    loss_key: Optional[jax.Array] = None,
    pallas_align: bool = False,
):
    """Full RoI-heads pass (roi_heads.py:1178-1347).

    box_head_apply: [R_total, C*7*7] flattened pooled features ->
        (class_logits, box_regression, rates)
    features: 4 pooled FPN levels [N, H_l, W_l, C] (level "pool" excluded,
        model.py:118)
    proposals: [N, P, 4]; image_sizes: [N, 2] valid (h, w) per image.
    """
    n, p, _ = proposals.shape
    losses: Dict[str, jnp.ndarray] = {}

    if training:
        assert targets is not None and loss_key is not None
        keys = jax.random.split(loss_key, n)
        boxes, labels, reg_targets, valid = jax.vmap(
            lambda k, pr, pv, gb, gl, gv: select_training_samples(
                k, pr, pv, gb, gl, gv, cfg
            )
        )(
            keys,
            proposals,
            prop_valid,
            targets["boxes"],
            targets["labels"],
            targets["valid"],
        )
        pooled = multiscale_roi_align(features, boxes, image_bucket)
        s = boxes.shape[1]
        flat = pooled.reshape(n * s, -1)
        class_logits, box_regression, rates = box_head_apply(flat)
        loss_cls, loss_box = fastrcnn_loss(
            class_logits,
            box_regression,
            labels.reshape(-1),
            reg_targets.reshape(-1, 4),
            valid.reshape(-1),
        )
        losses = {"loss_classifier": loss_cls, "loss_box_reg": loss_box}
        return {"rates": rates}, losses

    # Eval path: the Pallas patch kernel (ops/pallas_roi_align.py) when the
    # caller enabled it (TPU + bf16; see detector.make_head_applies' gate) —
    # exact semantics with a whole-batch gather fallback for pathological
    # RoI shapes.
    if pallas_align:
        from snn_automotive_object_detection_tpu.ops.pallas_roi_align import (
            multiscale_roi_align_pallas,
        )

        pooled = multiscale_roi_align_pallas(features, proposals, image_bucket)
    else:
        pooled = multiscale_roi_align(features, proposals, image_bucket)
    flat = pooled.reshape(n * p, -1)
    class_logits, box_regression, rates = box_head_apply(flat)
    class_logits = class_logits.reshape(n, p, -1)
    box_regression = box_regression.reshape(n, p, -1)

    if open_set:
        # NMS hoisted out of the per-image vmap so the pruned fast path's
        # exact lax.cond fallback is a real branch (see _batched_group_nms).
        (gb, gs, gv), inter = jax.vmap(
            lambda cl, br, pr, pv, sz: _postproc_groups(cl, br, pr, pv, sz, cfg)
        )(class_logits, box_regression, proposals, prop_valid, image_sizes)
        keep_all, bg_order = _batched_group_nms(gb, gs, gv, cfg.nms_thresh)
        det = jax.vmap(lambda iv, ka, bo: _postproc_outputs(iv, ka, bo, cfg))(
            inter, keep_all, bg_order)
    else:
        det = jax.vmap(
            lambda cl, br, pr, pv, sz: postprocess_detections_ann(
                cl, br, pr, pv, sz, cfg)
        )(class_logits, box_regression, proposals, prop_valid, image_sizes)
    det["rates"] = rates
    return det, losses
