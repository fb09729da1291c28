"""Greedy NMS on TPU: fixed-shape, masked, O(N^2) suppression.

Replaces torchvision's native ``nms`` / ``batched_nms`` kernels used by the
reference (/root/reference/rpn.py:517, /root/reference/roi_heads.py:1160-1161).

Instead of the coordinate-offset trick torchvision uses for batched NMS (which
costs float precision), suppression is restricted to pairs in the same group
via an exact group-equality matrix.

The greedy pass is a ``lax.fori_loop`` over score-ranked boxes: at step ``i``
the i-th ranked box (if still active) suppresses all lower-ranked boxes with
IoU strictly greater than the threshold. This reproduces torchvision's greedy
semantics exactly; all work per step is an [N]-wide vector op on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.ops.boxes import box_iou

NEG_INF = jnp.finfo(jnp.float32).min


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    groups: jnp.ndarray | None = None,
):
    """Masked greedy NMS.

    boxes:  [N, 4] xyxy
    scores: [N]
    valid:  [N] bool — invalid boxes never kept nor suppress others
    groups: optional [N] int — suppression only within equal group ids
            (per-level for the RPN, per-class for the RoI head)

    Returns:
      keep:   [N] bool in ORIGINAL order — kept boxes
      order:  [N] int32 — indices sorting scores descending (invalid last);
              ``order`` filtered by ``keep[order]`` enumerates kept boxes in
              score order, matching torchvision's return convention.
    """
    n = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores).astype(jnp.int32)

    b = boxes[order]
    a0 = valid[order]
    iou = box_iou(b, b)
    over = iou > iou_threshold
    if groups is not None:
        g = groups[order]
        over = over & (g[:, None] == g[None, :])

    ranks = jnp.arange(n)

    def body(i, active):
        keep_i = active[i]
        suppress = keep_i & over[i] & (ranks > i)
        return active & ~suppress

    active = jax.lax.fori_loop(0, n, body, a0)

    # Scatter keep mask back to original indexing.
    keep = jnp.zeros(n, dtype=bool).at[order].set(active)
    return keep, order


def batched_nms_mask(boxes, scores, idxs, valid, iou_threshold):
    """Group-aware NMS (exact equivalent of torchvision ``batched_nms``)."""
    return nms_mask(boxes, scores, valid, iou_threshold, groups=idxs)


def topk_after_nms(scores: jnp.ndarray, keep: jnp.ndarray, k: int):
    """Select up to ``k`` kept entries, score-descending.

    Returns (indices [k], valid [k]) — indices of the top-k kept boxes padded
    with the last entries of the sort (masked invalid). Mirrors the
    reference's ``keep = keep[:post_nms_top_n]`` pattern.
    """
    masked = jnp.where(keep, scores, NEG_INF)
    vals, idx = jax.lax.top_k(masked, k)
    return idx.astype(jnp.int32), vals > NEG_INF
