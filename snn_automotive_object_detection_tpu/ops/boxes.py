"""Box primitives (xyxy convention) in pure JAX.

Semantics mirror torchvision 0.13's ``ops.boxes`` and
``models.detection._utils.BoxCoder`` as used by the reference
(/root/reference/rpn.py:347, /root/reference/roi_heads.py:530-536), but are
vectorised/batched and mask-friendly for static-shape TPU execution.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# torchvision BoxCoder clamps dw/dh at log(1000/16) before exp.
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes. boxes: [..., 4] -> [...]."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between two box sets.

    boxes1: [N, 4], boxes2: [M, 4] -> [N, M]. Matches torchvision
    ``box_iou`` (no +1 offsets; degenerate boxes yield 0 via clamping).
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    # Keep every [N, M] intermediate free of trailing size-2 dims: on TPU a
    # [N, M, 2] tensor pads its minor dims to the (8, 128) tile — a 64x
    # memory blowup at RPN scale (N = M ~ 5000).
    iw = jnp.clip(
        jnp.minimum(boxes1[:, None, 2], boxes2[None, :, 2])
        - jnp.maximum(boxes1[:, None, 0], boxes2[None, :, 0]),
        0.0,
    )
    ih = jnp.clip(
        jnp.minimum(boxes1[:, None, 3], boxes2[None, :, 3])
        - jnp.maximum(boxes1[:, None, 1], boxes2[None, :, 1]),
        0.0,
    )
    inter = iw * ih
    union = area1[:, None] + area2[None, :] - inter
    # Guard 0/0 -> 0 (torch yields nan only for degenerate inputs we mask out).
    return jnp.where(union > 0, inter / union, 0.0)


def clip_boxes_to_image(boxes: jnp.ndarray, image_size) -> jnp.ndarray:
    """Clamp xyxy boxes to [0, W] x [0, H].

    image_size: (height, width) — scalars or 0-d arrays (may be traced).
    Matches torchvision ``clip_boxes_to_image``.
    """
    h, w = image_size
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """Mask of boxes with BOTH sides >= min_size.

    Mask-based analogue of torchvision ``remove_small_boxes`` (which the
    reference applies with min_size=1e-3 in the RPN and 1e-2 in the RoI head).
    """
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


def encode_boxes(reference_boxes: jnp.ndarray, proposals: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Encode GT boxes relative to anchor/proposal boxes (tx, ty, tw, th).

    reference_boxes: [..., 4] ground truth (xyxy)
    proposals:       [..., 4] anchors/proposals (xyxy)
    Matches torchvision ``BoxCoder.encode_single``.
    """
    wx, wy, ww, wh = weights
    ex_w = proposals[..., 2] - proposals[..., 0]
    ex_h = proposals[..., 3] - proposals[..., 1]
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0]
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1]
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    tx = wx * (gt_cx - ex_cx) / ex_w
    ty = wy * (gt_cy - ex_cy) / ex_h
    tw = ww * jnp.log(gt_w / ex_w)
    th = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([tx, ty, tw, th], axis=-1)


def decode_boxes(deltas: jnp.ndarray, boxes: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Apply regression deltas to boxes.

    deltas: [..., K*4] (K regressions per box, e.g. per-class) or [..., 4]
    boxes:  [..., 4] anchors/proposals (xyxy)
    Returns boxes with the same shape as ``deltas``.
    Matches torchvision ``BoxCoder.decode_single`` incl. the log(1000/16)
    clamp on dw/dh.
    """
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    lead_shape = deltas.shape[:-1]
    d = deltas.reshape(lead_shape + (-1, 4))
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = jnp.minimum(d[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(d[..., 3] / wh, BBOX_XFORM_CLIP)

    pred_cx = dx * w[..., None] + cx[..., None]
    pred_cy = dy * h[..., None] + cy[..., None]
    pred_w = jnp.exp(dw) * w[..., None]
    pred_h = jnp.exp(dh) * h[..., None]

    out = jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )
    return out.reshape(deltas.shape)


def resize_boxes(boxes: jnp.ndarray, from_size, to_size) -> jnp.ndarray:
    """Rescale xyxy boxes between two image sizes ((h, w) tuples/arrays).

    Equivalent of the reference's ``resize_boxes``
    (/root/reference/generalized_rcnn.py:173-186).
    """
    fh, fw = from_size
    th, tw = to_size
    ry = th / fh
    rx = tw / fw
    scale = jnp.stack([rx, ry, rx, ry], axis=-1)
    return boxes * scale
