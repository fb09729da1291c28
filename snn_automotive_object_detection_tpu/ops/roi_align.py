"""RoIAlign on TPU via XLA gathers (NHWC, static shapes).

Replaces torchvision's native ``roi_align`` CUDA/C++ kernel and the
``MultiScaleRoIAlign`` FPN wrapper used by the reference
(/root/reference/model.py:114-118: featmap_names 0-3, output 7x7,
sampling_ratio=2; level mapper k = floor(4 + log2(sqrt(area)/224 + 1e-6))).

Semantics reproduced exactly (aligned=False convention):
  * roi coords scaled by ``spatial_scale`` with NO -0.5 offset
  * roi width/height floored at 1.0
  * ``sampling_ratio`` x ``sampling_ratio`` sample points per output bin at
    (i + 0.5) sub-bin offsets, averaged
  * bilinear interpolation with torchvision's border rules: a sample point is
    zero if y < -1 or y > H or x < -1 or x > W; otherwise coords clamp to
    [0, size-1] with the high index collapsing onto the low one at the border

Multiscale strategy (TPU-first): instead of running the align once per FPN
level with masks (4x waste), all levels of one image are flattened row-major
into a single [sum_l H_l*W_l, 2C] buffer where each row is channel-paired
with the row one line BELOW it (same level, y+1). A single contiguous
[2, 2C] slice per sample point then covers all four bilinear corners
(x_low/x_low+1 are adjacent rows; y_low/y_high live in the two channel
halves), so the whole align is ONE row gather per sample point — gathers
are the bottleneck, not bytes. Border cases never read the wrong level:
torchvision's collapse rules zero the offending weight (lx == 0 at the x
border, ly == 0 at the y border), and out-of-level neighbours are finite.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.ops.boxes import box_area


def _bilinear_gather(buf, y, x, heights, widths, offsets):
    """Gather bilinear-interpolated rows from a paired multi-level buffer.

    buf:     [T, 2C] flattened feature rows (row-major per level), where
             buf[i] = [row_i || row_(i+W)] (the row one line below in the
             same level, zeros past the level's last line); one trailing
             zero row so 2-row slices never clamp
    y, x:    [P] float sample coordinates (level-local)
    heights, widths, offsets: [P] int32 per-point level geometry
    Returns [P, C] interpolated values (zero outside the tv border rule).

    All FOUR bilinear corners come from ONE contiguous [2, 2C] slice:
    x_low / x_low+1 are the two adjacent rows, y_low / y_low+1 the two
    channel halves. Border collapses are weight-zeroed: lx == 0 at the x
    border kills row 1, ly == 0 at the y border kills the second half (so
    the "row below" being another level's data — or the zero pad — is
    multiplied by zero and never contaminates the result).
    """
    hf = heights.astype(y.dtype)
    wf = widths.astype(x.dtype)

    valid = (y >= -1.0) & (y <= hf) & (x >= -1.0) & (x <= wf)

    y = jnp.clip(y, 0.0)
    x = jnp.clip(x, 0.0)

    y_low = jnp.minimum(y.astype(jnp.int32), heights - 1)
    x_low = jnp.minimum(x.astype(jnp.int32), widths - 1)
    x_border = x_low >= widths - 1

    # When low index hits the top border, tv collapses the coordinate too
    # (y_high = min(y_low + 1, H - 1) == y_low there -> ly becomes 0).
    y = jnp.where(y_low >= heights - 1, y_low.astype(y.dtype), y)
    x = jnp.where(x_border, x_low.astype(x.dtype), x)

    ly = y - y_low.astype(y.dtype)  # == 0 at the y border -> bottom half 0
    lx = x - x_low.astype(x.dtype)  # == 0 at the x border -> row 1 weight 0
    hy = 1.0 - ly
    hx = 1.0 - lx

    vmask = valid.astype(jnp.float32)
    # [P, 2] weights for the two gathered rows, per y-half.
    w_top = jnp.stack([hy * hx, hy * lx], axis=1) * vmask[:, None]
    w_bot = jnp.stack([ly * hx, ly * lx], axis=1) * vmask[:, None]

    idx = offsets + y_low * widths + x_low

    c2 = buf.shape[1]
    c = c2 // 2

    def take2(start):
        return jax.lax.dynamic_slice(buf, (start, 0), (2, c2))

    g = jax.vmap(take2)(idx)  # [P, 2, 2C]
    top = g[:, :, :c]         # (y_low ; x_low / x_low+1)
    bot = g[:, :, c:]         # (y_low+1 ; x_low / x_low+1)
    v = (w_top[:, :, None] * top).sum(axis=1) + (w_bot[:, :, None] * bot).sum(axis=1)
    return v


def _pair_rows_with_below(f: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H*W, 2C] where row i is paired with row i+W
    (the pixel one line below; zeros past the last line)."""
    n, h, w, c = f.shape
    down = jnp.concatenate([f[:, 1:], jnp.zeros_like(f[:, :1])], axis=1)
    return jnp.concatenate([f, down], axis=-1).reshape(n, h * w, 2 * c)


def _roi_align_flat(
    buf: jnp.ndarray,
    rois: jnp.ndarray,
    roi_scale: jnp.ndarray,
    roi_h: jnp.ndarray,
    roi_w_dim: jnp.ndarray,
    roi_off: jnp.ndarray,
    output_size: int,
    sampling_ratio: int,
) -> jnp.ndarray:
    """Core align for one image given per-roi level geometry.

    buf: [T, C]; rois: [R, 4] xyxy in input-image coords;
    roi_scale/[R] float, roi_h/roi_w_dim/roi_off [R] int32.
    Returns [R, output_size, output_size, C].
    """
    r = rois.shape[0]
    oh = ow = output_size
    s = sampling_ratio

    x1 = rois[:, 0] * roi_scale
    y1 = rois[:, 1] * roi_scale
    x2 = rois[:, 2] * roi_scale
    y2 = rois[:, 3] * roi_scale

    roi_wf = jnp.maximum(x2 - x1, 1.0)
    roi_hf = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_wf / ow
    bin_h = roi_hf / oh

    ph = jnp.arange(oh, dtype=rois.dtype)
    pw = jnp.arange(ow, dtype=rois.dtype)
    iy = (jnp.arange(s, dtype=rois.dtype) + 0.5) / s
    ix = (jnp.arange(s, dtype=rois.dtype) + 0.5) / s

    # ys: [R, oh, s], xs: [R, ow, s]
    ys = y1[:, None, None] + (ph[None, :, None] + iy[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (pw[None, :, None] + ix[None, None, :]) * bin_w[:, None, None]

    heights = jnp.broadcast_to(roi_h[:, None, None], (r, oh, ow)).reshape(-1)
    widths = jnp.broadcast_to(roi_w_dim[:, None, None], (r, oh, ow)).reshape(-1)
    offsets = jnp.broadcast_to(roi_off[:, None, None], (r, oh, ow)).reshape(-1)

    acc = None
    for a in range(s):
        for b in range(s):
            y = jnp.broadcast_to(ys[:, :, None, a], (r, oh, ow)).reshape(-1)
            x = jnp.broadcast_to(xs[:, None, :, b], (r, oh, ow)).reshape(-1)
            v = _bilinear_gather(buf, y, x, heights, widths, offsets)
            acc = v if acc is None else acc + v

    out = acc / (s * s)
    return out.reshape(r, oh, ow, -1)


def roi_align(
    feature: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Single-level RoIAlign. feature: [H, W, C]; rois: [R, 4] (xyxy)."""
    h, w, c = feature.shape
    # +1 zero row so the [2, 2C] corner slices never clamp at the buffer end.
    buf = jnp.concatenate(
        [_pair_rows_with_below(feature[None])[0],
         jnp.zeros((1, 2 * c), feature.dtype)], axis=0
    )
    r = rois.shape[0]
    geom = jnp.full((r,), 0, jnp.int32)
    return _roi_align_flat(
        buf,
        rois,
        jnp.full((r,), spatial_scale, rois.dtype),
        geom + h,
        geom + w,
        geom,
        output_size,
        sampling_ratio,
    )


def assign_fpn_levels(
    boxes: jnp.ndarray,
    num_levels: int,
    canonical_scale: float = 224.0,
    canonical_level: float = 4.0,
    k_min: int = 2,
    eps: float = 1e-6,
    k_max: int = None,
) -> jnp.ndarray:
    """FPN level index per box (0-based into the pooled levels).

    Matches torchvision ``LevelMapper``:
      lvl = floor(canonical_level + log2(sqrt(area)/canonical_scale) + eps),
    clamped to [k_min, k_max], minus k_min. k_max defaults to the standard
    pyramid's k_min + num_levels - 1; the mobilenet FPN has BOTH pooled
    levels at stride 32 (k_max == k_min == 5), which routes every RoI to
    level "0" exactly like torchvision — pass the real k_max there.
    """
    if k_max is None:
        k_max = k_min + num_levels - 1
    s = jnp.sqrt(box_area(boxes))
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale) + eps)
    lvl = jnp.clip(lvl, k_min, k_max)
    return (lvl - k_min).astype(jnp.int32)


def infer_scales(
    feature_shapes: Sequence[Tuple[int, int]], image_size: Tuple[int, int]
) -> list[float]:
    """Per-level spatial scales, torchvision ``MultiScaleRoIAlign.infer_scale``:
    2 ** round(log2(feature_size / image_size)) (asserted equal per dim)."""
    scales = []
    for fh, fw in feature_shapes:
        s_h = 2.0 ** round(math.log2(fh / image_size[0]))
        s_w = 2.0 ** round(math.log2(fw / image_size[1]))
        assert s_h == s_w, "non-uniform FPN scale"
        scales.append(s_h)
    return scales


def multiscale_roi_align(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    image_size: Tuple[int, int],
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_scale: float = 224.0,
    canonical_level: float = 4.0,
) -> jnp.ndarray:
    """Multi-level RoIAlign over FPN features.

    features: list of [N, H_l, W_l, C] (pooled levels, e.g. P2..P5)
    boxes:    [N, R, 4] xyxy in (padded) input-image coordinates
    image_size: (H, W) of the padded input batch
    Returns [N, R, output_size, output_size, C].
    """
    num_levels = len(features)
    n, _, _, c = features[0].shape
    shapes = [(f.shape[1], f.shape[2]) for f in features]
    scales = infer_scales(shapes, image_size)
    k_min = int(-math.log2(scales[0]))

    # Flatten all levels per image into the paired layout: [N, T+1, 2C]
    # (trailing zero row so the [2, 2C] corner slices never clamp).
    flat = jnp.concatenate(
        [_pair_rows_with_below(f) for f in features]
        + [jnp.zeros((n, 1, 2 * c), features[0].dtype)],
        axis=1,
    )

    sizes = [h * w for h, w in shapes]
    offs = [0]
    for sz in sizes[:-1]:
        offs.append(offs[-1] + sz)
    lvl_off = jnp.asarray(offs, jnp.int32)
    lvl_h = jnp.asarray([h for h, _ in shapes], jnp.int32)
    lvl_w = jnp.asarray([w for _, w in shapes], jnp.int32)
    lvl_scale = jnp.asarray(scales, boxes.dtype)

    levels = assign_fpn_levels(
        boxes, num_levels, canonical_scale, canonical_level, k_min,
        k_max=int(-math.log2(scales[-1])),
    )  # [N, R]

    def per_image(buf, rois, lvls):
        return _roi_align_flat(
            buf,
            rois,
            lvl_scale[lvls],
            lvl_h[lvls],
            lvl_w[lvls],
            lvl_off[lvls],
            output_size,
            sampling_ratio,
        )

    return jax.vmap(per_image)(flat, boxes, levels)
