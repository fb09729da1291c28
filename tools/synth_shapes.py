"""On-device multi-class synthetic detection data (no host uploads).

VERDICT round-2 #3: the single-class "bright rectangles" weights gave a
low-signal parity operating point (16 images, mAP~0.11). This generator
draws 5 visually distinct object classes entirely with jitted JAX ops —
iota coordinate masks, no host arrays — so training can stream unlimited
fresh batches on the TPU (host->device uploads of full-res images stall
the tunneled platform) and evaluation can use genuinely held-out images.

Classes (shape AND color family decide the label — VERDICT r2 #3 asks for
"distinct shapes/colors"; the color channel keeps the task learnable at
the modest step budgets a from-scratch backbone permits):
  1 solid rectangle, red     2 ellipse, green   3 hollow frame, blue
  4 striped rectangle, yellow          5 checkerboard rectangle, magenta
(each with per-object brightness/saturation jitter)
Sizes are log-uniform over [40, 440] px on the long side, covering the
FPN anchor bands (32..512, ops/anchors.py); boxes may overlap (later
shapes occlude earlier ones, GT boxes stay the full analytic extent —
mild occlusion like the reference's urban scenes).

Used by tools/make_bench_weights.py (training + held-out eval) and the
PARITY.md numerics re-measurements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NUM_SHAPE_CLASSES = 5


def _shape_mask(ys, xs, cls, x0, y0, x1, y1):
    """Masks for one object: (bright, dim) [H, W] bools. cls in 1..5.

    ``bright`` is the class's pattern at full color; ``dim`` is the rest of
    the object's support painted at 35% color — patterned objects (frame /
    stripes / checker) must NOT show raw background inside their extent,
    otherwise their RoIAlign crops are background-dominated and the box
    head maps them to the open-set BG class (measured round 3: classes 3/4
    at AP 0.0 with background-showing interiors, nonzero once dimmed)."""
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    rx = jnp.maximum((x1 - x0) / 2, 1.0)
    ry = jnp.maximum((y1 - y0) / 2, 1.0)
    in_rect = (xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1)

    ellipse = (((xs - cx) / rx) ** 2 + ((ys - cy) / ry) ** 2) <= 1.0
    # Frame: rect minus an inner rect at 65% size.
    inner = (
        (xs >= cx - 0.65 * rx) & (xs < cx + 0.65 * rx)
        & (ys >= cy - 0.65 * ry) & (ys < cy + 0.65 * ry)
    )
    frame = in_rect & ~inner
    # Stripe period scales with the box so small objects stay striped.
    period = jnp.maximum((y1 - y0) / 6.0, 2.0)
    stripes = in_rect & (jnp.floor((ys - y0) / period).astype(jnp.int32) % 2 == 0)
    px = jnp.maximum((x1 - x0) / 6.0, 2.0)
    checker = in_rect & (
        (jnp.floor((ys - y0) / period) + jnp.floor((xs - x0) / px)).astype(jnp.int32)
        % 2 == 0
    )
    bright = jnp.select(
        [cls == 1, cls == 2, cls == 3, cls == 4],
        [in_rect, ellipse, frame, stripes],
        checker,
    )
    # The ellipse keeps background corners (its outline IS the shape cue);
    # patterned classes fill their support with the dim shade.
    dim = jnp.select(
        [cls == 1, cls == 2], [in_rect, ellipse], in_rect
    ) & ~bright
    return bright, dim


def synth_image(key, h, w, max_boxes=8):
    """One [h, w, 3] image + GT (boxes [G,4], labels [G], valid [G])."""
    ks = jax.random.split(key, 8)
    n = jax.random.randint(ks[0], (), 2, max_boxes + 1)
    cls = jax.random.randint(ks[1], (max_boxes,), 1, NUM_SHAPE_CLASSES + 1)
    # Log-uniform long side in [40, 440]; aspect in [0.5, 2].
    long = jnp.exp(jax.random.uniform(
        ks[2], (max_boxes,), minval=jnp.log(40.0), maxval=jnp.log(440.0)))
    aspect = jnp.exp(jax.random.uniform(
        ks[3], (max_boxes,), minval=jnp.log(0.5), maxval=jnp.log(2.0)))
    bw = jnp.minimum(long * jnp.sqrt(aspect), w * 0.9)
    bh = jnp.minimum(long / jnp.sqrt(aspect), h * 0.9)
    x0 = jax.random.uniform(ks[4], (max_boxes,)) * (w - bw - 2) + 1
    y0 = jax.random.uniform(ks[5], (max_boxes,)) * (h - bh - 2) + 1
    x1, y1 = x0 + bw, y0 + bh
    # Class-coded color family (see module docstring) with per-object
    # brightness jitter: base[cls] * u + 0.12, u ~ U[0.55, 1.0].
    base = jnp.asarray([
        [0.0, 0.0, 0.0],  # (padding for cls=0, unused)
        [1.0, 0.15, 0.15],  # 1 red
        [0.15, 1.0, 0.15],  # 2 green
        [0.25, 0.45, 1.0],  # 3 blue
        [1.0, 1.0, 0.15],   # 4 yellow
        [1.0, 0.25, 1.0],   # 5 magenta
    ])
    bright = jax.random.uniform(ks[6], (max_boxes, 1), minval=0.55, maxval=1.0)
    color = jnp.clip(base[cls] * bright + 0.12, 0.0, 1.0)

    img = jax.random.uniform(ks[7], (h, w, 3), minval=0.0, maxval=0.22)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5

    valid = jnp.arange(max_boxes) < n

    def paint(img, i):
        bright, dim = _shape_mask(ys, xs, cls[i], x0[i], y0[i], x1[i], y1[i])
        img = jnp.where((dim & valid[i])[:, :, None], color[i] * 0.35, img)
        return jnp.where((bright & valid[i])[:, :, None], color[i], img), None

    img, _ = jax.lax.scan(paint, img, jnp.arange(max_boxes))
    boxes = jnp.stack([x0, y0, x1, y1], axis=-1)
    boxes = jnp.where(valid[:, None], boxes, 0.0)
    return img, boxes, jnp.where(valid, cls, 0).astype(jnp.int32), valid


def synth_batch_device(key, batch, h, w, max_boxes=8):
    """Jit-friendly batch in detector_apply's input format (all on device)."""
    keys = jax.random.split(key, batch)
    imgs, boxes, labels, valid = jax.vmap(
        lambda k: synth_image(k, h, w, max_boxes)
    )(keys)
    return {
        "images": imgs,
        "image_sizes": jnp.broadcast_to(
            jnp.asarray([[h, w]], jnp.int32), (batch, 2)),
        "original_sizes": jnp.broadcast_to(
            jnp.asarray([[h, w]], jnp.int32), (batch, 2)),
        "targets": {"boxes": boxes, "labels": labels, "valid": valid},
    }
