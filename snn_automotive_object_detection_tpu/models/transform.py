"""Image transform: normalize on device; resize/pad geometry helpers.

Rebuild of torchvision's ``GeneralizedRCNNTransform`` as configured by the
reference (min_size=768, max_size=1536 — /root/reference/faster_rcnn.py:163-164;
Cityscapes mean/std override — model.py:22-26; ImageNet defaults —
faster_rcnn.py:309-312).

TPU split: the aspect-preserving resize runs on the HOST (cv2 bilinear ==
torch bilinear align_corners=False) inside the input pipeline; images arrive
as a fixed BUCKET shape (e.g. 768x1536) with their valid (h, w) recorded.
Normalisation happens on-device inside the jitted forward (fused by XLA).
Box rescale back to original sizes is pure JAX.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# Cityscapes-specific statistics (/root/reference/model.py:22-26)
CITYSCAPES_MEAN = (0.2869, 0.3251, 0.2839)
CITYSCAPES_STD = (0.1870, 0.1902, 0.1872)


def resize_shape(
    orig_hw: Tuple[int, int], min_size: int = 768, max_size: int = 1536
) -> Tuple[int, int]:
    """Torchvision resize arithmetic: scale by min(min_size/short_side,
    max_size/long_side), output floor(size * scale) (recompute_scale_factor
    semantics)."""
    h, w = orig_hw
    short, long = min(h, w), max(h, w)
    scale = min(min_size / short, max_size / long)
    return int(math.floor(h * scale)), int(math.floor(w * scale))


def normalize_images(images: jnp.ndarray, mean, std) -> jnp.ndarray:
    """images: [N, H, W, 3] float in [0, 1] (or uint8, converted here)."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, images.dtype)
    std = jnp.asarray(std, images.dtype)
    return (images - mean) / std


def rescale_boxes(
    boxes: jnp.ndarray, from_sizes: jnp.ndarray, to_sizes: jnp.ndarray
) -> jnp.ndarray:
    """Rescale per-image boxes between image sizes.

    boxes: [N, ..., 4]; from_sizes/to_sizes: [N, 2] (h, w).
    Matches the reference's resize_boxes (generalized_rcnn.py:173-186).
    """
    ry = to_sizes[:, 0].astype(boxes.dtype) / from_sizes[:, 0].astype(boxes.dtype)
    rx = to_sizes[:, 1].astype(boxes.dtype) / from_sizes[:, 1].astype(boxes.dtype)
    scale = jnp.stack([rx, ry, rx, ry], axis=-1)  # [N, 4]
    extra = boxes.ndim - 2
    scale = scale.reshape((boxes.shape[0],) + (1,) * extra + (4,))
    return boxes * scale
