"""Anchor grids as precomputed constants.

TPU-native replacement for torchvision's ``AnchorGenerator`` as configured by
the reference (`_default_anchorgen`, /root/reference/faster_rcnn.py:31-34):
5 FPN levels x (one size, three aspect ratios) = 3 anchors per cell, sizes
(32, 64, 128, 256, 512), ratios (0.5, 1.0, 2.0).

Because the rebuild runs on bucketed static image sizes, anchors are pure
constants computed once per (image_size, strides) at trace time — no runtime
anchor generation kernel.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AnchorSpec:
    sizes: Tuple[Tuple[float, ...], ...] = ((32.0,), (64.0,), (128.0,), (256.0,), (512.0,))
    aspect_ratios: Tuple[Tuple[float, ...], ...] = (
        (0.5, 1.0, 2.0),
    ) * 5

    @property
    def num_anchors_per_location(self) -> Tuple[int, ...]:
        return tuple(len(s) * len(a) for s, a in zip(self.sizes, self.aspect_ratios))


def _cell_anchors(sizes: Sequence[float], ratios: Sequence[float]) -> np.ndarray:
    """Zero-centered base anchors [A, 4], torchvision ``generate_anchors``:
    h = sqrt(ratio) * size, w = size / sqrt(ratio); torchvision 0.13 rounds
    the base anchors (`base_anchors.round()`), matched here."""
    sizes = np.asarray(sizes, dtype=np.float32)
    ratios = np.asarray(ratios, dtype=np.float32)
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    ws = (w_ratios[:, None] * sizes[None, :]).reshape(-1)
    hs = (h_ratios[:, None] * sizes[None, :]).reshape(-1)
    return (np.stack([-ws, -hs, ws, hs], axis=1) / 2.0).round()


def generate_anchors(
    feature_shapes: Sequence[Tuple[int, int]],
    image_size: Tuple[int, int],
    spec: AnchorSpec = AnchorSpec(),
) -> list[jnp.ndarray]:
    """Per-level anchor grids.

    feature_shapes: [(H_l, W_l)] per FPN level
    image_size:     (H, W) of the padded/batched input

    Returns list of [H_l * W_l * A, 4] float32 arrays (xyxy), matching
    torchvision's grid ordering: rows iterate (y, x, anchor) with anchor
    fastest — i.e. anchors = shifts[:, None, :] + cell[None, :, :].

    Strides are computed per dimension as image_size // feature_size, exactly
    like torchvision AnchorGenerator.grid_anchors.
    """
    img_h, img_w = image_size
    out = []
    for (fh, fw), sizes, ratios in zip(feature_shapes, spec.sizes, spec.aspect_ratios):
        stride_h = img_h // fh
        stride_w = img_w // fw
        cell = _cell_anchors(sizes, ratios)  # [A, 4]
        shifts_x = np.arange(fw, dtype=np.float32) * stride_w
        shifts_y = np.arange(fh, dtype=np.float32) * stride_h
        sy, sx = np.meshgrid(shifts_y, shifts_x, indexing="ij")
        shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
        anchors = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)
        out.append(jnp.asarray(anchors, dtype=jnp.float32))
    return out


def fpn_feature_shapes(image_size: Tuple[int, int], num_levels: int = 5) -> list[Tuple[int, int]]:
    """Spatial shapes of ResNet-FPN levels P2..P6 for a given input size.

    Levels have strides 4, 8, 16, 32, 64; each is ceil(size / stride) like the
    conv/pool arithmetic of ResNet-50+FPN on sizes divisible by 2.
    """
    h, w = image_size
    shapes = []
    for lvl in range(num_levels):
        stride = 4 * (2 ** lvl)
        shapes.append((math.ceil(h / stride), math.ceil(w / stride)))
    return shapes
