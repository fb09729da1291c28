"""Patch-based Pallas RoIAlign vs the XLA gather path (interpret on CPU).

The kernel must be EXACT vs ops/roi_align.py (same torchvision border rules
and sampling arithmetic): f32 to ~1e-5 (matmul reduction order only), bf16
to ~1e-4 (bf16x2 weight split). Oversized RoIs must route the whole batch
through the gather fallback and still match.
"""

import numpy as np
import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.ops.roi_align import (
    multiscale_roi_align,
)
from snn_automotive_object_detection_tpu.ops.pallas_roi_align import (
    _prep,
    multiscale_roi_align_pallas,
)


def _setup(rng, h=128, w=192):
    key = jax.random.PRNGKey(0)
    shapes = [(32, 48), (16, 24), (8, 12), (4, 6)]
    feats = [
        jax.random.normal(jax.random.fold_in(key, i), (2, a, b, 256),
                          jnp.float32)
        for i, (a, b) in enumerate(shapes)
    ]
    r = 12
    b = np.zeros((2, r, 4), np.float32)
    for n in range(2):
        for i in range(r):
            cx, cy = rng.uniform(0, w), rng.uniform(0, h)
            bw, bh = rng.uniform(4, 120), rng.uniform(4, 90)
            b[n, i] = [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2]
    b[0, 0] = [0, 0, w, h]            # full image
    b[0, 1] = [-20, -20, 5, 5]        # partly outside
    b[0, 2] = [50, 50, 50.5, 50.5]    # degenerate (min-1 rule)
    b[1, 0] = [w - 3, h - 3, w + 9, h + 9]  # clipped at far border
    return feats, jnp.asarray(b), (h, w)


def test_pallas_roi_align_matches_gather_f32(rng):
    feats, boxes, size = _setup(rng)
    ref = multiscale_roi_align(feats, boxes, size)
    out = multiscale_roi_align_pallas(feats, boxes, size, interpret=True)
    assert out.shape == (2, 12, 7, 7, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_pallas_roi_align_matches_gather_bf16(rng):
    feats, boxes, size = _setup(rng)
    feats = [f.astype(jnp.bfloat16) for f in feats]
    ref = multiscale_roi_align(feats, boxes, size)
    out = multiscale_roi_align_pallas(feats, boxes, size, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


def test_oversized_roi_falls_back_exactly(rng):
    """A pathological sliver RoI (wider than the static patch at its level)
    must flip fits_all and take the gather path for the whole batch."""
    key = jax.random.PRNGKey(1)
    h, w = 512, 1024
    shapes = [(128, 256), (64, 128), (32, 64), (16, 32)]
    feats = [
        jax.random.normal(jax.random.fold_in(key, i), (1, a, b, 256),
                          jnp.float32)
        for i, (a, b) in enumerate(shapes)
    ]
    boxes = jnp.asarray(
        [[[10.0, 100.0, 1010.0, 104.0],   # 1000x4 sliver -> P2, 250 cols
          [100.0, 100.0, 300.0, 260.0]]], jnp.float32
    )
    from snn_automotive_object_detection_tpu.ops.roi_align import (
        assign_fpn_levels, infer_scales,
    )
    import math
    scales = infer_scales(shapes, (h, w))
    levels = assign_fpn_levels(boxes, 4, k_min=int(-math.log2(scales[0])))
    g = _prep(
        boxes.reshape(-1, 4), levels.reshape(-1),
        jnp.asarray([a for a, _ in shapes], jnp.int32),
        jnp.asarray([b for _, b in shapes], jnp.int32),
        jnp.asarray(scales, jnp.float32),
        jnp.asarray([0, 128, 192, 224], jnp.int32),
        256,
    )
    assert not bool(g["fits_all"])

    ref = multiscale_roi_align(feats, boxes, (h, w))
    out = multiscale_roi_align_pallas(feats, boxes, (h, w), interpret=True)
    # Same gather computation; only lax.cond-context fusion/reduction order
    # differs.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_odd_roi_count_pads_pair(rng):
    # Kernel processes two RoIs per grid step; odd totals pad with dummies.
    feats, boxes, size = _setup(rng)
    boxes = boxes[:1, :11]  # 11 RoIs -> odd p_total
    ref = multiscale_roi_align([f[:1] for f in feats], boxes, size)
    out = multiscale_roi_align_pallas([f[:1] for f in feats], boxes, size,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
