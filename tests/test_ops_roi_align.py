import numpy as np
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.ops.roi_align import (
    assign_fpn_levels,
    infer_scales,
    multiscale_roi_align,
    roi_align,
)
from tests import oracles


def test_single_level_matches_oracle(rng):
    feat = rng.normal(0, 1, (24, 32, 3)).astype(np.float32)
    rois = np.array(
        [
            [4.0, 4.0, 60.0, 40.0],
            [0.0, 0.0, 8.0, 8.0],
            [10.0, 5.0, 120.0, 90.0],   # extends past the image
            [50.0, 30.0, 52.0, 33.0],   # tiny
        ],
        np.float32,
    )
    scale = 0.25
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), scale))
    for k in range(len(rois)):
        want = oracles.roi_align_single(feat, rois[k], scale)
        np.testing.assert_allclose(got[k], want, rtol=1e-4, atol=1e-5)


def test_level_assignment():
    # sqrt(area)=224 -> level 4 -> pooled index 2 (k_min=2)
    boxes = jnp.asarray(
        [
            [[0.0, 0.0, 224.0, 224.0],
             [0.0, 0.0, 56.0, 56.0],    # level 2 -> idx 0
             [0.0, 0.0, 112.0, 112.0],  # level 3 -> idx 1
             [0.0, 0.0, 448.0, 448.0],  # level 5 -> idx 3
             [0.0, 0.0, 1000.0, 1000.0],  # clamped -> idx 3
             [0.0, 0.0, 4.0, 4.0]]      # clamped -> idx 0
        ]
    )
    lv = np.asarray(assign_fpn_levels(boxes, 4))
    assert lv[0].tolist() == [2, 0, 1, 3, 3, 0]


def test_infer_scales():
    shapes = [(192, 384), (96, 192), (48, 96), (24, 48)]
    assert infer_scales(shapes, (768, 1536)) == [0.25, 0.125, 0.0625, 0.03125]


def test_multiscale_matches_per_level_oracle(rng):
    img = (64, 128)
    feats = [
        rng.normal(0, 1, (1, 16, 32, 4)).astype(np.float32),
        rng.normal(0, 1, (1, 8, 16, 4)).astype(np.float32),
        rng.normal(0, 1, (1, 4, 8, 4)).astype(np.float32),
        rng.normal(0, 1, (1, 2, 4, 4)).astype(np.float32),
    ]
    # One roi per expected level (areas chosen to hit levels 2..5).
    rois = np.array(
        [
            [2.0, 2.0, 40.0, 40.0],
            [0.0, 0.0, 100.0, 60.0],
            [0.0, 0.0, 128.0, 64.0],
            [0.0, 0.0, 128.0, 64.0],
        ],
        np.float32,
    )
    levels = np.asarray(assign_fpn_levels(jnp.asarray(rois)[None], 4))[0]
    got = np.asarray(
        multiscale_roi_align([jnp.asarray(f) for f in feats], jnp.asarray(rois)[None], img)
    )[0]
    scales = infer_scales([(16, 32), (8, 16), (4, 8), (2, 4)], img)
    for k in range(len(rois)):
        lv = int(levels[k])
        want = oracles.roi_align_single(feats[lv][0], rois[k], scales[lv])
        np.testing.assert_allclose(got[k], want, rtol=1e-4, atol=1e-5)
