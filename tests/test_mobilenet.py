"""MobileNetV3-Large FPN model family: shapes + end-to-end forward."""

import numpy as np
import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.models.factory import (
    DetectorConfig,
    init_params,
)
from snn_automotive_object_detection_tpu.models.detector import detector_apply
from snn_automotive_object_detection_tpu.models.mobilenet_fpn import (
    init_mobilenet_v3_fpn,
    mobilenet_v3_fpn_apply,
)
from snn_automotive_object_detection_tpu.models.rpn import RPNConfig
from snn_automotive_object_detection_tpu.models.roi_heads import RoIConfig


def test_backbone_shapes(rng):
    params = init_mobilenet_v3_fpn(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 256, 3)).astype(np.float32))
    outs = mobilenet_v3_fpn_apply(params, x, compute_dtype=jnp.float32)
    assert [tuple(o.shape) for o in outs] == [
        (1, 8, 16, 256),   # P4 stride 16
        (1, 4, 8, 256),    # P5 stride 32
        (1, 2, 4, 256),    # pool stride 64
    ]
    for o in outs:
        assert bool(jnp.isfinite(o).all())


def test_mobilenet_detector_eval(rng):
    cfg = DetectorConfig(
        num_classes=5, backbone="mobilenet_v3_large_fpn",
        rpn_snn=True, detector_snn=True, t_rpn=2, t_det=2,
        min_size=128, max_size=256,
        rpn=RPNConfig(pre_nms_top_n_test=64, post_nms_top_n_test=32),
        roi=RoIConfig(detections_per_img=8),
        compute_dtype=jnp.float32,
    )
    assert cfg.num_anchors_per_location == 15
    params = init_params(cfg, jax.random.PRNGKey(0))
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (1, 128, 256, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[128, 256]], jnp.int32),
        "original_sizes": jnp.asarray([[256, 512]], jnp.int32),
    }
    det, losses = jax.jit(
        lambda p, b: detector_apply(p, b, cfg, training=False)
    )(params, batch)
    assert losses == {}
    assert det["boxes"].shape == (1, 8 + 32, 4)
    assert np.isfinite(np.asarray(det["boxes"])).all()
