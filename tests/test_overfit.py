"""End-to-end learning check: overfit the detector heads on one image.

The strongest training-path evidence available without real datasets: with a
frozen random backbone, the ANN RPN + box heads must be able to memorise a
single synthetic image's box — losses must drop sharply and the top
detection must land on the ground truth.
"""

import numpy as np
import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.models.factory import (
    DetectorConfig,
    init_params,
)
from snn_automotive_object_detection_tpu.models.detector import detector_apply
from snn_automotive_object_detection_tpu.models.rpn import RPNConfig
from snn_automotive_object_detection_tpu.models.roi_heads import RoIConfig
from snn_automotive_object_detection_tpu.train.optim import (
    build_optimizer,
    merge_params,
    split_trainable,
)
from snn_automotive_object_detection_tpu.train.steps import make_train_step


def test_ann_detector_overfits_one_image(rng):
    cfg = DetectorConfig(
        num_classes=3, rpn_snn=False, detector_snn=False,
        min_size=64, max_size=128,
        rpn=RPNConfig(pre_nms_top_n_train=64, post_nms_top_n_train=32,
                      pre_nms_top_n_test=64, post_nms_top_n_test=32),
        roi=RoIConfig(batch_size_per_image=32, detections_per_img=5,
                      score_thresh=0.02),
        compute_dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    # Tame the random backbone's feature magnitude (pretrained backbones give
    # O(1) features; huge features make the 0.01-init RPN regressor start at
    # the delta clamp and converge too slowly for a unit test).
    params["backbone"]["fpn"] = jax.tree_util.tree_map(
        lambda x: x * 0.05, params["backbone"]["fpn"]
    )

    # One image: bright rectangle on structured noise.
    img = rng.uniform(0.0, 0.3, (1, 64, 128, 3)).astype(np.float32)
    img[0, 16:48, 40:88] = rng.uniform(0.7, 1.0, (32, 48, 3))
    gt_box = np.array([[40.0, 16.0, 88.0, 48.0]], np.float32)
    batch = {
        "images": jnp.asarray(img),
        "image_sizes": jnp.asarray([[64, 128]], jnp.int32),
        "original_sizes": jnp.asarray([[64, 128]], jnp.int32),
        "targets": {
            "boxes": jnp.asarray(gt_box)[None],
            "labels": jnp.asarray([[1]], jnp.int32),
            "valid": jnp.asarray([[True]]),
        },
    }

    trainable, frozen = split_trainable(params)
    optimizer = build_optimizer("AdamW", 1e-3)
    opt_state = optimizer.init(trainable)
    step = make_train_step(cfg, optimizer)

    key = jax.random.PRNGKey(7)
    first_loss = None
    for i in range(150):
        key, sub = jax.random.split(key)
        trainable, opt_state, losses = step(trainable, frozen, opt_state,
                                            batch, sub)
        if first_loss is None:
            first_loss = float(losses["loss_total"])
    final_loss = float(losses["loss_total"])
    assert final_loss < 0.5 * first_loss, (first_loss, final_loss)

    # Eval: top detection should sit on the GT box.
    merged = merge_params(trainable, frozen)
    det, _ = jax.jit(
        lambda p, b: detector_apply(p, b, cfg, training=False)
    )(merged, {k: v for k, v in batch.items() if k != "targets"})
    v = np.asarray(det["valid"])[0]
    assert v.any(), "no detections after overfitting"
    boxes = np.asarray(det["boxes"])[0][v]
    # IoU of the best detection against GT
    x1 = np.maximum(boxes[:, 0], gt_box[0, 0])
    y1 = np.maximum(boxes[:, 1], gt_box[0, 1])
    x2 = np.minimum(boxes[:, 2], gt_box[0, 2])
    y2 = np.minimum(boxes[:, 3], gt_box[0, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_d = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    area_g = (gt_box[0, 2] - gt_box[0, 0]) * (gt_box[0, 3] - gt_box[0, 1])
    iou = inter / (area_d + area_g - inter)
    assert iou.max() > 0.5, iou.max()


def test_snn_detector_loss_decreases(rng):
    """SNN training path: surrogate-gradient losses must decrease."""
    cfg = DetectorConfig(
        num_classes=3, rpn_snn=True, detector_snn=True, t_rpn=3, t_det=4,
        min_size=64, max_size=128,
        rpn=RPNConfig(pre_nms_top_n_train=64, post_nms_top_n_train=32,
                      pre_nms_top_n_test=64, post_nms_top_n_test=32),
        roi=RoIConfig(batch_size_per_image=16, detections_per_img=5),
        compute_dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    params["backbone"]["fpn"] = jax.tree_util.tree_map(
        lambda x: x * 0.05, params["backbone"]["fpn"]
    )
    # Scale SNN head weights so the LIF chain spikes from step ~1.
    params["rpn_head"] = jax.tree_util.tree_map(
        lambda x: x * 30.0, params["rpn_head"]
    )

    img = rng.uniform(0.0, 0.3, (1, 64, 128, 3)).astype(np.float32)
    img[0, 16:48, 40:88] = rng.uniform(0.7, 1.0, (32, 48, 3))
    batch = {
        "images": jnp.asarray(img),
        "image_sizes": jnp.asarray([[64, 128]], jnp.int32),
        "original_sizes": jnp.asarray([[64, 128]], jnp.int32),
        "targets": {
            "boxes": jnp.asarray([[[40.0, 16.0, 88.0, 48.0]]]),
            "labels": jnp.asarray([[1]], jnp.int32),
            "valid": jnp.asarray([[True]]),
        },
    }
    trainable, frozen = split_trainable(params)
    optimizer = build_optimizer("AdamW", 1e-3)
    opt_state = optimizer.init(trainable)
    step = make_train_step(cfg, optimizer)
    key = jax.random.PRNGKey(3)
    hist = []
    for i in range(40):
        key, sub = jax.random.split(key)
        trainable, opt_state, losses = step(trainable, frozen, opt_state,
                                            batch, sub)
        hist.append(float(losses["loss_total"]))
        assert np.isfinite(hist[-1]), (i, losses)
    # Surrogate-gradient SNN learning is slower than ANN; require a
    # clear downward trend rather than a large drop.
    assert min(hist[-5:]) < max(hist[:5]) - 0.25, (hist[:5], hist[-5:])
