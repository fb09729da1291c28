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
        (1, 4, 8, 256),    # "0": features[13] output, stride 32
        (1, 4, 8, 256),    # "1": final conv, stride 32
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


# ------------------------------------------------- .pth conversion parity


def _mobile_mirror(num_classes=5, t=2):
    import pytest
    torch = pytest.importorskip("torch")
    from tools import torch_mirror as tm

    torch.manual_seed(0)
    m = tm.MirrorDetector(num_classes=num_classes, t_rpn=t, t_det=t,
                          backbone="mobilenet")
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tm.FrozenBN):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.7, 1.3)
                mod.weight.uniform_(0.8, 1.2)
                mod.bias.normal_(0, 0.05)
        for conv in m.backbone.fpn.layer_blocks:
            conv.weight.mul_(8.0)
            conv.bias.mul_(8.0)
        m.rpn.head.shared_conv.weight.mul_(6.0)
        m.rpn.head.conv_cls.weight.mul_(6.0)
        m.rpn.head.conv_bbox.weight.mul_(2.0)
        h = m.roi_heads.box_head_and_predictor
        h.fc6.weight.mul_(2.0)
        h.fc7.weight.mul_(2.0)
        h.cls_score.weight.mul_(60.0)
        h.bbox_pred.weight.mul_(0.5)
    m.pre_nms = 64
    m.post_nms = 32
    m.detections_per_img = 8
    return m


def test_mobilenet_pth_conversion_backbone_parity(rng):
    """torchvision-layout mobilenet state_dict -> convert -> identical
    feature maps (validates every layout permutation in the converter's
    mobilenet branch, incl. depthwise convs, SE 1x1s, frozen-BN folding)."""
    import pytest
    torch = pytest.importorskip("torch")

    from snn_automotive_object_detection_tpu.utils.checkpoint import (
        convert_torch_state_dict,
    )

    m = _mobile_mirror()
    params = convert_torch_state_dict(m.state_dict(), rpn_snn=True,
                                      detector_snn=True)
    x = rng.uniform(0, 1, (1, 3, 128, 256)).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in m.backbone(torch.as_tensor(x))]
    got = mobilenet_v3_fpn_apply(
        params["backbone"], jnp.asarray(x.transpose(0, 2, 3, 1)),
        compute_dtype=jnp.float32,
    )
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, rtol=1e-3, atol=2e-4)


def test_mobilenet_pth_conversion_e2e_detections(rng):
    """Full converted-mobilenet detector matches the torch mirror's
    detections (VERDICT r3 #6 round-trip)."""
    import pytest
    torch = pytest.importorskip("torch")

    from snn_automotive_object_detection_tpu.utils.checkpoint import (
        convert_torch_state_dict,
    )

    t = 2
    m = _mobile_mirror(t=t)
    params = convert_torch_state_dict(m.state_dict(), rpn_snn=True,
                                      detector_snn=True)
    h, w = 128, 256
    img = rng.uniform(0, 1, (3, h, w)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.as_tensor(img)[None], (h, w))

    cfg = DetectorConfig(
        num_classes=5, backbone="mobilenet_v3_large_fpn",
        rpn_snn=True, detector_snn=True, t_rpn=t, t_det=t,
        min_size=h, max_size=w,
        image_mean=(0.2869, 0.3251, 0.2839),
        image_std=(0.1870, 0.1902, 0.1872),
        rpn=RPNConfig(pre_nms_top_n_test=64, post_nms_top_n_test=32),
        roi=RoIConfig(detections_per_img=8),
        compute_dtype=jnp.float32,
    )
    batch = {
        "images": jnp.asarray(img.transpose(1, 2, 0))[None],
        "image_sizes": jnp.asarray([[h, w]], jnp.int32),
        "original_sizes": jnp.asarray([[h, w]], jnp.int32),
    }
    det, _ = jax.jit(
        lambda p, b: detector_apply(p, b, cfg, training=False)
    )(params, batch)
    v = np.asarray(det["valid"][0]) & (np.asarray(det["labels"][0]) > 0)
    got_boxes = np.asarray(det["boxes"][0])[v]
    got_scores = np.asarray(det["scores"][0])[v]
    got_labels = np.asarray(det["labels"][0])[v]
    order = np.argsort(-got_scores, kind="stable")
    got_boxes, got_scores, got_labels = (
        got_boxes[order], got_scores[order], got_labels[order])

    wb = want["boxes"].numpy()
    ws = want["scores"].numpy()
    wl = want["labels"].numpy()
    worder = np.argsort(-ws, kind="stable")
    wb, ws, wl = wb[worder], ws[worder], wl[worder]

    assert len(got_scores) == len(ws)
    np.testing.assert_array_equal(got_labels, wl)
    np.testing.assert_allclose(got_scores, ws, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got_boxes, wb, rtol=1e-3, atol=0.05)
