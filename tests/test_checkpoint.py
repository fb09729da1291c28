"""Checkpoint conversion (ANN variant keys) + lenient loading tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from snn_automotive_object_detection_tpu.models.factory import (
    DetectorConfig,
    init_params,
)
from snn_automotive_object_detection_tpu.utils.checkpoint import (
    convert_torch_state_dict,
    load_weights_lenient,
)


def _ann_head_state_dict():
    """Synthetic torchvision-layout state dict for the ANN RPN + RoI heads."""
    sd = {}
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.01

    # ANN RPN head (tv 0.13 wraps the conv in a Sequential -> conv.0.0.*)
    sd["rpn.head.conv.0.0.weight"] = t(256, 256, 3, 3)
    sd["rpn.head.conv.0.0.bias"] = t(256)
    sd["rpn.head.cls_logits.weight"] = t(3, 256, 1, 1)
    sd["rpn.head.cls_logits.bias"] = t(3)
    sd["rpn.head.bbox_pred.weight"] = t(12, 256, 1, 1)
    sd["rpn.head.bbox_pred.bias"] = t(12)
    # TwoMLPHead + FastRCNNPredictor
    sd["roi_heads.box_head.fc6.weight"] = t(1024, 12544)
    sd["roi_heads.box_head.fc6.bias"] = t(1024)
    sd["roi_heads.box_head.fc7.weight"] = t(1024, 1024)
    sd["roi_heads.box_head.fc7.bias"] = t(1024)
    sd["roi_heads.box_predictor.cls_score.weight"] = t(5, 1024)
    sd["roi_heads.box_predictor.cls_score.bias"] = t(5)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = t(20, 1024)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = t(20)
    return sd


def test_convert_ann_heads(rng):
    from tools.torch_mirror import MirrorDetector

    torch.manual_seed(1)
    mirror = MirrorDetector(num_classes=5)
    sd = dict(mirror.state_dict())
    # Drop the SNN head keys, add ANN head keys.
    sd = {k: v for k, v in sd.items()
          if not k.startswith(("rpn.head", "roi_heads"))}
    sd.update(_ann_head_state_dict())

    params = convert_torch_state_dict(sd, rpn_snn=False, detector_snn=False)
    assert params["rpn_head"]["conv"]["w"].shape == (3, 3, 256, 256)
    assert params["rpn_head"]["cls_logits"]["b"].shape == (3,)
    assert params["box_head"]["fc6"]["w"].shape == (12544, 1024)
    assert "b" in params["box_head"]["fc6"]
    assert params["box_predictor"]["bbox_pred"]["w"].shape == (1024, 20)

    # fc6 row permutation: feature (c, h, w) -> (h, w, c).
    w_t = sd["roi_heads.box_head.fc6.weight"].numpy()  # [1024, 12544]
    w_j = np.asarray(params["box_head"]["fc6"]["w"])   # [12544, 1024]
    c, res = 256, 7
    # torch input index for (h, w, c) = c*49 + h*7 + w
    h_, w_, c_ = 3, 4, 17
    torch_idx = c_ * 49 + h_ * 7 + w_
    jax_idx = (h_ * 7 + w_) * 256 + c_
    np.testing.assert_allclose(w_j[jax_idx], w_t[:, torch_idx])


def test_lenient_load_keeps_mismatched(rng):
    cfg = DetectorConfig(num_classes=4, min_size=64, max_size=128,
                         compute_dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    loaded = init_params(cfg, jax.random.PRNGKey(1))
    # Corrupt one leaf's shape and drop another.
    loaded["box_head"]["cls_score"]["w"] = loaded["box_head"]["cls_score"]["w"][:, :2]
    del loaded["rpn_head"]["conv_cls"]

    # Different tree structure -> flatten-path merge keeps current values.
    merged = load_weights_lenient(params, loaded, verbose=False)
    np.testing.assert_array_equal(
        np.asarray(merged["box_head"]["fc6"]["w"]),
        np.asarray(loaded["box_head"]["fc6"]["w"]),
    )
    np.testing.assert_array_equal(
        np.asarray(merged["box_head"]["cls_score"]["w"]),
        np.asarray(params["box_head"]["cls_score"]["w"]),
    )
    np.testing.assert_array_equal(
        np.asarray(merged["rpn_head"]["conv_cls"]["w"]),
        np.asarray(params["rpn_head"]["conv_cls"]["w"]),
    )


def test_only_one_bbox_pops_mismatched_bbox_pred(tmp_path):
    """--only-one-bbox surgery (train.py:669-675): a per-class bbox_pred is
    POPPED from the checkpoint so the model keeps its fresh 4-output init."""
    from tools.torch_mirror import MirrorDetector
    from snn_automotive_object_detection_tpu.utils.checkpoint import (
        load_torch_checkpoint,
    )

    torch.manual_seed(2)
    mirror = MirrorDetector(num_classes=5)  # per-class: bbox_pred out = 20
    path = tmp_path / "ckpt.pth"
    torch.save({"model": mirror.state_dict()}, path)

    loaded = load_torch_checkpoint(str(path), only_one_bbox=True)
    assert "bbox_pred" not in loaded["box_head"]  # popped, not sliced

    cfg = DetectorConfig(num_classes=5, rpn_snn=True, detector_snn=True,
                         only_one_bbox=True, min_size=64, max_size=128,
                         compute_dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    merged = load_weights_lenient(params, loaded, verbose=False)
    # fresh 4-output init survives; other leaves come from the checkpoint
    assert merged["box_head"]["bbox_pred"]["w"].shape[1] == 4
    np.testing.assert_array_equal(
        np.asarray(merged["box_head"]["bbox_pred"]["w"]),
        np.asarray(params["box_head"]["bbox_pred"]["w"]),
    )
    np.testing.assert_array_equal(
        np.asarray(merged["box_head"]["fc7"]["w"]),
        np.asarray(loaded["box_head"]["fc7"]["w"]),
    )

    # A matching (4-output) checkpoint is NOT popped.
    mirror4 = MirrorDetector(num_classes=5, only_one_bbox=True)
    path4 = tmp_path / "ckpt4.pth"
    torch.save({"model": mirror4.state_dict()}, path4)
    loaded4 = load_torch_checkpoint(str(path4), only_one_bbox=True)
    assert loaded4["box_head"]["bbox_pred"]["w"].shape[1] == 4


def test_pretrained_backbone_classification_state_dict(tmp_path):
    """--pretrained-backbone analog (VERDICT r4 #7): a BARE torchvision
    ImageNet classification state_dict (trunk keys only, fc head, NO FPN
    keys) seeds the backbone trunk; FPN + detection heads keep their fresh
    init. Reference: model.py:28-31, faster_rcnn.py:693-699."""
    from tools.torch_mirror import MirrorDetector
    from snn_automotive_object_detection_tpu.utils.checkpoint import (
        convert_torch_backbone_state_dict,
        load_torch_backbone,
    )

    torch.manual_seed(3)
    mirror = MirrorDetector(num_classes=5)
    # Build the bare classification layout: strip the detector prefix from
    # trunk keys, drop FPN/head keys, add a classification fc head.
    sd = {}
    for k, v in mirror.state_dict().items():
        if k.startswith("backbone.body."):
            sd[k[len("backbone.body."):]] = v
    assert not any(k.startswith("fpn") for k in sd)
    sd["fc.weight"] = torch.randn(1000, 2048)
    sd["fc.bias"] = torch.randn(1000)

    partial = convert_torch_backbone_state_dict(sd)
    assert set(partial) == {"backbone"}
    assert "fpn" not in partial["backbone"]

    config = DetectorConfig(num_classes=6, t_rpn=2, t_det=2,
                            min_size=64, max_size=128)
    init = init_params(config, jax.random.PRNGKey(0))
    merged = load_weights_lenient(init, partial, verbose=False)

    # Trunk leaves match the torch weights (stem conv, a deep block conv).
    np.testing.assert_allclose(
        np.asarray(merged["backbone"]["stem"]["w"]),
        np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(merged["backbone"]["layer3"][2]["conv2"]["w"]),
        np.transpose(sd["layer3.2.conv2.weight"].numpy(), (2, 3, 1, 0)),
        atol=1e-6)
    # FPN and heads keep the fresh init.
    for sub in ("fpn",):
        a = jax.tree_util.tree_leaves(merged["backbone"][sub])
        b = jax.tree_util.tree_leaves(init["backbone"][sub])
        assert all(np.array_equal(x, y) for x, y in zip(a, b))
    for sub in ("rpn_head", "box_head"):
        a = jax.tree_util.tree_leaves(merged[sub])
        b = jax.tree_util.tree_leaves(init[sub])
        assert all(np.array_equal(x, y) for x, y in zip(a, b))

    # File round-trip through load_torch_backbone (full-ckpt dict wrapper).
    path = str(tmp_path / "resnet50_imagenet.pth")
    torch.save(sd, path)
    partial2 = load_torch_backbone(path)
    np.testing.assert_allclose(
        np.asarray(partial2["backbone"]["stem"]["w"]),
        np.asarray(partial["backbone"]["stem"]["w"]))
