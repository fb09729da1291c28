"""Tests for optimizers, schedules and freeze-mask parameter splitting."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from snn_automotive_object_detection_tpu.models.factory import (
    DetectorConfig,
    init_params,
)
from snn_automotive_object_detection_tpu.train.optim import (
    build_optimizer,
    build_schedule,
    merge_params,
    split_trainable,
)


def test_multistep_schedule():
    sched = build_schedule(1.0, steps_per_epoch=10, milestones=[2, 4], gamma=0.5)
    assert float(sched(0)) == 1.0
    assert float(sched(19)) == 1.0
    assert float(sched(20)) == 0.5   # epoch 2
    assert float(sched(39)) == 0.5
    assert float(sched(40)) == 0.25  # epoch 4


def test_steplr_schedule():
    sched = build_schedule(1.0, steps_per_epoch=5, step_size=3, gamma=0.1)
    assert float(sched(0)) == 1.0
    assert float(sched(14)) == 1.0   # epoch 2
    assert abs(float(sched(15)) - 0.1) < 1e-6  # epoch 3


def test_constant_lr_first_epoch():
    sched = build_schedule(1.0, steps_per_epoch=4, constant_factor=0.1)
    assert abs(float(sched(0)) - 0.1) < 1e-6
    assert float(sched(4)) == 1.0


def test_constant_lr_composes_with_multistep():
    # The reference chains ConstantLR on top of the base scheduler
    # (train.py:748-755): factor applies in epoch 0, milestones still decay.
    sched = build_schedule(1.0, steps_per_epoch=10, milestones=[2],
                           gamma=0.5, constant_factor=0.1)
    assert abs(float(sched(0)) - 0.1) < 1e-6   # epoch 0: factored
    assert abs(float(sched(10)) - 1.0) < 1e-6  # epoch 1: base lr
    assert abs(float(sched(20)) - 0.5) < 1e-6  # epoch 2: milestone decay


def test_constant_lr_composes_with_steplr():
    sched = build_schedule(1.0, steps_per_epoch=5, step_size=3, gamma=0.1,
                           constant_factor=0.5)
    assert abs(float(sched(0)) - 0.5) < 1e-6
    assert abs(float(sched(5)) - 1.0) < 1e-6
    assert abs(float(sched(15)) - 0.1) < 1e-6


def test_split_and_merge_roundtrip():
    cfg = DetectorConfig(num_classes=4, min_size=64, max_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    for kw in [{}, {"freeze_fpn": True}, {"freeze_rpn": True},
               {"freeze_detector": True}]:
        tr, fr = split_trainable(params, **kw)
        merged = merge_params(tr, fr)
        la, lb = jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(merged)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Default: ResNet body frozen; FPN frozen too — the detector
    # stop_gradients the backbone output (reference no_grad quirk), so FPN
    # grads are identically zero and a "trainable" FPN would only suffer
    # AdamW weight decay torch never applies (grad-None params are skipped).
    tr, fr = split_trainable(params)
    assert "backbone" in fr and "backbone_fpn" in fr
    assert "rpn_head" in tr and "box_head" in tr


def test_optimizer_updates_only_trainable():
    cfg = DetectorConfig(num_classes=4, min_size=64, max_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tr, fr = split_trainable(params, freeze_rpn=True)
    assert "rpn_head" in fr
    opt = build_optimizer("SGD", 0.1)
    state = opt.init(tr)
    grads = jax.tree_util.tree_map(jnp.ones_like, tr)
    updates, _ = opt.update(grads, state, tr)
    new_tr = optax.apply_updates(tr, updates)
    a = jax.tree_util.tree_leaves(tr)[0]
    b = jax.tree_util.tree_leaves(new_tr)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_train_backbone_extension_grads_flow():
    """train_backbone=True (factory.DetectorConfig extension) must route
    gradients into the ResNet body; default keeps them zero (reference
    no_grad semantics, generalized_rcnn.py:93-94)."""
    import dataclasses

    from snn_automotive_object_detection_tpu.models.detector import (
        detector_apply,
    )

    cfg = DetectorConfig(num_classes=3, t_rpn=2, t_det=2,
                         min_size=64, max_size=128, compute_dtype=jnp.float32,
                         rpn_pallas=False, roi_pallas=False)
    params = init_params(cfg, jax.random.PRNGKey(0))
    batch = {
        "images": jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 128, 3)),
        "image_sizes": jnp.asarray([[64, 128]], jnp.int32),
        "original_sizes": jnp.asarray([[64, 128]], jnp.int32),
        "targets": {
            "boxes": jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]]),
            "labels": jnp.asarray([[1]], jnp.int32),
            "valid": jnp.asarray([[True]]),
        },
    }

    def loss(params, config):
        _, losses = detector_apply(params, batch, config, training=True,
                                   rng=jax.random.PRNGKey(2))
        return sum(losses.values())

    g_frozen = jax.grad(loss)(params, cfg)
    g_train = jax.grad(loss)(
        params, dataclasses.replace(cfg, train_backbone=True)
    )
    stem_frozen = np.abs(np.asarray(g_frozen["backbone"]["stem"]["w"])).sum()
    stem_train = np.abs(np.asarray(g_train["backbone"]["stem"]["w"])).sum()
    assert stem_frozen == 0.0
    assert stem_train > 0.0

    tr, fr = split_trainable(params, train_backbone=True)
    assert "backbone" in tr
    merged = merge_params(tr, fr)
    assert len(jax.tree_util.tree_leaves(merged)) == len(
        jax.tree_util.tree_leaves(params)
    )


def test_train_backbone_bf16_grads_compute():
    """bf16 train_backbone must not hit the conv transpose dtype mismatch
    (resnet_fpn._conv emits the operand dtype for this reason)."""
    import dataclasses

    from snn_automotive_object_detection_tpu.models.detector import (
        detector_apply,
    )

    cfg = DetectorConfig(num_classes=3, t_rpn=2, t_det=2,
                         min_size=64, max_size=128,
                         compute_dtype=jnp.bfloat16,
                         rpn_pallas=False, roi_pallas=False,
                         train_backbone=True)
    params = init_params(cfg, jax.random.PRNGKey(0))
    batch = {
        "images": jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 128, 3)),
        "image_sizes": jnp.asarray([[64, 128]], jnp.int32),
        "original_sizes": jnp.asarray([[64, 128]], jnp.int32),
        "targets": {
            "boxes": jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]]),
            "labels": jnp.asarray([[1]], jnp.int32),
            "valid": jnp.asarray([[True]]),
        },
    }

    def loss(params):
        _, losses = detector_apply(params, batch, cfg, training=True,
                                   rng=jax.random.PRNGKey(2))
        return sum(losses.values())

    g = jax.grad(loss)(params)
    assert np.abs(np.asarray(g["backbone"]["stem"]["w"])).sum() > 0.0


def test_trainable_backbone_layers_partition_and_grads():
    """--trainable-backbone-layers 3 (reference train.py:66): layer2-4 +
    FPN + heads train; stem/layer1 stay frozen with ZERO gradients (the
    stop_gradient boundary sits at layer2's input)."""
    import dataclasses

    from snn_automotive_object_detection_tpu.models.detector import (
        detector_apply,
    )

    cfg = DetectorConfig(num_classes=3, t_rpn=2, t_det=2,
                         min_size=64, max_size=128, compute_dtype=jnp.float32,
                         rpn_pallas=False, roi_pallas=False,
                         trainable_backbone_layers=3)
    assert cfg.backbone_trainable_stages == 3
    params = init_params(cfg, jax.random.PRNGKey(0))

    # Partition: layer2-4 trainable, stem/layer1 frozen, FPN trainable.
    tr, fr = split_trainable(params, trainable_backbone_layers=3)
    assert set(tr["backbone"]) == {"layer2", "layer3", "layer4"}
    assert set(fr["backbone"]) == {"stem", "layer1"}
    assert "backbone_fpn" in tr
    merged = merge_params(tr, fr)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    batch = {
        "images": jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 128, 3)),
        "image_sizes": jnp.asarray([[64, 128]], jnp.int32),
        "original_sizes": jnp.asarray([[64, 128]], jnp.int32),
        "targets": {
            "boxes": jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]]),
            "labels": jnp.asarray([[1]], jnp.int32),
            "valid": jnp.asarray([[True]]),
        },
    }

    def loss(params):
        _, losses = detector_apply(params, batch, cfg, training=True,
                                   rng=jax.random.PRNGKey(2))
        return sum(losses.values())

    g = jax.grad(loss)(params)

    def total(tree):
        return sum(float(np.abs(np.asarray(x)).sum())
                   for x in jax.tree_util.tree_leaves(tree))

    assert total(g["backbone"]["stem"]) == 0.0
    assert total(g["backbone"]["layer1"]) == 0.0
    for name in ("layer2", "layer3", "layer4", "fpn"):
        assert total(g["backbone"][name]) > 0.0, name
    assert total(g["rpn_head"]) > 0.0


def test_trainable_backbone_layers_loss_decreases():
    """A few optimizer steps at layers=3 reduce the training loss."""
    from snn_automotive_object_detection_tpu.train.steps import make_train_step

    cfg = DetectorConfig(num_classes=3, t_rpn=2, t_det=2,
                         min_size=64, max_size=128, compute_dtype=jnp.float32,
                         rpn_pallas=False, roi_pallas=False,
                         trainable_backbone_layers=3)
    params = init_params(cfg, jax.random.PRNGKey(0))
    trainable, frozen = split_trainable(params, trainable_backbone_layers=3)
    opt = build_optimizer("AdamW", 3e-4)
    opt_state = opt.init(trainable)
    step = make_train_step(cfg, opt)

    batch = {
        "images": jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 128, 3)),
        "image_sizes": jnp.asarray([[64, 128]], jnp.int32),
        "original_sizes": jnp.asarray([[64, 128]], jnp.int32),
        "targets": {
            "boxes": jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]]),
            "labels": jnp.asarray([[1]], jnp.int32),
            "valid": jnp.asarray([[True]]),
        },
    }
    losses = []
    for i in range(10):
        trainable, opt_state, l = step(trainable, frozen, opt_state, batch,
                                       jax.random.PRNGKey(7))
        losses.append(float(l["loss_total"]))
    # Single-batch SGD bounces step to step; compare window means.
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses

    # Frozen leaves are bit-identical after training.
    merged = merge_params(trainable, frozen)
    for part in ("stem", "layer1"):
        for a, b in zip(jax.tree_util.tree_leaves(params["backbone"][part]),
                        jax.tree_util.tree_leaves(merged["backbone"][part])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
