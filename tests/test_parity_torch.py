"""Cross-framework parity: JAX model vs the torch mirror, same weights.

The mirror (tools/torch_mirror.py) reimplements the reference pipeline in
plain torch with torchvision state-dict key names; converting its state_dict
through utils.checkpoint.convert_torch_state_dict and comparing stage outputs
validates BOTH the converter's layout mapping and the JAX compute path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from snn_automotive_object_detection_tpu.utils.checkpoint import (
    convert_torch_state_dict,
)
from snn_automotive_object_detection_tpu.models.resnet_fpn import resnet50_fpn_apply
from snn_automotive_object_detection_tpu.models import heads
from snn_automotive_object_detection_tpu.ops.roi_align import multiscale_roi_align
from tools import torch_mirror as tm


@pytest.fixture(scope="module")
def mirror_and_params():
    torch.manual_seed(0)
    mirror = tm.MirrorDetector(num_classes=5, t_rpn=3, t_det=4)
    # Give BN stats non-trivial values so folding is actually exercised.
    with torch.no_grad():
        for m in mirror.modules():
            if isinstance(m, tm.FrozenBN):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)
                m.weight.uniform_(0.8, 1.2)
                m.bias.normal_(0, 0.05)
        # Random normal(0.01) RPN weights barely drive the LIF chain at
        # small T — scale them so the head actually spikes and produces
        # well-separated objectness (needed by the e2e proposal test).
        mirror.rpn.head.shared_conv.weight.mul_(30.0)
        mirror.rpn.head.conv_cls.weight.mul_(30.0)
        mirror.rpn.head.conv_bbox.weight.mul_(10.0)
    params = convert_torch_state_dict(mirror.state_dict(), rpn_snn=True,
                                      detector_snn=True)
    return mirror, params


def test_backbone_parity(mirror_and_params, rng):
    mirror, params = mirror_and_params
    x = rng.uniform(0, 1, (1, 3, 64, 128)).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in mirror.backbone(torch.as_tensor(x))]
    got = resnet50_fpn_apply(
        params["backbone"], jnp.asarray(x.transpose(0, 2, 3, 1)),
        compute_dtype=jnp.float32,
    )
    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, rtol=1e-3, atol=2e-4)


def test_rpn_head_parity(mirror_and_params, rng):
    mirror, params = mirror_and_params
    feats = [rng.normal(0, 1.0, (1, 256, 8, 16)).astype(np.float32),
             rng.normal(0, 1.0, (1, 256, 4, 8)).astype(np.float32)]
    with torch.no_grad():
        want_o, want_b = mirror.rpn.head([torch.as_tensor(f) for f in feats])
    got_o, got_b, _ = heads.rpn_head_snn_apply(
        params["rpn_head"],
        [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats],
        num_steps=3, compute_dtype=jnp.float32,
    )
    for g, w in zip(got_o, want_o):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(), rtol=1e-3, atol=1e-4
        )
    for g, w in zip(got_b, want_b):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(), rtol=1e-3, atol=1e-4
        )


def test_roi_align_and_box_head_parity(mirror_and_params, rng):
    mirror, params = mirror_and_params
    img_size = (64, 128)
    feats_t = [torch.as_tensor(rng.normal(0, 1, (1, 256, h, w)).astype(np.float32))
               for h, w in [(16, 32), (8, 16), (4, 8), (2, 4)]]
    boxes = np.array(
        [[4.0, 4.0, 60.0, 40.0], [0.0, 0.0, 120.0, 60.0], [30.0, 10.0, 50.0, 28.0]],
        np.float32,
    )
    with torch.no_grad():
        pooled_t = tm.roi_align_ms(feats_t, torch.as_tensor(boxes), img_size)
        want_cls, want_reg = mirror.roi_heads.box_head_and_predictor(pooled_t)

    pooled_j = multiscale_roi_align(
        [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t],
        jnp.asarray(boxes)[None], img_size,
    )[0]
    np.testing.assert_allclose(
        np.asarray(pooled_j).transpose(0, 3, 1, 2), pooled_t.numpy(),
        rtol=1e-4, atol=1e-5,
    )

    flat = pooled_j.reshape(3, -1)  # (7,7,C) flattening; converter permuted fc6
    got_cls, got_reg, _ = heads.fastrcnn_snn_apply(
        params["box_head"], flat, num_steps=4, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got_cls), want_cls.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_reg), want_reg.numpy(),
                               rtol=1e-3, atol=1e-4)
