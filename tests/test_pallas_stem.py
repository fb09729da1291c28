"""Fused Pallas stem (ops/pallas_stem.py) vs the XLA stem chain.

The kernel fuses normalize + 7x7/2 conv + frozen-BN + ReLU + maxpool3x3/2
(resnet_fpn.resnet50_fpn_apply:166-174 + models/transform.normalize_images)
on a planar s2d input. f32 interpret-mode must match the XLA f32 chain to
reduction-order tolerance, including all four borders and the bucket-pad
region; bf16 to bf16-rounding tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.models.resnet_fpn import (
    _conv,
    _max_pool,
)
from snn_automotive_object_detection_tpu.ops.pallas_stem import (
    planarize_image,
    planarize_image_np,
    stem_pallas_apply,
    unplanarize_image,
)

MEAN = (0.2869, 0.3251, 0.2839)
STD = (0.1870, 0.1902, 0.1872)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _stem_params(seed=0):
    k = jax.random.PRNGKey(seed)
    w = jax.random.normal(k, (7, 7, 3, 64), jnp.float32) * 0.11
    scale = jax.random.uniform(jax.random.fold_in(k, 1), (64,)) + 0.5
    bias = jax.random.normal(jax.random.fold_in(k, 2), (64,)) * 0.2
    return {"w": w, "bn": {"scale": scale, "bias": bias}}


def _stem_xla(params, x, dtype):
    """The production XLA chain (normalize -> cast -> conv -> BN -> ReLU ->
    pool), exactly as detector_apply + resnet50_fpn_apply run it."""
    xn = (x - jnp.asarray(MEAN, x.dtype)) / jnp.asarray(STD, x.dtype)
    y = _conv(xn.astype(dtype), params["w"], stride=2,
              padding=[(3, 3), (3, 3)])
    y = y * params["bn"]["scale"].astype(dtype) + params["bn"][
        "bias"].astype(dtype)
    y = jax.nn.relu(y)
    return _max_pool(y, 3, 2, (1, 1))


def test_planarize_round_trip(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 256, 3)).astype(np.float32))
    xp = planarize_image(x, MEAN)
    assert xp.shape == (2, 20, 16, 128)
    np.testing.assert_array_equal(np.asarray(unplanarize_image(xp)),
                                  np.asarray(x))
    # plane semantics: c12 = subH*6 + subW*3 + cin
    xpn = np.asarray(xp)
    xn = np.asarray(x)
    # rows-outermost: row r = s2d row r-3; plane = subH*6 + subW*3 + cin
    assert np.array_equal(xpn[:, 3:-1, 0], xn[:, 0::2, 0::2, 0])
    assert np.array_equal(xpn[:, 3:-1, 5], xn[:, 0::2, 1::2, 2])
    assert np.array_equal(xpn[:, 3:-1, 7], xn[:, 1::2, 0::2, 1])
    # pad rows hold the per-channel raw mean
    assert np.allclose(xpn[:, 0, 1], MEAN[1])
    assert np.allclose(xpn[:, -1, 3], MEAN[0])


def test_planarize_np_matches_jax(rng):
    x = rng.uniform(0, 1, (2, 32, 256, 3)).astype(np.float32)
    a = planarize_image_np(x, MEAN)
    b = np.asarray(planarize_image(jnp.asarray(x), MEAN))
    np.testing.assert_array_equal(a, b)


def test_detector_accepts_planar_only_batch(rng):
    """A batch carrying only images_p must produce identical detections to
    the raw-images batch (CPU: the unplanarize fallback feeds the XLA
    stem; on TPU the Pallas stem consumes images_p directly)."""
    from snn_automotive_object_detection_tpu.models.detector import (
        detector_apply,
    )
    from snn_automotive_object_detection_tpu.models.factory import (
        DetectorConfig,
        init_params,
    )

    config = DetectorConfig(num_classes=3, rpn_snn=True, detector_snn=True,
                            t_rpn=2, t_det=2, min_size=64, max_size=128)
    params = init_params(config, jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 128, 3)).astype(np.float32))
    base = {
        "image_sizes": jnp.asarray([[64, 128]], jnp.int32),
        "original_sizes": jnp.asarray([[128, 256]], jnp.int32),
    }
    det_a, _ = detector_apply(params, {**base, "images": x}, config,
                              training=False)
    det_b, _ = detector_apply(
        params,
        {**base, "images_p": planarize_image(x, config.image_mean)},
        config, training=False,
    )
    np.testing.assert_array_equal(np.asarray(det_a["boxes"]),
                                  np.asarray(det_b["boxes"]))
    np.testing.assert_array_equal(np.asarray(det_a["scores"]),
                                  np.asarray(det_b["scores"]))


def test_stem_kernel_f32_matches_xla(rng):
    params = _stem_params()
    x = jnp.asarray(rng.uniform(0, 1, (2, 128, 256, 3)).astype(np.float32))
    want = _stem_xla(params, x, jnp.float32)

    got = stem_pallas_apply(params, planarize_image(x, MEAN), MEAN, STD,
                            state_dtype=jnp.float32, interpret=True)
    assert got.shape == want.shape == (2, 32, 64, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_stem_kernel_bucket_pad_region(rng):
    """Images smaller than the bucket are zero-padded (data/loader.py); the
    kernel must reproduce the XLA stem there too (zeros are REAL values
    after normalization — reference GeneralizedRCNNTransform.batch_images
    semantics as implemented in the XLA path)."""
    params = _stem_params(1)
    x = rng.uniform(0, 1, (1, 128, 256, 3)).astype(np.float32)
    x[:, 96:, :, :] = 0.0   # bucket padding rows
    x[:, :, 200:, :] = 0.0  # bucket padding cols
    x = jnp.asarray(x)
    want = _stem_xla(params, x, jnp.float32)
    got = stem_pallas_apply(params, planarize_image(x, MEAN), MEAN, STD,
                            state_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_stem_kernel_bf16_close_to_xla(rng):
    """bf16 production variant: per-op rounding differs from XLA's, so the
    match is at bf16 resolution, not exact."""
    params = _stem_params(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 256, 3)).astype(np.float32))
    want = np.asarray(_stem_xla(params, x, jnp.bfloat16)).astype(np.float32)
    got = np.asarray(
        stem_pallas_apply(params, planarize_image(x, MEAN), MEAN, STD,
                          state_dtype=jnp.bfloat16, interpret=True)
    ).astype(np.float32)
    assert got.shape == want.shape
    scale = max(1.0, float(np.abs(want).max()))
    err = np.abs(got - want) / scale
    assert float(err.max()) < 0.03, float(err.max())
    assert float(err.mean()) < 2e-3, float(err.mean())
