"""resnet_fpn._conv's 1x1-as-GEMM path vs the conv_general lowering."""

import numpy as np
import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.models.resnet_fpn import _conv


def _conv_oracle(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=x.dtype,
    )


def test_1x1_gemm_matches_conv(rng):
    for stride, h, w_ in [(1, 17, 23), (2, 17, 23), (2, 16, 24)]:
        x = jnp.asarray(rng.normal(0, 1, (2, h, w_, 12)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 1, (1, 1, 12, 8)).astype(np.float32))
        got = jax.jit(lambda x, w: _conv(x, w, stride=stride))(x, w)
        want = _conv_oracle(x, w, stride)
        assert got.shape == want.shape, (stride, got.shape, want.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
