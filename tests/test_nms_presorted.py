"""presorted=True nms_mask must equal the argsort path bit-for-bit when
the caller's order contract holds (descending over valid entries)."""

import numpy as np
import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.ops import nms as nms_ops


def test_presorted_matches_argsort_path(rng):
    n = 600
    scores = np.sort(rng.uniform(0.01, 1.0, n).astype(np.float32))[::-1].copy()
    boxes = rng.uniform(0, 300, (n, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2]
    valid = rng.uniform(size=n) > 0.15  # interleaved invalid rows

    keep_a, _ = jax.jit(
        lambda b, s, v: nms_ops.nms_mask(b, s, v, 0.6)
    )(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    keep_p, _ = jax.jit(
        lambda b, s, v: nms_ops.nms_mask(b, s, v, 0.6, presorted=True)
    )(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(keep_a), np.asarray(keep_p))
    assert int(np.asarray(keep_p).sum()) > 0
