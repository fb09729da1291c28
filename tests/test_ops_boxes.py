import numpy as np
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.ops import boxes as B
from tests import oracles


def random_boxes(rng, n, size=800):
    x1 = rng.uniform(0, size * 0.8, n)
    y1 = rng.uniform(0, size * 0.8, n)
    w = rng.uniform(1, size * 0.3, n)
    h = rng.uniform(1, size * 0.3, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def test_box_iou_matches_oracle(rng):
    a = random_boxes(rng, 17)
    b = random_boxes(rng, 9)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    want = oracles.iou_matrix(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_encode_decode_roundtrip(rng):
    props = random_boxes(rng, 25)
    gts = random_boxes(rng, 25)
    for weights in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        enc = np.asarray(B.encode_boxes(jnp.asarray(gts), jnp.asarray(props), weights))
        want = oracles.encode(gts, props, weights)
        np.testing.assert_allclose(enc, want, rtol=1e-3, atol=1e-3)

        dec = np.asarray(B.decode_boxes(jnp.asarray(enc), jnp.asarray(props), weights))
        np.testing.assert_allclose(dec, gts, rtol=1e-3, atol=1e-2)


def test_decode_multiclass_matches_oracle(rng):
    props = random_boxes(rng, 12)
    deltas = rng.normal(0, 1.0, (12, 4 * 5)).astype(np.float32)
    weights = (10.0, 10.0, 5.0, 5.0)
    got = np.asarray(B.decode_boxes(jnp.asarray(deltas), jnp.asarray(props), weights))
    want = oracles.decode(deltas, props, weights)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_decode_clamps_large_dwdh(rng):
    props = random_boxes(rng, 3)
    deltas = np.full((3, 4), 10.0, np.float32)  # dw, dh way past log(1000/16)
    got = np.asarray(B.decode_boxes(jnp.asarray(deltas), jnp.asarray(props)))
    assert np.isfinite(got).all()
    w = got[:, 2] - got[:, 0]
    assert (w <= (props[:, 2] - props[:, 0]) * 1000.0 / 16.0 * 1.001).all()


def test_clip_and_small_mask():
    bx = jnp.asarray([[-5.0, -5.0, 10.0, 10.0], [100.0, 100.0, 300.0, 150.0]])
    clipped = np.asarray(B.clip_boxes_to_image(bx, (120, 200)))
    np.testing.assert_allclose(clipped, [[0, 0, 10, 10], [100, 100, 200, 120]])

    small = jnp.asarray([[0.0, 0.0, 0.5, 10.0], [0.0, 0.0, 10.0, 10.0]])
    mask = np.asarray(B.small_box_mask(small, 1.0))
    assert mask.tolist() == [False, True]


def test_resize_boxes():
    bx = jnp.asarray([[10.0, 20.0, 110.0, 220.0]])
    out = np.asarray(B.resize_boxes(bx, (100, 200), (200, 100)))
    np.testing.assert_allclose(out, [[5.0, 40.0, 55.0, 440.0]])
