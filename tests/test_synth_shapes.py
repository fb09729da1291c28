"""tools/synth_shapes.py: on-device 5-class shape generator sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from tools.synth_shapes import NUM_SHAPE_CLASSES, synth_batch_device


def test_synth_batch_device_properties():
    b = jax.jit(lambda k: synth_batch_device(k, 2, 128, 256, max_boxes=6))(
        jax.random.PRNGKey(3)
    )
    img = np.asarray(b["images"])
    boxes = np.asarray(b["targets"]["boxes"])
    labels = np.asarray(b["targets"]["labels"])
    valid = np.asarray(b["targets"]["valid"])

    assert img.shape == (2, 128, 256, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert ((labels >= 1) & (labels <= NUM_SHAPE_CLASSES))[valid].all()
    assert (labels[~valid] == 0).all()
    assert valid.sum(axis=1).min() >= 2

    for i in range(2):
        bright = img[i].max(-1) > 0.3
        ys, xs = np.nonzero(bright)
        inside = np.zeros(len(ys), bool)
        for g in range(6):
            if not valid[i, g]:
                continue
            x0, y0, x1, y1 = boxes[i, g]
            assert x1 > x0 and y1 > y0
            inside |= ((xs + 0.5 >= x0) & (xs + 0.5 < x1)
                       & (ys + 0.5 >= y0) & (ys + 0.5 < y1))
            # every GT box contains a meaningful amount of its shape
            xi0, yi0, xi1, yi1 = boxes[i, g].astype(int)
            assert bright[yi0:yi1, xi0:xi1].mean() > 0.2
        # bright pixels only appear inside GT boxes
        assert (~inside).sum() == 0


def test_synth_batches_differ_per_key():
    f = jax.jit(lambda k: synth_batch_device(k, 1, 64, 128, max_boxes=4))
    a = f(jax.random.PRNGKey(0))
    b = f(jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(a["images"]), np.asarray(b["images"]))
