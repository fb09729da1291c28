import numpy as np
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.ops import nms as N
from tests import oracles
from tests.test_ops_boxes import random_boxes


def run_nms(boxes, scores, valid, thr, groups=None):
    keep, order = N.nms_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thr,
        groups=None if groups is None else jnp.asarray(groups),
    )
    return np.asarray(keep), np.asarray(order)


def test_nms_matches_oracle(rng):
    for trial in range(5):
        boxes = random_boxes(rng, 64, size=200)
        scores = rng.uniform(0, 1, 64).astype(np.float32)
        keep, _ = run_nms(boxes, scores, np.ones(64, bool), 0.5)
        want = set(oracles.greedy_nms(boxes, scores, 0.5))
        assert set(np.nonzero(keep)[0].tolist()) == want


def test_nms_respects_validity(rng):
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (4, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    valid = np.array([False, True, True, True])
    keep, _ = run_nms(boxes, scores, valid, 0.5)
    # Best valid box (idx 1) survives, suppresses 2 and 3; idx 0 invalid.
    assert keep.tolist() == [False, True, False, False]


def test_batched_nms_matches_oracle(rng):
    boxes = random_boxes(rng, 48, size=100)
    scores = rng.uniform(0, 1, 48).astype(np.float32)
    groups = rng.integers(0, 3, 48)
    keep, _ = run_nms(boxes, scores, np.ones(48, bool), 0.4, groups)
    want = set(oracles.greedy_nms(boxes, scores, 0.4, groups))
    assert set(np.nonzero(keep)[0].tolist()) == want


def test_topk_after_nms(rng):
    scores = np.array([0.1, 0.9, 0.5, 0.7], np.float32)
    keep = np.array([True, True, False, True])
    idx, valid = N.topk_after_nms(jnp.asarray(scores), jnp.asarray(keep), 3)
    assert np.asarray(idx).tolist() == [1, 3, 0]
    assert np.asarray(valid).all()

    idx, valid = N.topk_after_nms(jnp.asarray(scores), jnp.asarray(keep), 4)
    assert np.asarray(valid).tolist() == [True, True, True, False]


def test_per_class_nms_matches_grouped(rng):
    """roi_heads._per_class_nms (vmapped per-class NMS) must equal the
    grouped single-call formulation it replaced."""
    from snn_automotive_object_detection_tpu.models.roi_heads import (
        _per_class_nms,
    )

    p, c = 40, 3
    boxes = np.stack([random_boxes(rng, p, size=120) for _ in range(c)], 1)
    scores = rng.uniform(0, 1, (p, c)).astype(np.float32)
    valid = rng.uniform(size=(p, c)) > 0.2
    got = np.asarray(
        _per_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                       jnp.asarray(valid), 0.5)
    )
    labels = np.broadcast_to(np.arange(c)[None, :], (p, c)).reshape(-1)
    want, _ = run_nms(boxes.reshape(-1, 4), scores.reshape(-1),
                      valid.reshape(-1), 0.5, labels)
    assert got.tolist() == want.tolist()


def test_nms_mask_pruned_matches_full(rng):
    """Pruned NMS == full NMS whenever the valid count fits in K."""
    for trial in range(5):
        n, k = 200, 32
        boxes = random_boxes(rng, n, size=120)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        valid = rng.uniform(0, 1, n) < 0.1  # ~20 valid << K
        want, _ = run_nms(boxes, scores, valid, 0.5)
        got = N.nms_mask_pruned(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            0.5, k)
        assert np.asarray(got).tolist() == want.tolist()


def test_nms_mask_pruned_tie_order(rng):
    """Duplicate scores: the stable re-sort restores argsort tie order."""
    n, k = 64, 16
    boxes = random_boxes(rng, n, size=80)
    scores = np.repeat(rng.uniform(0, 1, 8).astype(np.float32), 8)
    valid = rng.uniform(0, 1, n) < 0.15
    want, _ = run_nms(boxes, scores, valid, 0.5)
    got = N.nms_mask_pruned(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, k)
    assert np.asarray(got).tolist() == want.tolist()


def test_select_kept_in_order_matches_topk(rng):
    """cumsum+scatter selection == topk_after_nms on the valid prefix."""
    for trial in range(5):
        n = 100
        scores = rng.uniform(0, 1, n).astype(np.float32)
        valid = rng.uniform(0, 1, n) < 0.7
        boxes = random_boxes(rng, n, size=150)
        keep, order = N.nms_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5)
        idx_a, val_a = N.select_kept_in_order(order, keep)
        idx_b, val_b = N.topk_after_nms(
            jnp.asarray(scores), jnp.asarray(keep), n)
        val_a, val_b = np.asarray(val_a), np.asarray(val_b)
        assert np.array_equal(val_a, val_b)
        nk = int(val_a.sum())
        assert np.array_equal(np.asarray(idx_a)[:nk], np.asarray(idx_b)[:nk])
