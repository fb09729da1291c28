"""Pruned per-class RoI NMS (roi_heads._batched_group_nms) vs the full path.

The pruned fast path must be bit-identical when every FG group fits in K
valid rows, and the whole-batch lax.cond must fall back to the full path
(still bit-identical) when any group overflows.
"""

import numpy as np
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.models import roi_heads as RH
from tests.test_ops_boxes import random_boxes


def _groups(rng, n=2, g=6, p=300, frac=0.05):
    gb = np.stack([
        np.stack([random_boxes(rng, p, size=200) for _ in range(g)])
        for _ in range(n)
    ])
    gs = rng.uniform(0, 1, (n, g, p)).astype(np.float32)
    gv = rng.uniform(0, 1, (n, g, p)) < frac
    gv[:, -1] = rng.uniform(0, 1, (n, p)) < 0.8  # BG group: mostly valid
    return jnp.asarray(gb), jnp.asarray(gs), jnp.asarray(gv)


def test_pruned_batched_group_nms_matches_full(rng):
    gb, gs, gv = _groups(rng)
    full, ord_f = RH._batched_group_nms(gb, gs, gv, 0.5, pruned=False)
    pruned, ord_p = RH._batched_group_nms(gb, gs, gv, 0.5, pruned=True)
    assert np.array_equal(np.asarray(full), np.asarray(pruned))
    assert np.array_equal(np.asarray(ord_f), np.asarray(ord_p))


def test_pruned_fallback_on_overflow(rng, monkeypatch):
    # Force a tiny K so an FG group overflows -> cond takes the full path.
    monkeypatch.setattr(RH, "_PRUNED_NMS_K", 8)
    gb, gs, gv = _groups(rng, frac=0.2)  # ~60 valid >> 8
    full, _ = RH._batched_group_nms(gb, gs, gv, 0.5, pruned=False)
    pruned, _ = RH._batched_group_nms(gb, gs, gv, 0.5, pruned=True)
    assert np.array_equal(np.asarray(full), np.asarray(pruned))


def test_postprocess_matches_batched(rng):
    """Single-image postprocess_detections == the hoisted batched path."""
    import dataclasses

    cfg = RH.RoIConfig()
    p, c = 64, 5
    logits = rng.normal(0, 2, (p, c)).astype(np.float32)
    reg = rng.normal(0, 0.3, (p, c * 4)).astype(np.float32)
    props = random_boxes(rng, p, size=300)
    pv = rng.uniform(0, 1, p) < 0.9
    size = np.array([320, 320], np.int32)

    ref = RH.postprocess_detections(
        jnp.asarray(logits), jnp.asarray(reg), jnp.asarray(props),
        jnp.asarray(pv), jnp.asarray(size), cfg)

    (gb, gs, gv), inter = RH._postproc_groups(
        jnp.asarray(logits), jnp.asarray(reg), jnp.asarray(props),
        jnp.asarray(pv), jnp.asarray(size), cfg)
    for pruned in (False, True):
        keep, bg_order = RH._batched_group_nms(
            gb[None], gs[None], gv[None], cfg.nms_thresh, pruned=pruned)
        got = RH._postproc_outputs(inter, keep[0], bg_order[0], cfg)
        for k in ref:
            assert np.array_equal(np.asarray(ref[k]), np.asarray(got[k])), k
