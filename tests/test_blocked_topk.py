"""Bit-identity of the blocked two-stage pre-NMS top_k vs plain lax.top_k.

The blocked variant (models/rpn.py `_blocked_top_k`) must return the exact
same values AND indices as `jax.lax.top_k`, including tie resolution
(lowest index first), since filter_proposals' presorted NMS consumes the
row order directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snn_automotive_object_detection_tpu.models import rpn


@pytest.mark.parametrize("k,block,take", [
    (221184, 32768, 1000),   # P2 at (768, 1536): 192*384*3 anchors
    (55296, 16384, 1000),    # P3
    (1000, 256, 1000),       # take == block edge
    (70000, 32768, 2000),    # train-time take, non-divisible padding
])
def test_blocked_top_k_bit_identical(k, block, take):
    key = jax.random.PRNGKey(k)
    o = jax.random.normal(key, (2, k), jnp.float32) * 4.0
    v_ref, i_ref = jax.lax.top_k(o, min(take, k))
    v_blk, i_blk = rpn._blocked_top_k(o, min(take, k), block)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_blk))
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_blk))


def test_blocked_top_k_tie_order():
    # Heavy duplicate values across blocks: tie order must still be
    # lowest-global-index first, matching lax.top_k.
    key = jax.random.PRNGKey(0)
    o = jax.random.randint(key, (2, 70000), 0, 7).astype(jnp.float32)
    v_ref, i_ref = jax.lax.top_k(o, 500)
    v_blk, i_blk = rpn._blocked_top_k(o, 500, 8192)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_blk))
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_blk))


def test_select_pre_nms_blocked_matches_plain():
    # Full select path over realistic 5-level counts at (768, 1536).
    counts = [221184, 55296, 13824, 3456, 864]
    key = jax.random.PRNGKey(1)
    o = jax.random.normal(key, (2, sum(counts)), jnp.float32)
    obj_a, idx_a = rpn.select_pre_nms(o, counts, 1000, blocked=False)
    obj_b, idx_b = rpn.select_pre_nms(o, counts, 1000, blocked=True)
    np.testing.assert_array_equal(np.asarray(obj_a), np.asarray(obj_b))
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))


@pytest.mark.parametrize("k,take,tie", [
    (55296, 1000, False),
    (70000, 500, True),      # heavy cross-block ties at the threshold
    (4096, 4096, False),     # take == k edge
])
def test_threshold_top_k_bit_identical(k, take, tie):
    key = jax.random.PRNGKey(k + take)
    if tie:
        o = jax.random.randint(key, (2, k), 0, 7).astype(jnp.float32)
    else:
        o = jax.random.normal(key, (2, k), jnp.float32) * 4.0
    # Exercise the sortable-key map's sign/zero edges.
    o = o.at[:, :4].set(jnp.asarray([0.0, -0.0, 1e-30, -5.0]))
    v_ref, i_ref = rpn._blocked_top_k(o, take, 8192)
    v_thr, i_thr = rpn._threshold_top_k(o, take)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_thr))
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_thr))


def test_select_pre_nms_threshold_mode(monkeypatch):
    monkeypatch.setattr(rpn, "_TOPK_MODE", "threshold")
    counts = [221184, 55296, 13824, 3456, 864]
    key = jax.random.PRNGKey(2)
    o = jax.random.normal(key, (2, sum(counts)), jnp.float32)
    obj_a, idx_a = rpn.select_pre_nms(o, counts, 1000, blocked=False)
    obj_b, idx_b = rpn.select_pre_nms(o, counts, 1000, blocked=True)
    np.testing.assert_array_equal(np.asarray(obj_a), np.asarray(obj_b))
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
