"""Balanced positive/negative sampling with static shapes.

Mirror of torchvision ``BalancedPositiveNegativeSampler`` (RPN: 256 @ 0.5,
RoI: 512 @ 0.25 — /root/reference/rpn.py:358, roi_heads.py:528-536), but
returns fixed-size boolean masks instead of dynamic index lists: selection is
done with per-element random keys + ``top_k``, which keeps every shape static
under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


def balanced_sample(
    key: jax.Array,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    batch_size: int,
    positive_fraction: float,
):
    """Sample up to batch_size elements, positives first.

    positive/negative: [N] bool masks (mutually exclusive; ignored elements in
    neither). Returns (pos_sampled, neg_sampled): [N] bool masks with
      |pos| = min(#pos, round(batch*fraction)),
      |neg| = min(#neg, batch - |pos|).
    Random subset selection matches torchvision's randperm semantics in
    distribution (uniform without replacement).
    """
    n = positive.shape[0]
    kp, kn = jax.random.split(key)
    num_pos_target = int(batch_size * positive_fraction)

    rp = jax.random.uniform(kp, (n,))
    pos_keys = jnp.where(positive, rp, NEG_INF)
    _, pos_idx = jax.lax.top_k(pos_keys, min(num_pos_target, n))
    pos_take = jax.lax.top_k(pos_keys, min(num_pos_target, n))[0] > NEG_INF
    pos_sampled = jnp.zeros(n, bool).at[pos_idx].set(pos_take)

    num_pos = pos_sampled.sum()
    num_neg_target = batch_size - num_pos  # traced scalar

    rn = jax.random.uniform(kn, (n,))
    neg_keys = jnp.where(negative, rn, NEG_INF)
    k_neg = min(batch_size, n)
    neg_vals, neg_idx = jax.lax.top_k(neg_keys, k_neg)
    neg_take = (neg_vals > NEG_INF) & (jnp.arange(k_neg) < num_neg_target)
    neg_sampled = jnp.zeros(n, bool).at[neg_idx].set(neg_take)

    return pos_sampled, neg_sampled
