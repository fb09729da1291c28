"""IoU matcher, mirrored from torchvision ``detection._utils.Matcher``.

Used by the RPN (thresholds 0.7/0.3, allow_low_quality_matches=True,
/root/reference/rpn.py:352-356) and the RoI head (0.5/0.5, low-quality off,
/root/reference/roi_heads.py:528-536). Fully vectorised; padded GT rows are
handled via a validity mask rather than dynamic shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


def match_boxes(
    quality: jnp.ndarray,
    gt_valid: jnp.ndarray,
    high_threshold: float,
    low_threshold: float,
    allow_low_quality_matches: bool,
):
    """Assign each prediction (anchor/proposal) a GT index or a flag.

    quality:  [G, N] match quality (IoU) — rows are (padded) GT boxes
    gt_valid: [G] bool — False rows never match
    Returns:
      matches: [N] int32 — GT index, or BELOW_LOW_THRESHOLD / BETWEEN_THRESHOLDS
    """
    q = jnp.where(gt_valid[:, None], quality, -1.0)

    matched_vals = q.max(axis=0)
    matches = q.argmax(axis=0).astype(jnp.int32)

    below = matched_vals < low_threshold
    between = (matched_vals >= low_threshold) & (matched_vals < high_threshold)

    out = jnp.where(below, BELOW_LOW_THRESHOLD, matches)
    out = jnp.where(between, BETWEEN_THRESHOLDS, out)

    if allow_low_quality_matches:
        # For each GT, every prediction tying its max quality keeps its
        # pre-threshold match (torchvision set_low_quality_matches_).
        highest_per_gt = q.max(axis=1, keepdims=True)  # [G, 1]
        is_best = (q == highest_per_gt) & gt_valid[:, None]
        update = is_best.any(axis=0)
        out = jnp.where(update, matches, out)

    return out
