"""Region Proposal Network: proposal generation/filtering + training loss.

Functional, static-shape equivalent of the reference's
``RegionProposalNetwork`` (/root/reference/rpn.py:299-703):

  * head outputs per level -> flatten in (y, x, anchor) order (NHWC gives
    this for free, matching torchvision's permute_and_flatten ordering)
  * decode deltas onto the anchor grids (coder weights (1,1,1,1), rpn.py:347)
  * per-level top pre_nms_top_n by objectness (rpn.py:434-446)
  * clip to image, drop boxes smaller than 1e-3, drop scores < score_thresh
    (rpn.py:504-514) — as masks, not dynamic filtering
  * per-level greedy NMS at 0.7 and post_nms_top_n selection (rpn.py:517-521)
  * eval additionally returns the pre-NMS top-k {proposals, objectness}
    (UNclipped, matching rpn.py:493-499) for new-object discovery
  * train: anchors matched at 0.7/0.3 with low-quality matches, 256 sampled
    at 50% positive, BCE objectness + smooth-L1(beta=1/9) box loss summed
    over positives and normalised by the total sampled count
    (rpn.py:376-432, 527-561)

Everything is fixed-capacity: proposals are always [N, post_nms_top_n, 4]
with a validity mask.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.ops import boxes as box_ops
from snn_automotive_object_detection_tpu.ops import nms as nms_ops
from snn_automotive_object_detection_tpu.ops.matcher import match_boxes
from snn_automotive_object_detection_tpu.ops.sampler import balanced_sample


@dataclasses.dataclass(frozen=True)
class RPNConfig:
    """Hyperparameters from /root/reference/model.py:50-59."""

    pre_nms_top_n_train: int = 2000
    pre_nms_top_n_test: int = 1000
    post_nms_top_n_train: int = 2000
    post_nms_top_n_test: int = 1000
    nms_thresh: float = 0.7
    fg_iou_thresh: float = 0.7
    bg_iou_thresh: float = 0.3
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    score_thresh: float = 0.0
    min_size: float = 1e-3

    def pre_nms_top_n(self, training: bool) -> int:
        return self.pre_nms_top_n_train if training else self.pre_nms_top_n_test

    def post_nms_top_n(self, training: bool) -> int:
        return self.post_nms_top_n_train if training else self.post_nms_top_n_test


def flatten_head_outputs(
    objectness: List[jnp.ndarray], bbox_reg: List[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray, List[int]]:
    """[N,H,W,A] / [N,H,W,4A] per level -> [N,K] / [N,K,4] concatenated.

    NHWC flattening yields (y, x, anchor) ordering, identical to the anchor
    grid ordering and torchvision's concat_box_prediction_layers.
    """
    n = objectness[0].shape[0]
    obj_flat, reg_flat, counts = [], [], []
    for o, r in zip(objectness, bbox_reg):
        _, h, w, a = o.shape
        obj_flat.append(o.reshape(n, h * w * a))
        reg_flat.append(r.reshape(n, h * w * a, 4))
        counts.append(h * w * a)
    return jnp.concatenate(obj_flat, 1), jnp.concatenate(reg_flat, 1), counts


# Blocked two-stage top_k for the big P2/P3 levels (exact values; ON by
# default since round 5). XLA's single top_k over P2's ~221k anchors
# measures ~2.0 ms of the ~2.8 ms pre-NMS select; splitting the row into B
# blocks turns the serial sorted-dim depth into parallel batch work:
# top_k([N*B, K/B], take) then top_k over the [N, B*take] concat.
# Measured on v5e (tools/topk_probe.py + same-session bench A/B): 5-level
# select 2.98 -> 1.66 ms standalone; e2e batch 2 54.96 -> 56.98 img/s at
# block 16384 (56.62 at 8192, 2.26 ms standalone at 32768).
# Values are bit-identical to plain lax.top_k; tie ORDER on TPU can differ
# because plain TPU top_k itself is not lowest-index-first over long rows
# (measured: ~14 of 1000 selected P2 rows swap under random f32 scores) —
# the blocked variant resolves ties lowest-index-first, which matches CPU
# lax.top_k and is the more canonical order (tests/test_blocked_topk.py).
_BLOCKED_TOPK_DEFAULT = os.environ.get("RPN_BLOCKED_TOPK", "1") == "1"
_BLOCKED_TOPK_MIN = int(os.environ.get("RPN_TOPK_BLOCK", "16384"))
# RPN_TOPK_MODE=threshold swaps the big-level blocked top_k for the
# sort-free threshold select below (A/B knob; exact either way).
# Measured on v5e: threshold 6.32 ms vs blocked 1.55 standalone — the
# 32-step binary descent pays 32 full-row count reductions over the 221k
# P2 row, far above XLA's sort floor. Kept as the measured negative.
_TOPK_MODE = os.environ.get("RPN_TOPK_MODE", "blocked")


def _threshold_top_k(o: jnp.ndarray, take: int):
    """Exact top_k(o, take) with no large sort (VERDICT r4 #4a).

    Three passes instead of sorting the K-long row:
      1. per-row ``take``-th largest value by a 32-step binary descent on
         the monotone uint32 key (each step one masked count reduction);
      2. selection mask = keys above the threshold plus the first
         (take - #above) threshold ties in index order (cumsum tie rank);
      3. cumsum-compact the <= ``take`` selected (value, index) pairs and
         sort just those by (key desc, index asc).
    Matches ``_blocked_top_k``'s values bit-exactly and its
    lowest-index-first tie order (= CPU lax.top_k semantics).
    """
    n, k = o.shape
    u = jax.lax.bitcast_convert_type(o, jnp.uint32)
    # Monotone total order on floats (incl. -0.0 < +0.0; NaNs don't occur
    # in objectness logits): negatives flip all bits, positives the sign.
    key = jnp.where(u >> 31 == 1, ~u, u | jnp.uint32(0x80000000))

    def bit_step(i, pref):
        cand = pref | (jnp.uint32(1) << (31 - i).astype(jnp.uint32))
        cnt = jnp.sum((key >= cand[:, None]).astype(jnp.int32), axis=1)
        return jnp.where(cnt >= take, cand, pref)

    tau = jax.lax.fori_loop(
        0, 32, bit_step, jnp.zeros((n,), jnp.uint32))[:, None]

    gt = key > tau
    eq = key == tau
    n_gt = jnp.sum(gt.astype(jnp.int32), axis=1, keepdims=True)
    rank_gt = jnp.cumsum(gt.astype(jnp.int32), axis=1)
    rank_eq = jnp.cumsum(eq.astype(jnp.int32), axis=1)
    sel_eq = eq & (rank_eq <= take - n_gt)
    # Unique slots: above-threshold rows fill [0, n_gt) in index order,
    # selected ties fill [n_gt, take); everything else hits the dump slot.
    # cnt(key >= tau) >= take guarantees all `take` slots get written.
    pos = jnp.where(gt, rank_gt - 1,
                    jnp.where(sel_eq, n_gt + rank_eq - 1, take))
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    kbuf = jnp.zeros((n, take + 1), jnp.uint32).at[rows, pos].set(
        key, mode="drop")
    ibuf = jnp.zeros((n, take + 1), jnp.int32).at[rows, pos].set(
        jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None], (n, k)),
        mode="drop")
    # Sort the take candidates: ~key ascending == key descending, stable
    # second key = index ascending. Dump slot (key 0 -> ~key max) lands
    # last; with fewer than take real rows its value decodes to -inf.
    skey, sidx = jax.lax.sort((~kbuf[:, :take], ibuf[:, :take]),
                              dimension=1, num_keys=2, is_stable=False)
    # Invert the key map (skey = ~key): positives had the sign bit OR'd in
    # (key MSB 1 <-> skey MSB 0), negatives were fully flipped.
    vals = jax.lax.bitcast_convert_type(
        jnp.where(skey >> 31 == 0, (~skey) & jnp.uint32(0x7FFFFFFF), skey),
        jnp.float32)
    return vals, sidx


def _blocked_top_k(o: jnp.ndarray, take: int, block: int):
    """Exact top_k(o, take) via per-block top_k + a merge top_k.

    Exact because every global top-``take`` element is within its own
    block's top-``take``. Tie order ALSO matches plain lax.top_k (lowest
    index first): stage-1 is index-stable within a block, stage-2 scans the
    block-major concat, so equal values resolve to (block, in-block idx)
    lexicographic = global index order.
    """
    n, k = o.shape
    nb = -(-k // block)
    kp = nb * block
    if kp != k:
        o = jnp.pad(o, ((0, 0), (0, kp - k)), constant_values=NEG_INF_F32)
    v1, i1 = jax.lax.top_k(o.reshape(n * nb, block), min(take, block))
    i1 = (i1.reshape(n, nb, -1)
          + (jnp.arange(nb, dtype=i1.dtype) * block)[None, :, None]).reshape(n, -1)
    v2, i2 = jax.lax.top_k(v1.reshape(n, -1), take)
    return v2, jnp.take_along_axis(i1, i2, axis=1)


NEG_INF_F32 = float(jnp.finfo(jnp.float32).min)


def select_pre_nms(
    objectness: jnp.ndarray,
    counts: List[int],
    top_n: int,
    blocked: Optional[bool] = None,
):
    """Per-level top-k selection (rpn.py:434-446, 477-489).

    objectness: [N, K]; counts: anchors per level. Selection depends on
    objectness only, so box deltas are gathered and decoded AFTER this
    (torchvision decodes everything first — 24x wasted decode work).
    Returns (obj [N, S], idx [N, S] global anchor indices) with
    S = sum_l min(top_n, K_l). (Per-level identity is recovered downstream
    from the static level_sizes split — torchvision's levels tensor,
    rpn.py:478-480, is redundant under static shapes.)

    blocked: use the exact two-stage blocked top_k on levels bigger than
    2 blocks (None -> RPN_BLOCKED_TOPK env default).
    """
    if blocked is None:
        blocked = _BLOCKED_TOPK_DEFAULT
    obj_sel, idx_sel = [], []
    offset = 0
    for k in counts:
        take = min(top_n, k)
        o = objectness[:, offset:offset + k]
        if blocked and k >= 2 * _BLOCKED_TOPK_MIN and take <= _BLOCKED_TOPK_MIN:
            if _TOPK_MODE == "threshold":
                vals, idx = _threshold_top_k(o, take)
            else:
                vals, idx = _blocked_top_k(o, take, _BLOCKED_TOPK_MIN)
        else:
            vals, idx = jax.lax.top_k(o, take)  # [N, take]
        obj_sel.append(vals)
        idx_sel.append(idx + offset)
        offset += k
    return jnp.concatenate(obj_sel, 1), jnp.concatenate(idx_sel, 1)


def filter_proposals(
    proposals: jnp.ndarray,
    objectness: jnp.ndarray,
    level_sizes: List[int],
    image_sizes: jnp.ndarray,
    cfg: RPNConfig,
    training: bool,
):
    """Clip/filter/NMS per image. proposals: [N, S, 4]; objectness: [N, S]
    (raw logits); level_sizes: static per-level row counts summing to S;
    image_sizes: [N, 2] (h, w).

    Returns dict with fixed-size outputs:
      boxes [N, P, 4], scores [N, P], valid [N, P]  (P = post_nms_top_n)
      pre_nms_proposals [N, S, 4] (unclipped), pre_nms_objectness [N, S]
    """
    post_n = cfg.post_nms_top_n(training)
    scores = jax.nn.sigmoid(objectness)
    smax = max(level_sizes)
    n_levels = len(level_sizes)

    def per_image(props, scr, size):
        boxes = box_ops.clip_boxes_to_image(props, (size[0], size[1]))
        valid = box_ops.small_box_mask(boxes, cfg.min_size)
        valid = valid & (scr >= cfg.score_thresh)
        # Suppression never crosses levels (torchvision batched_nms with
        # lvl ids, rpn.py:517), so instead of one NMS over the level-
        # concatenated S rows (S/B serial blocks) run one independent NMS
        # per level, vmapped: serial depth smax/B. Identical greedy
        # results — argsort is stable, so within-level tie order matches
        # the concatenated sort's.
        bs = jnp.zeros((n_levels, smax, 4), boxes.dtype)
        ss = jnp.zeros((n_levels, smax), scr.dtype)
        vs = jnp.zeros((n_levels, smax), bool)
        off = 0
        for lvl, k in enumerate(level_sizes):
            bs = bs.at[lvl, :k].set(boxes[off:off + k])
            ss = ss.at[lvl, :k].set(scr[off:off + k])
            vs = vs.at[lvl, :k].set(valid[off:off + k])
            off += k
        # presorted: each level's rows come straight from select_pre_nms's
        # lax.top_k (descending objectness; sigmoid is monotone), and the
        # zero-score padded rows are invalid, so the NMS argsort is
        # redundant (~0.17 ms/level saved, exact same greedy result).
        keep_lv, _ = jax.vmap(
            lambda b, s, v: nms_ops.nms_mask(b, s, v, cfg.nms_thresh,
                                             presorted=True)
        )(bs, ss, vs)
        keep = jnp.concatenate(
            [keep_lv[lvl, :k] for lvl, k in enumerate(level_sizes)], axis=0
        )
        idx, out_valid = nms_ops.topk_after_nms(scr, keep, post_n)
        return boxes[idx], scr[idx], out_valid

    b, s, v = jax.vmap(per_image)(proposals, scores, image_sizes)
    return {
        "boxes": b,
        "scores": s,
        "valid": v,
        "pre_nms_proposals": proposals,
        "pre_nms_objectness": scores,
    }


def assign_targets_to_anchors(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: RPNConfig,
):
    """Per-image anchor labelling (rpn.py:376-432).

    anchors: [K, 4]; gt_boxes: [G, 4] padded; gt_valid: [G].
    Returns labels [K] (1 fg / 0 bg / -1 ignore) and regression targets
    [K, 4] (safe zeros for non-positive anchors).
    """
    quality = box_ops.box_iou(gt_boxes, anchors)  # [G, K]
    matched = match_boxes(
        quality, gt_valid, cfg.fg_iou_thresh, cfg.bg_iou_thresh,
        allow_low_quality_matches=True,
    )
    labels = jnp.where(matched >= 0, 1.0, jnp.where(matched == -1, 0.0, -1.0))
    # Empty-image case: all labels background (rpn.py:392-396).
    any_gt = gt_valid.any()
    labels = jnp.where(any_gt, labels, 0.0)

    matched_boxes = gt_boxes[jnp.clip(matched, 0)]
    # Encode only where positive; elsewhere use the anchor itself so the
    # encode never sees degenerate boxes (loss only reads positives).
    safe = jnp.where((labels == 1.0)[:, None], matched_boxes, anchors)
    reg_targets = box_ops.encode_boxes(safe, anchors)
    return labels, reg_targets


def smooth_l1(diff: jnp.ndarray, beta: float) -> jnp.ndarray:
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)


def rpn_loss(
    key: jax.Array,
    objectness: jnp.ndarray,
    pred_deltas: jnp.ndarray,
    labels: jnp.ndarray,
    reg_targets: jnp.ndarray,
    cfg: RPNConfig,
):
    """Batched RPN loss (rpn.py:527-561). objectness/labels: [N, K];
    pred_deltas/reg_targets: [N, K, 4]."""
    n = labels.shape[0]
    keys = jax.random.split(key, n)
    pos, neg = jax.vmap(
        lambda k, l: balanced_sample(
            k, l == 1.0, l == 0.0, cfg.batch_size_per_image, cfg.positive_fraction
        )
    )(keys, labels)

    sampled = pos | neg
    num_sampled = jnp.maximum(sampled.sum(), 1)

    box_l = smooth_l1(pred_deltas - reg_targets, beta=1.0 / 9).sum(-1)
    loss_box = (box_l * pos).sum() / num_sampled

    # BCE with logits over sampled anchors, mean reduction.
    z = objectness
    t = labels
    bce = jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))
    loss_obj = (bce * sampled).sum() / num_sampled

    return loss_obj, loss_box


def rpn_forward(
    head_apply: Callable,
    features: List[jnp.ndarray],
    anchors: jnp.ndarray,
    level_counts: List[int],
    image_sizes: jnp.ndarray,
    cfg: RPNConfig,
    training: bool,
    targets: Optional[Dict[str, jnp.ndarray]] = None,
    loss_key: Optional[jax.Array] = None,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Full RPN pass (rpn.py:563-703).

    head_apply: features -> (objectness list, bbox list, rates)
    anchors: [K, 4] concatenated over levels; level_counts: anchors/level.
    targets (train): {"boxes": [N, G, 4], "valid": [N, G]}.

    Returns (proposals dict from filter_proposals + "rates",
             losses dict — empty at eval like the reference).
    """
    objectness_maps, bbox_maps, rates = head_apply(features)
    objectness, pred_deltas, counts = flatten_head_outputs(objectness_maps, bbox_maps)
    assert counts == list(level_counts), (counts, level_counts)

    obj_sg = jax.lax.stop_gradient(objectness)
    obj_sel, idx_sel = select_pre_nms(
        obj_sg, counts, cfg.pre_nms_top_n(training)
    )
    takes = [min(cfg.pre_nms_top_n(training), k) for k in counts]
    # Decode ONLY the selected anchors (identical results to decode-all:
    # selection reads objectness alone; torchvision's order, rpn.py:434-446).
    deltas_sel = jnp.take_along_axis(
        jax.lax.stop_gradient(pred_deltas), idx_sel[..., None], axis=1
    )
    prop_sel = box_ops.decode_boxes(deltas_sel, anchors[idx_sel])
    out = filter_proposals(prop_sel, obj_sel, takes, image_sizes, cfg, training)
    out["rates"] = rates

    losses: Dict[str, jnp.ndarray] = {}
    if training:
        assert targets is not None and loss_key is not None
        labels, reg_targets = jax.vmap(
            lambda b, v: assign_targets_to_anchors(anchors, b, v, cfg)
        )(targets["boxes"], targets["valid"])
        loss_obj, loss_box = rpn_loss(
            loss_key, objectness, pred_deltas, labels, reg_targets, cfg
        )
        losses = {"loss_objectness": loss_obj, "loss_rpn_box_reg": loss_box}
    return out, losses
