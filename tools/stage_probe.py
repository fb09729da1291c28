"""Per-stage timing of the flagship detector on the real TPU (one run).

Reproduces the round-3 "stage budget" methodology as a repo tool: each stage
is jitted standalone and fed the PREVIOUS stage's on-device outputs, timed
with a scalar np.asarray readback (block_until_ready does not wait on the
tunneled TPU). Standalone numbers carry ~1 ms dispatch inflation each —
trust end-to-end deltas for adopt/reject decisions; this probe is for
finding WHERE the time is.

Data stays on device (the tunnel stalls on >1MB host uploads).

Usage:  python tools/stage_probe.py  [--batch 2] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    # Sync: readback of a scalar reduction over the first leaf.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jnp.sum(leaf.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from snn_automotive_object_detection_tpu.models import roi_heads as roi_mod
    from snn_automotive_object_detection_tpu.models import rpn as rpn_mod
    from snn_automotive_object_detection_tpu.models.detector import (
        make_head_applies,
    )
    from snn_automotive_object_detection_tpu.models.factory import (
        DetectorConfig, init_params,
    )
    from snn_automotive_object_detection_tpu.models.resnet_fpn import (
        resnet50_fpn_apply_from_p1,
    )
    from snn_automotive_object_detection_tpu.ops import boxes as box_ops
    from snn_automotive_object_detection_tpu.ops.anchors import generate_anchors
    from snn_automotive_object_detection_tpu.ops.pallas_roi_align import (
        multiscale_roi_align_pallas,
    )
    from snn_automotive_object_detection_tpu.ops.pallas_stem import (
        planarize_image, stem_pallas_apply,
    )

    config = DetectorConfig(num_classes=9, t_rpn=8, t_det=12)
    params = init_params(config, jax.random.PRNGKey(0))
    n = args.batch
    hb, wb = config.bucket
    it = args.iters

    key = jax.random.PRNGKey(7)
    images = jax.random.uniform(key, (n, hb, wb, 3), jnp.float32)
    xp = jax.jit(lambda im: planarize_image(im, config.image_mean))(images)
    sizes = jnp.tile(jnp.asarray([[hb, wb]], jnp.int32), (n, 1))

    rpn_head_apply, box_head_apply = make_head_applies(
        config, params, collect_rates=False, training=False)

    rows = []

    f_stem = jax.jit(lambda x: stem_pallas_apply(
        params["backbone"]["stem"], x, config.image_mean, config.image_std))
    ms, p1 = timed(f_stem, xp, iters=it)
    rows.append(("stem(pallas)", ms))

    f_bb = jax.jit(lambda p: resnet50_fpn_apply_from_p1(
        params["backbone"], p, trainable_layers=0, fpn_pallas=True))
    ms, feats = timed(f_bb, p1, iters=it)
    rows.append(("layers+fpn", ms))

    f_rpnh = jax.jit(lambda fs: rpn_head_apply(fs))
    ms, (obj_maps, bbox_maps, _) = timed(f_rpnh, feats, iters=it)
    rows.append(("rpn_head", ms))

    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_levels = generate_anchors(shapes, (hb, wb), config.anchor_spec)
    counts = [a.shape[0] for a in anchor_levels]
    anchors = jnp.concatenate(anchor_levels, axis=0)

    def filt(om, bm, szs):
        objectness, deltas, cts = rpn_mod.flatten_head_outputs(om, bm)
        obj_sel, idx_sel = rpn_mod.select_pre_nms(
            objectness, cts, config.rpn.pre_nms_top_n(False))
        takes = [min(config.rpn.pre_nms_top_n(False), k) for k in cts]
        deltas_sel = jnp.take_along_axis(deltas, idx_sel[..., None], axis=1)
        prop_sel = box_ops.decode_boxes(deltas_sel, anchors[idx_sel])
        return rpn_mod.filter_proposals(
            prop_sel, obj_sel, takes, szs, config.rpn, False)

    f_filt = jax.jit(filt)
    ms, props = timed(f_filt, obj_maps, bbox_maps, sizes, iters=it)
    rows.append(("filter+nms", ms))

    f_roi = jax.jit(lambda fs, bx: multiscale_roi_align_pallas(
        fs[:-1], bx, (hb, wb)))
    ms, pooled = timed(f_roi, feats, props["boxes"], iters=it)
    rows.append(("roi_align(pallas)", ms))

    p = props["boxes"].shape[1]
    f_head = jax.jit(lambda x: box_head_apply(x.reshape(n * p, -1)))
    ms, (cl, br, _) = timed(f_head, pooled, iters=it)
    rows.append(("box_head", ms))

    cl = cl.reshape(n, p, -1)
    br = br.reshape(n, p, -1)

    def post(cl_, br_, bx, bv, szs):
        (gb, gs, gv), inter = jax.vmap(
            lambda a, b, c, d, e: roi_mod._postproc_groups(
                a, b, c, d, e, config.roi)
        )(cl_, br_, bx, bv, szs)
        keep, bg_order = roi_mod._batched_group_nms(
            gb, gs, gv, config.roi.nms_thresh)
        return jax.vmap(
            lambda iv, ka, bo: roi_mod._postproc_outputs(
                iv, ka, bo, config.roi)
        )(inter, keep, bg_order)

    f_post = jax.jit(post)
    ms, det = timed(f_post, cl, br, props["boxes"], props["valid"], sizes,
                    iters=it)
    rows.append(("postprocess", ms))

    total = sum(m for _, m in rows)
    print(f"\nstage budget (batch {n}, {hb}x{wb}, {it} iters; "
          "~1 ms dispatch inflation each):")
    for name, ms in rows:
        print(f"  {name:18s} {ms:7.2f} ms")
    print(f"  {'SUM':18s} {total:7.2f} ms "
          f"({n / total * 1e3:.1f} img/s equivalent)")


if __name__ == "__main__":
    main()
