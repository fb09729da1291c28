"""Localize the bf16-vs-fp32 mAP gap (VERDICT r3 #1).

PARITY.md round 3 measured -0.022 mAP for the production bf16 path vs
--fp32 at the 0.34-mAP synthetic operating point, with the Pallas kernels
themselves contributing ~nothing (bf16+XLA == bf16+Pallas). This script
evaluates the SAME weights over the SAME held-out set under precision
variants that bisect the remaining sources:

  fp32              exact-parity path (XLA, Precision.HIGHEST everywhere)
  bf16              production (bf16 + all Pallas kernels)
  bf16_xla          bf16 states + GEMMs, kernels off
  state32_xla       bf16 GEMMs + f32 neuron states (snn_state_dtype),
                    kernels off -> isolates SNN state precision
  state32           same but with the stem/RoIAlign/fc6 kernels on
                    (the candidate production fix)
  bb32_heads_bf16   f32 backbone (HIGHEST) + bf16 SNN heads, kernels off
                    -> isolates backbone conv precision
  bb16_heads_f32    bf16 backbone + f32 heads (incl. f32 RoIAlign/epilogue),
                    kernels off -> the complement

Usage:
    python tools/ablate_bf16.py --load /root/.cache/bench_weights5_v2 \
        --images 64 --variants fp32,bf16,state32_xla,bb32_heads_bf16
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_variant_config(base, name: str):
    """Returns (config, backbone_dtype_override or None)."""
    import jax.numpy as jnp

    kernels_off = dict(rpn_pallas=False, roi_pallas=False,
                       stem_pallas=False, det_fc6_pallas=False)
    # snn_state_dtype is pinned in EVERY variant: the factory default is
    # now f32 (the production AMP mode), so the pure-bf16 rows must opt out
    # explicitly or they would silently measure the state32 numerics.
    if name == "fp32":
        return dataclasses.replace(base, compute_dtype=jnp.float32,
                                   snn_state_dtype=None, **kernels_off), None
    if name == "bf16":
        return dataclasses.replace(base, compute_dtype=jnp.bfloat16,
                                   snn_state_dtype=None), None
    if name == "bf16_xla":
        return dataclasses.replace(base, compute_dtype=jnp.bfloat16,
                                   snn_state_dtype=None, **kernels_off), None
    if name == "state32_xla":
        return dataclasses.replace(base, compute_dtype=jnp.bfloat16,
                                   snn_state_dtype=jnp.float32,
                                   **kernels_off), None
    if name == "state32":
        # rpn_pallas auto-gates off under mixed state (detector.py); the
        # stem / RoIAlign / fc6 kernels stay on.
        return dataclasses.replace(base, compute_dtype=jnp.bfloat16,
                                   snn_state_dtype=jnp.float32), None
    if name == "bb32_heads_bf16":
        return (dataclasses.replace(base, compute_dtype=jnp.bfloat16,
                                    snn_state_dtype=None, **kernels_off),
                jnp.float32)
    if name == "bb16_heads_f32":
        return (dataclasses.replace(base, compute_dtype=jnp.float32,
                                    snn_state_dtype=None, **kernels_off),
                jnp.bfloat16)
    raise ValueError(f"unknown variant {name!r}")


def run_variant(name: str, base, params, n_images: int, batch: int):
    import jax

    from snn_automotive_object_detection_tpu.models import detector as det_mod
    from tools.make_bench_weights import evaluate_heldout

    config, bb_dtype = make_variant_config(base, name)

    orig_resnet = det_mod.resnet50_fpn_apply
    if bb_dtype is not None:
        # Backbone-only dtype override: run the trunk in bb_dtype and hand
        # the features to the heads in the config compute dtype. Kernels are
        # off for these variants, so no kernel dtype assumptions break.
        def patched(bparams, x, dtype, trainable_layers=0, fpn_pallas=False):
            feats = orig_resnet(bparams, x.astype(bb_dtype), bb_dtype,
                                trainable_layers=trainable_layers)
            return [f.astype(config.compute_dtype) for f in feats]

        det_mod.resnet50_fpn_apply = patched
    try:
        t0 = time.time()
        # planar=None -> wants_planar_input(config): the planar s2d input
        # (and thus the stem kernel) engages exactly for the variants whose
        # config allows it.
        stats, cls_ap = evaluate_heldout(config, params, n_images, batch)
        dt = time.time() - t0
    finally:
        det_mod.resnet50_fpn_apply = orig_resnet
    return stats, cls_ap, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load", required=True)
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--variants",
                    default="fp32,bf16,bf16_xla,state32_xla,state32,"
                            "bb32_heads_bf16,bb16_heads_f32")
    ap.add_argument("--out", default=None, help="append JSONL here")
    args = ap.parse_args()

    import jax

    from snn_automotive_object_detection_tpu.models.factory import (
        DetectorConfig,
    )
    from snn_automotive_object_detection_tpu.utils.checkpoint import (
        load_checkpoint,
    )

    base = DetectorConfig(num_classes=9, t_rpn=8, t_det=12)
    params = load_checkpoint(os.path.abspath(args.load))["params"]

    results = {}
    for name in args.variants.split(","):
        name = name.strip()
        stats, cls_ap, dt = run_variant(name, base, params,
                                        args.images, args.batch)
        results[name] = stats
        line = {"variant": name, "images": args.images,
                "mAP": round(float(stats[0]), 4),
                "AP50": round(float(stats[1]), 4),
                "AP75": round(float(stats[2]), 4),
                "per_class": {k: round(v, 4) for k, v in cls_ap.items()},
                "wall_s": round(dt, 1)}
        print(json.dumps(line), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(line) + "\n")

    if "fp32" in results:
        ref = results["fp32"][0]
        print("\ndeltas vs fp32 mAP:")
        for name, s in results.items():
            print(f"  {name:18s} {s[0] - ref:+.4f}")


if __name__ == "__main__":
    main()
