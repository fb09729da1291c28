"""Time the frozen-backbone train step on the real TPU per numerics mode.

VERDICT r4 #2's done-criterion: with the round-5 mixed f32-state VJP, AMP
training (snn_state_dtype=f32, the production default) must keep the fused
Pallas fast path at ~90 ms/step instead of dropping to the ~145 ms XLA scan.
This probe measures it directly: one fixed on-device synthetic batch, the
exact make_train_step the weights tool uses, scalar-loss readback as the
sync (block_until_ready does not wait on the tunneled TPU).

Modes:
  amp   — f32 SNN states + bf16 GEMMs (production default; mixed-state VJP)
  bf16  — pure bf16 states (the round-3/4 operating point)
  xla   — AMP numerics with rpn_pallas=False (the scan fallback baseline)

Defaults (adamw, batch 2, 9 classes, T 8/12) match the 3-phase recipe's
frozen phases so the persistent compilation cache is shared with
tools/make_bench_weights.py runs.

Usage:  python tools/train_probe.py [--modes amp,bf16,xla] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="amp,xla")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    import dataclasses

    import jax
    import optax

    from snn_automotive_object_detection_tpu.models.factory import (
        DetectorConfig, init_params,
    )
    from snn_automotive_object_detection_tpu.train.optim import split_trainable
    from snn_automotive_object_detection_tpu.train.steps import make_train_step
    from tools.synth_shapes import synth_batch_device

    results = {}
    for mode in args.modes.split(","):
        config = DetectorConfig(
            num_classes=9, t_rpn=8, t_det=12,
            **({"snn_state_dtype": None} if mode == "bf16" else {}),
        )
        params = init_params(config, jax.random.PRNGKey(0))
        train_config = dataclasses.replace(
            config, rpn_pallas=(mode != "xla"))
        trainable, frozen = split_trainable(params, train_backbone=False)
        opt = optax.adamw(args.lr, weight_decay=1e-5)
        opt_state = opt.init(trainable)
        step = make_train_step(train_config, opt)

        h, w = config.bucket
        batch = jax.jit(
            lambda k: synth_batch_device(k, args.batch, h, w)
        )(jax.random.PRNGKey(7))
        ks = jax.random.PRNGKey(11)

        t0 = time.perf_counter()
        for _ in range(args.warmup):
            trainable, opt_state, losses = step(
                trainable, frozen, opt_state, batch, ks)
        lt = float(np.asarray(losses["loss_total"]))  # sync
        print(f"[{mode}] compile+warmup {time.perf_counter() - t0:.1f} s "
              f"(loss_total={lt:.4f})", flush=True)

        t0 = time.perf_counter()
        for _ in range(args.iters):
            trainable, opt_state, losses = step(
                trainable, frozen, opt_state, batch, ks)
            np.asarray(losses["loss_total"])  # per-step sync readback
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        results[mode] = ms
        print(f"[{mode}] {ms:.1f} ms/step "
              f"({args.batch / ms * 1e3:.1f} img/s)", flush=True)

    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
