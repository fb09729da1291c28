"""Measure the reference-equivalent PyTorch CPU pipeline -> BENCH_BASELINE.json.

Runs tools/torch_mirror.py (the reference's inference math in plain torch)
at the production operating point — 768x1536 input, T_rpn=8, T_det=12,
9 classes — on CPU, and records images/sec. bench.py divides the TPU
throughput by this number for its vs_baseline field, mirroring the
BASELINE.json north star ("x CPU-reference images/sec").

Usage: python tools/bench_baseline.py [--images N] [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2)
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--width", type=int, default=1536)
    ap.add_argument("--t-rpn", type=int, default=8)
    ap.add_argument("--t-det", type=int, default=12)
    args = ap.parse_args()

    from tools.torch_mirror import MirrorDetector

    torch.manual_seed(0)
    model = MirrorDetector(num_classes=9, t_rpn=args.t_rpn, t_det=args.t_det)
    model.eval()

    rng = np.random.default_rng(0)
    imgs = [
        torch.as_tensor(
            rng.uniform(0, 1, (1, 3, args.height, args.width)).astype(np.float32)
        )
        for _ in range(args.images)
    ]

    # Warm-up on a small crop so lazy allocations don't pollute timing.
    with torch.no_grad():
        model(imgs[0][:, :, :128, :256], (128, 256))

    t0 = time.perf_counter()
    with torch.no_grad():
        for im in imgs:
            model(im, (args.height, args.width))
    dt = time.perf_counter() - t0

    imgs_per_sec = args.images / dt
    out = {
        "cpu_reference_images_per_sec": imgs_per_sec,
        "seconds_per_image": dt / args.images,
        "shape": [args.height, args.width],
        "t_rpn": args.t_rpn,
        "t_det": args.t_det,
        "torch_threads": torch.get_num_threads(),
        "note": "reference-equivalent torch pipeline (tools/torch_mirror.py) on CPU",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_BASELINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
