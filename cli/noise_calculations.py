"""Noise-robustness sweeps: mAP under gaussian noise or synthetic rain.

Equivalent of the reference's noise_calculations.py: evaluates a checkpoint
under gaussian variance in {0, 0.01, ..., 0.24} (:415-417) or rain drops in
{0, 50, ..., 300} (--rain-noise, :371-372), appending

  [noise_type, intensity, mAP@[.5:.95], mAP@.5, mAR@100]

rows to OUT_DIR/noise_acc_*.json / rain_noise_acc_*.json after each point.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli.train import (  # noqa: E402
    build_everything,
    compute_mean_avg_precision,
    get_args_parser as train_args,
    load_weights,
)


def get_args_parser():
    p = train_args(add_help=False)
    p2 = argparse.ArgumentParser(parents=[p], description="noise sweep")
    p2.add_argument("--rain-noise", dest="rain_noise", action="store_true",
                    help="sweep rain drops instead of gaussian variance")
    p2.add_argument("--gaussian-max", dest="gaussian_max", type=float, default=0.24)
    p2.add_argument("--gaussian-step", dest="gaussian_step", type=float, default=0.01)
    p2.add_argument("--rain-max", dest="rain_max", type=int, default=300)
    p2.add_argument("--rain-step", dest="rain_step", type=int, default=50)
    return p2


def main(args):
    from snn_automotive_object_detection_tpu.train.steps import make_eval_step

    if args.rain_noise:
        points = list(range(0, args.rain_max + 1, args.rain_step))
        noise_name = "rain"
        out_name = "rain_noise_acc"
    else:
        n = int(round(args.gaussian_max / args.gaussian_step)) + 1
        points = [round(i * args.gaussian_step, 4) for i in range(n)]
        noise_name = "gaussian"
        out_name = "noise_acc"
    if args.save_name:
        out_name += f"_{args.save_name}"

    results = []
    out_path = None
    step = None
    for intensity in points:
        args.add_noise = "" if intensity == 0 else noise_name
        args.noise_intensity = float(intensity)
        cfg, out_dir, config, params, make_loader = build_everything(args)
        out_path = out_path or os.path.join(out_dir, out_name + ".json")
        params = load_weights(args, config, params)
        ds, loader = make_loader("validation", training=False)
        if step is None:  # same static shapes across intensities
            step = make_eval_step(config)
        stats = compute_mean_avg_precision(step, params, loader, ds,
                                           rm_bg=args.rm_bg,
                                           print_freq=args.print_freq)
        row = [noise_name, intensity, float(stats[0]), float(stats[1]),
               float(stats[8])]
        results.append(row)
        with open(out_path, "w") as f:
            json.dump(results, f)
        print(f"[noise] {noise_name}={intensity} -> mAP {stats[0]:.4f}")
    print(f"wrote {len(results)} rows to {out_path}")


if __name__ == "__main__":
    main(get_args_parser().parse_args())
