"""Sweep (T_rpn, T_det) for accuracy or energy efficiency.

Equivalent of the reference's metrics_for_different_timesteps.py (the
README's test_and_energy_eff.py): sweeps T_rpn in [r1, r2] x T_det in
[d1, d2] (defaults 4-12 x 8-16 = 81 combos, :30-33), rebuilding the jitted
model per combo (T is a static scan length), and appends rows

  -o metrics:     [t_rpn, t_det, mAP@[.5:.95], mAP@.5, mAR@100]
  -o efficiency:  [t_rpn, t_det, energy_reduction]

to a JSON after every combo (:505-508) so partial sweeps survive.
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
    extract_spike_rates_run,
    get_args_parser as train_args,
    load_weights,
)


def get_args_parser():
    p = train_args(add_help=False)
    p2 = argparse.ArgumentParser(parents=[p], description="T-step sweep")
    p2.add_argument("-o", "--option", choices=["metrics", "efficiency"],
                    required=True)
    p2.add_argument("-r1", "--t-rpn-min", dest="t_rpn_min", type=int, default=4)
    p2.add_argument("-r2", "--t-rpn-max", dest="t_rpn_max", type=int, default=12)
    p2.add_argument("-d1", "--t-det-min", dest="t_det_min", type=int, default=8)
    p2.add_argument("-d2", "--t-det-max", dest="t_det_max", type=int, default=16)
    p2.add_argument("--max-batches", dest="max_batches", type=int, default=0,
                    help="limit eval batches per combo (0 = full set)")
    return p2


def main(args):
    from snn_automotive_object_detection_tpu.train.steps import make_eval_step

    results = []
    out_name = f"sweep_{args.option}"
    if args.save_name:
        out_name += f"_{args.save_name}"

    out_path = None
    for t_rpn in range(args.t_rpn_min, args.t_rpn_max + 1):
        for t_det in range(args.t_det_min, args.t_det_max + 1):
            combo = argparse.Namespace(**{**vars(args),
                                          "num_steps_rpn": t_rpn,
                                          "num_steps_detector": t_det})
            cfg, out_dir, config, params, make_loader = build_everything(combo)
            out_path = out_path or os.path.join(out_dir, out_name + ".json")
            params = load_weights(combo, config, params)
            ds, loader = make_loader("validation", training=False)

            if args.option == "metrics":
                step = make_eval_step(config)
                stats = compute_mean_avg_precision(
                    step, params, loader, ds, rm_bg=args.rm_bg,
                    print_freq=args.print_freq,
                )
                row = [t_rpn, t_det, float(stats[0]), float(stats[1]),
                       float(stats[8])]
            else:
                step = make_eval_step(config, collect_rates=True)
                res = extract_spike_rates_run(
                    step, params, loader, config,
                    max_batches=args.max_batches or None,
                )
                row = [t_rpn, t_det, float(res["report"]["reduction"])]

            results.append(row)
            with open(out_path, "w") as f:
                json.dump(results, f)
            print(f"[sweep] t_rpn={t_rpn} t_det={t_det} -> {row[2:]}")
    print(f"wrote {len(results)} rows to {out_path}")


if __name__ == "__main__":
    main(get_args_parser().parse_args())
