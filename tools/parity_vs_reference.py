"""One-command parity harness against a reference checkpoint.

    python tools/parity_vs_reference.py model_Cityscapes_SNN_Trpn8_Tdet12.pth \
        -d cityscapes [--data-root ...] [-t-rpn 8] [-t-det 12]

Converts the ``.pth`` (reference torchvision layout,
utils/checkpoint.convert_torch_state_dict), evaluates it twice on the
dataset's validation split — once in ``--fp32`` exact-parity mode (pure XLA)
and once on the bf16 production path (Pallas kernels when on TPU) — and
prints the 12 COCO stats side by side with their diffs, plus the 7
spike-rate means (5 RPN levels + FC6/FC7) for both modes.

This makes the BASELINE.md check ("mAP within 0.5 pts of the released
checkpoint, spike rates to 1e-3") a single command the day the released
OneDrive weights are available (no egress here — validated meanwhile against
tools/torch_mirror.py state_dicts, tests/test_parity_harness.py).

Reference flow mirrored: train.py --test-only (:271-314) and the spike-rate
extraction (:426-517).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAT_NAMES = [
    "AP@[.5:.95]", "AP@.5", "AP@.75", "AP-small", "AP-medium", "AP-large",
    "AR@1", "AR@10", "AR@100", "AR-small", "AR-medium", "AR-large",
]
RATE_NAMES = ["LVL_0", "LVL_1", "LVL_2", "LVL_3", "pool", "FC6", "FC7"]


def get_args_parser():
    p = argparse.ArgumentParser("reference-checkpoint parity harness")
    p.add_argument("checkpoint", help=".pth reference checkpoint (or orbax dir)")
    p.add_argument("-d", "--dataset", default="cityscapes")
    p.add_argument("--data-root", default="")
    p.add_argument("--model-config", default="")
    p.add_argument("-t-rpn", dest="t_rpn", type=int, default=8,
                   help="released operating point (README.md:77)")
    p.add_argument("-t-det", dest="t_det", type=int, default=12)
    p.add_argument("-b", "--batch-size", type=int, default=2)
    p.add_argument("-j", "--workers", type=int, default=4)
    p.add_argument("--only-known-cls", action="store_true")
    p.add_argument("--only-one-bbox", action="store_true")
    p.add_argument("--backbone", default="resnet50_fpn")
    p.add_argument("--skip-rates", action="store_true",
                   help="skip the spike-rate pass (mAP only)")
    p.add_argument("--skip-bf16", action="store_true",
                   help="fp32 only (e.g. when no TPU is attached)")
    p.add_argument("--out-dir", default="")
    return p


def _eval_args(args, fp32: bool, rates: bool):
    from cli.train import get_args_parser as train_parser

    argv = [
        "-d", args.dataset, "--rpn-snn", "--detector-snn",
        "--load-model", args.checkpoint,
        "-t-rpn", str(args.t_rpn), "-t-det", str(args.t_det),
        "-b", str(args.batch_size), "-j", str(args.workers),
        "--backbone", args.backbone,
    ]
    argv += ["--extract-spike-rates", "test"] if rates else ["--test-only"]
    if fp32:
        argv.append("--fp32")
    if args.only_known_cls:
        argv.append("--only-known-cls")
    if args.only_one_bbox:
        argv.append("--only-one-bbox")
    if args.data_root:
        argv += ["--data-root", args.data_root]
    if args.model_config:
        argv += ["--model-config", args.model_config]
    if args.out_dir:
        argv += ["--out-dir", args.out_dir]
    return train_parser().parse_args(argv)


def _rates_from_npz(path):
    data = np.load(path)
    shared = data["shared"]  # [L, images]
    return [float(shared[i].mean()) for i in range(shared.shape[0])] + [
        float(data["fc6"].mean()), float(data["fc7"].mean()),
    ]


def main(args):
    from cli.train import main as train_main
    from snn_automotive_object_detection_tpu.utils.config import (
        load_dataset_config,
    )

    cfg = load_dataset_config(args.dataset, args.data_root or None)
    out_dir = args.out_dir or cfg.get("out_dir", f"outputs/{cfg['dataset']}")
    rates_npz = os.path.join(out_dir, f"spike_rates_test_{cfg['dataset']}.npz")

    modes = [("fp32", True)] + ([] if args.skip_bf16 else [("bf16", False)])
    stats, rates = {}, {}
    for name, fp32 in modes:
        print(f"\n=== {name} evaluation ===", flush=True)
        stats[name] = np.asarray(train_main(_eval_args(args, fp32, False)))
        if not args.skip_rates:
            print(f"=== {name} spike rates ===", flush=True)
            train_main(_eval_args(args, fp32, True))
            rates[name] = _rates_from_npz(rates_npz)

    print("\n================ PARITY REPORT ================")
    hdr = f"{'stat':<14}" + "".join(f"{n:>12}" for n, _ in modes)
    if len(modes) == 2:
        hdr += f"{'diff':>12}"
    print(hdr)
    for i, sname in enumerate(STAT_NAMES):
        row = f"{sname:<14}" + "".join(f"{stats[n][i]:>12.4f}" for n, _ in modes)
        if len(modes) == 2:
            row += f"{stats['bf16'][i] - stats['fp32'][i]:>12.4f}"
        print(row)
    if rates:
        print()
        n_lvls = len(rates[modes[0][0]]) - 2
        names = RATE_NAMES if n_lvls == 5 else (
            [f"LVL_{i}" for i in range(n_lvls - 1)] + ["pool", "FC6", "FC7"])
        print(f"{'spike rate':<14}" + "".join(f"{n:>12}" for n, _ in modes))
        for i, rname in enumerate(names):
            print(f"{rname:<14}"
                  + "".join(f"{rates[n][i]:>12.5f}" for n, _ in modes))
    if len(modes) == 2:
        d = float(stats["bf16"][0] - stats["fp32"][0])
        print(f"\nbf16-vs-fp32 mAP delta: {d:+.4f} "
              f"(budget: |released - ours| <= 0.005, BASELINE.md)")
    return stats, rates


if __name__ == "__main__":
    main(get_args_parser().parse_args())
