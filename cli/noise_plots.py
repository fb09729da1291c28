"""Plot relative precision drop vs noise level for multiple models.

Equivalent of the reference's noise_plots.py: reads the JSONs written by
cli/noise_calculations.py for up to four model variants (SNN, SNN*, NoSNN,
NoSNN* — * = noise-finetuned) and plots mAP@.5 relative to the clean value
against gaussian sigma^2 (left) and raindrop count (right).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def get_args_parser():
    p = argparse.ArgumentParser(description="noise robustness plots")
    p.add_argument("--gaussian", nargs="+", default=[],
                   help="label=path pairs of gaussian sweep JSONs")
    p.add_argument("--rain", nargs="+", default=[],
                   help="label=path pairs of rain sweep JSONs")
    p.add_argument("-o", "--out", default="noise_plots.png")
    p.add_argument("--metric-index", dest="metric_index", type=int, default=3,
                   help="row index of the metric (3 = mAP@.5)")
    return p


def _load(pairs):
    out = {}
    for pair in pairs:
        label, path = pair.split("=", 1)
        with open(path) as f:
            rows = json.load(f)
        out[label] = rows
    return out


def main(args):
    g = _load(args.gaussian)
    r = _load(args.rain)
    n_panels = int(bool(g)) + int(bool(r))
    if not n_panels:
        raise SystemExit("pass --gaussian and/or --rain label=path pairs")
    fig, axes = plt.subplots(1, n_panels, figsize=(7 * n_panels, 5),
                             squeeze=False)
    panel = 0
    for data, xlabel in ((g, r"gaussian noise $\sigma^2$"),
                         (r, "rain drops")):
        if not data:
            continue
        ax = axes[0][panel]
        for label, rows in data.items():
            x = [row[1] for row in rows]
            y = np.array([row[args.metric_index] for row in rows])
            rel = y / max(y[0], 1e-12) * 100
            ax.plot(x, rel, marker="o", label=label)
        ax.set_xlabel(xlabel)
        ax.set_ylabel("relative mAP@.5 (%)")
        ax.grid(alpha=0.3)
        ax.legend()
        panel += 1
    fig.tight_layout()
    fig.savefig(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main(get_args_parser().parse_args())
