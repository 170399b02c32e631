"""Experiment-results analysis figures.

Parity: ``/root/reference/vis-exp-data.py`` / ``vis-exp-cifar.py`` — the
reference hard-codes its result arrays in those scripts and bar-plots them;
here the evaluation CLI's ``--out_json`` JSONL records are rendered, with
the reference's baseline numbers (BASELINE.md) drawn as dashed reference
lines.

Usage:
    python -m laplace_inducing_points_tpu.viz.exp_plots \
        results/banana_stochastic.jsonl --out fig/exp_banana.png
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# reference baselines (means from BASELINE.md) keyed by dataset
REFERENCE_BASELINES = {
    "banana": {"nll": 0.1704, "acc": 1.0, "brier": 0.0717, "ece": 0.1468,
               "ood_auroc": 0.9296},
    "mnist": {"nll": 0.1007, "acc": 0.9839, "brier": 0.0364, "ece": 0.0588,
              "ood_auroc": 0.8977},
    "fmnist": {"nll": 0.4066, "acc": 0.8822, "brier": 0.1969, "ece": 0.1159,
               "ood_auroc": 0.9225},
    "cifar10": {"nll": 1.3844, "acc": 0.5624, "brier": 0.6606, "ece": 0.2345},
}

METRICS = ("nll", "acc", "brier", "ece", "ood_auroc")


def load_records(paths):
    records = []
    for path in paths:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    records.append(json.loads(line))
    return records


def plot_records(records, out_path: str):
    by_key = defaultdict(list)
    for r in records:
        by_key[(r["dataset"], r["alpha"])].append(r)

    metrics = [m for m in METRICS if any(m in r for r in records)]
    fig, axs = plt.subplots(1, len(metrics), figsize=(3.2 * len(metrics), 4))
    if len(metrics) == 1:
        axs = [axs]

    labels = [f"{d}\nα={a:g}" for (d, a) in by_key]
    xs = np.arange(len(by_key))
    for ax, metric in zip(axs, metrics):
        means, stds = [], []
        for recs in by_key.values():
            vals = [r[metric] for r in recs if metric in r]
            means.append(np.mean(vals) if vals else np.nan)
            stds.append(np.std(vals) if vals else 0.0)
        ax.bar(xs, means, yerr=stds, capsize=3, color="#68a")
        ax.set_xticks(xs)
        ax.set_xticklabels(labels, fontsize=8)
        ax.set_title(metric.upper())
        # reference baselines
        for i, (d, _) in enumerate(by_key):
            ref = REFERENCE_BASELINES.get(d, {}).get(metric)
            if ref is not None:
                ax.hlines(ref, i - 0.4, i + 0.4, colors="#d33",
                          linestyles="dashed",
                          label="reference" if i == 0 else None)
        if ax.get_legend_handles_labels()[0]:
            ax.legend(fontsize=8)
    fig.suptitle("IP-LLA evaluation vs reference baselines")
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=140, bbox_inches="tight")
    plt.close(fig)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("jsonl", nargs="+", help="evaluation JSONL record files")
    p.add_argument("--out", default="fig/exp_results.png")
    args = p.parse_args(argv)
    records = load_records(args.jsonl)
    if not records:
        raise SystemExit("no records found")
    out = plot_records(records, args.out)
    print(f"wrote {out} ({len(records)} records)")


if __name__ == "__main__":
    main()
