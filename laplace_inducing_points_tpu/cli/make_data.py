"""Toy-dataset generation CLI.

Parity: the ``__main__`` of ``/root/reference/src/toydata.py:275-307``.

Usage:
    python -m laplace_inducing_points_tpu.cli.make_data \
        --dataset sine --n_samples 200 --noise 0.3 --seed 999 \
        --out_file data/sine.npz [--split_in_middle] [--plot]
"""

from __future__ import annotations

import argparse
import os

import jax

from laplace_inducing_points_tpu.data.toy import (GENERATORS, create_dataset,
                                                  save_dataset)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True, choices=sorted(GENERATORS),
                   help="which dataset to create")
    p.add_argument("--n_samples", type=int, default=128)
    p.add_argument("--noise", type=float, default=0.05)
    p.add_argument("--split_in_middle", action="store_true",
                   help="sine only: leave a gap in the input domain")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out_file", default=None)
    p.add_argument("--plot", action="store_true",
                   help="also save a scatter figure under fig/")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    kwargs = {}
    if args.dataset == "sine":
        kwargs["split_in_middle"] = args.split_in_middle
    x, y = create_dataset(args.dataset, args.n_samples,
                          jax.random.PRNGKey(args.seed), noise=args.noise,
                          **kwargs)
    out = args.out_file or os.path.join("data", f"{args.dataset}.npz")
    save_dataset(x, y, out)
    print(f"Saved {args.dataset} data at {out} "
          f"with shape x={tuple(x.shape)}, y={tuple(y.shape)}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from laplace_inducing_points_tpu.viz.nplot import (
            plot_binary_classification_data, plot_regression_data)

        fig, ax = plt.subplots(figsize=(6, 4))
        if args.dataset == "sine":
            plot_regression_data(ax, x, y)
        else:
            plot_binary_classification_data(ax, x, y)
        ax.set_title(f"{args.dataset} dataset")
        os.makedirs("fig", exist_ok=True)
        fig.savefig(f"fig/{args.dataset}.png", dpi=140, bbox_inches="tight")
        print(f"Saved figure fig/{args.dataset}.png")


if __name__ == "__main__":
    main()
