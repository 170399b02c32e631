"""BASELINE-style parity table on the committed REAL digits (round 5).

True MNIST/FMNIST/CIFAR cannot enter the zero-egress build environment, so
the committed real-image fixture (``data/fixtures/digits_mini`` — UCI
optical digits, public domain: 100 train / 40 test genuine handwritten
8×8 images) is the citable real-data evidence (VERDICT r4 task 6). This
script publishes the full grid BASELINE.md uses for the reference's
recorded tables — NLL / ACC / Brier / ECE / OOD-AUROC — over

    {weight, cov, matfree} predictives × three α values × 3 eval reps,

all on ONE MAP state and ONE inducing set Z (so the grid isolates the
predictive path and the α response, exactly like the reference's α
sensitivity tables in ``/root/reference/vis-exp-data.py:58-141``). The
protocol matches ``tests/test_real_data.py``'s held-out-class split: train
on digits 0-4, real digits 5-9 are the OOD set (the zero-egress analog of
the reference's MNIST-vs-FMNIST pairing).

Usage (CPU, ~5 min):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -u scripts/digits_baseline.py \
        --out results/digits_baseline_r5.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "data", "fixtures", "digits_mini")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--alphas", type=float, nargs="+", default=[0.01, 0.1, 1.0])
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--mc", type=int, default=128)
    p.add_argument("--m", type=int, default=12)
    p.add_argument("--out", default="results/digits_baseline_r5.jsonl")
    args = p.parse_args()

    from laplace_inducing_points_tpu.data.loader import (ArrayDataset,
                                                         make_dataloaders)
    from laplace_inducing_points_tpu.data.scale import load_arrays
    from laplace_inducing_points_tpu.evaluation.harness import (
        auroc_ood, eval_dataset_extended)
    from laplace_inducing_points_tpu.inference.lla import ScalableLLAPredictor
    from laplace_inducing_points_tpu.models.scale import LargeClassifier
    from laplace_inducing_points_tpu.models.state import create_train_state
    from laplace_inducing_points_tpu.training.inducing import (
        train_inducing_points)
    from laplace_inducing_points_tpu.training.map import map_step

    # held-out-class split on the real fixture (tests/test_real_data.py)
    x, y = load_arrays("mnist", train=True, root=FIXTURE,
                       allow_synthetic=False)
    xt, yt = load_arrays("mnist", train=False, root=FIXTURE,
                         allow_synthetic=False)
    id_tr = y < 5
    xtr, ytr = jnp.asarray(x[id_tr]), jnp.asarray(y[id_tr])
    xte, yte = xt[yt < 5], yt[yt < 5]
    xood = xt[yt >= 5]
    N = int(xtr.shape[0])

    model = LargeClassifier(input_shape=(8, 8, 1), num_hidden=[32],
                            num_layers=1, num_classes=5)
    state = create_train_state(model, jax.random.PRNGKey(0), xtr[:1],
                               optax.adam(5e-3), model_kind="classifier")
    for _ in range(80):
        state, _ = map_step(state, (xtr, ytr), 1e-4)

    # ONE inducing set for the whole grid (gram objective, M real images)
    Z = train_inducing_points(
        state, xtr[:args.m], optax.adam(5e-2),
        batches=iter(lambda: (xtr, ytr), None),
        alpha=0.1, num_steps=15, full_set_size=N, objective="gram",
        verbose=False)

    _, test_loader, _ = make_dataloaders(
        ArrayDataset(np.asarray(xtr), np.asarray(ytr)),
        ArrayDataset(xte, yte), ArrayDataset(xte, yte), 20)
    _, ood_loader, _ = make_dataloaders(
        ArrayDataset(xood, np.zeros(len(xood), np.int32)),
        ArrayDataset(xood, np.zeros(len(xood), np.int32)),
        ArrayDataset(xood, np.zeros(len(xood), np.int32)), 20)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    rows = []
    for method in ("weight", "cov", "matfree"):
        # one predictor per method: its α-independent factors amortize
        # across the whole α × reps sub-grid (the production usage pattern)
        pred = ScalableLLAPredictor(state, Z, full_set_size=N,
                                    method=method, precond_rank=8,
                                    cg_tol=1e-5,
                                    range_clip_min=None)
        for alpha in args.alphas:
            for rep in range(args.reps):
                rng = jax.random.fold_in(
                    jax.random.PRNGKey(155858), 1000 * rep + int(alpha * 97))
                t0 = time.time()
                rec = eval_dataset_extended(
                    state, test_loader, Z, alpha=alpha, full_set_size=N,
                    num_mc_samples=args.mc, rng=rng, predictor=pred)
                rec["ood_auroc"] = auroc_ood(
                    state, rec["probs"], ood_loader, Z, alpha=alpha,
                    full_set_size=N, num_mc_samples=args.mc,
                    rng=jax.random.fold_in(rng, 7), predictor=pred)
                row = {"dataset": "digits_mini(real, 0-4 vs 5-9)",
                       "predictive": method, "alpha": alpha, "iter": rep,
                       "mc": args.mc, "m": args.m,
                       "nll": round(float(rec["nll"]), 5),
                       "acc": round(float(rec["acc"]), 5),
                       "brier": round(float(rec["brier"]), 5),
                       "ece": round(float(rec["ece"]), 5),
                       "ood_auroc": round(float(rec["ood_auroc"]), 5),
                       "wallclock_s": round(time.time() - t0, 2)}
                rows.append(row)
                print(json.dumps(row), flush=True)
                with open(args.out, "a" if rows[1:] else "w") as f:
                    f.write(json.dumps(row) + "\n")

    # aggregate table (mean over reps) for RESULTS.md
    print("\n| predictive | α | NLL | ACC % | Brier | ECE | OOD AUROC % |")
    print("|---|---|---|---|---|---|---|")
    for method in ("weight", "cov", "matfree"):
        for alpha in args.alphas:
            sel = [r for r in rows
                   if r["predictive"] == method and r["alpha"] == alpha]
            mean = {k: float(np.mean([r[k] for r in sel]))
                    for k in ("nll", "acc", "brier", "ece", "ood_auroc")}
            print(f"| {method} | {alpha:g} | {mean['nll']:.3f} "
                  f"| {100 * mean['acc']:.1f} | {mean['brier']:.3f} "
                  f"| {mean['ece']:.3f} | {100 * mean['ood_auroc']:.1f} |")


if __name__ == "__main__":
    main()
