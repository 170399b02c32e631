"""Banana MAP-axis study (round 5, VERDICT r4 task 4).

The round-4 restart study measured the Z-landscape axis to its ceiling
(oracle over 4 Z-candidates: 82.0 mean) and shipped ``alpha_train=1``
(fresh band 80.3-85.5, mean 83.5).  Its own §4 data named the untouched
axis: at EQUAL test accuracy, re-drawing the MAP fit shifts the OOD-AUROC
band 73.1-81.7.  This script measures that axis and the two mechanisms
VERDICT r4 proposes on it:

* **MAP candidates** — ``--n_map_seeds`` independent MAP fits (fresh model
  init + fresh loader order), each recording the implementable train-time
  selectors (validation NLL / ACC at the MAP point, weight norm) so we can
  compute how much MAP-selection-by-val-NLL recovers of the oracle gap.
* **Longer MAP** — every MAP seed is also trained for ``--long_factor``×
  the config epochs (the reference trains banana 250 epochs,
  ``/root/reference/config/toy/toyclassifier_banana.yml``; its recorded
  92.96 AUROC is one fixed draw of this same pipeline,
  ``/root/reference/vis-exp-data.py:5-11``).
* **Data-driven Z init** — for every MAP, Z is trained from the first-M
  rows (the reference's init, ``/root/reference/main.py:116``) AND from
  k-means centroids of the train set (k-means++ seeding, pure numpy), at
  2 Z seeds each, isolating init× landscape effects from Z-rng noise.

All Z trainings use the shipped operating point (``alpha_train=1``, single
run, gram objective); evaluation is the like-for-like round-3/4 protocol:
ring OOD radius 1.05, MC=1000, ``range_clip_min=1.0``.

Writes one JSON line per (map_variant, map_seed, z_seed, z_init) plus one
``map_point`` line per MAP fit to ``--out``; prints a selector analysis at
the end.  The RESULTS.md "Banana round 5" table is generated from these
rows.

Usage (CPU, ~25 min):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -u \
        scripts/banana_map_study.py --out results/banana_r5_map_study.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
import optax

from laplace_inducing_points_tpu.data.loader import (ArrayDataset,
                                                     cycling_batches,
                                                     make_dataloaders)
from laplace_inducing_points_tpu.data.toy import (ensure_toy_npz,
                                                  load_dataset,
                                                  ring_cache_fname,
                                                  train_test_val_split)
from laplace_inducing_points_tpu.evaluation.harness import (
    auroc_ood, eval_dataset, eval_dataset_extended)
from laplace_inducing_points_tpu.inference.lla import ScalableLLAPredictor
from laplace_inducing_points_tpu.models.registry import get_model
from laplace_inducing_points_tpu.models.state import create_train_state
from laplace_inducing_points_tpu.training.inducing import (
    full_set_kl, train_inducing_points)
from laplace_inducing_points_tpu.training.map import (eval_classification,
                                                      train_map)
from laplace_inducing_points_tpu.utils import setup_compile_cache
from laplace_inducing_points_tpu.utils.config import load_experiment_config


def kmeans_init(X: np.ndarray, m: int, seed: int,
                iters: int = 100) -> np.ndarray:
    """k-means centroids of X with k-means++ seeding (pure numpy).

    The reference inits Z as the first M train rows; centroids cover the
    data manifold evenly instead of inheriting the file order.
    """
    rng = np.random.default_rng(seed)
    n = X.shape[0]
    # k-means++ seeding
    centers = [X[rng.integers(n)]]
    for _ in range(m - 1):
        d2 = np.min(
            ((X[:, None, :] - np.asarray(centers)[None]) ** 2).sum(-1), 1)
        p = d2 / max(d2.sum(), 1e-12)
        centers.append(X[rng.choice(n, p=p)])
    C = np.asarray(centers)
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None]) ** 2).sum(-1)
        lab = d2.argmin(1)
        newC = np.stack([
            X[lab == k].mean(0) if np.any(lab == k) else C[k]
            for k in range(m)])
        if np.allclose(newC, C):
            break
        C = newC
    return C


def val_metrics_map(state, loader):
    tot_nll, tot_acc, nb = 0.0, 0.0, 0
    for xb, yb in loader:
        nll, acc = eval_classification(state, (jnp.asarray(xb),
                                               jnp.asarray(yb)))
        tot_nll += float(nll)
        tot_acc += float(acc)
        nb += 1
    return tot_nll / max(nb, 1), tot_acc / max(nb, 1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n_map_seeds", type=int, default=8)
    p.add_argument("--n_z_seeds", type=int, default=2)
    p.add_argument("--long_factor", type=int, default=3)
    p.add_argument("--variants", type=str, nargs="+",
                   default=["base:1:1", "long:LF:1"],
                   help="MAP variants as name:epoch_factor:alpha_factor "
                        "(epoch_factor 'LF' = --long_factor); e.g. "
                        "reg100:1:100 trains MAP at 100x the config L2.")
    p.add_argument("--config", default="configs/toy/classifier_banana.yml")
    p.add_argument("--ood_radius", type=float, default=1.05)
    p.add_argument("--mc", type=int, default=1000)
    p.add_argument("--range_clip", type=float, default=1.0)
    p.add_argument("--data_dir", default="data/")
    p.add_argument("--out", default="results/banana_r5_map_study.jsonl")
    args = p.parse_args()

    setup_compile_cache()
    cfg = load_experiment_config(args.config)
    model_cfg, opt_cfg = cfg["model"], cfg["optimization"]
    map_cfg, ip_cfg = opt_cfg["map"], opt_cfg["ip"]
    alpha = float(opt_cfg["alpha"])
    alpha_train = float(ip_cfg.get("alpha_train") or alpha)
    data_cfg = dict(cfg.get("data") or {})

    path = ensure_toy_npz("banana", data_dir=args.data_dir,
                          n=data_cfg.pop("n", 512),
                          noise=data_cfg.pop("noise", 0.05),
                          seed=data_cfg.pop("seed", 42), **data_cfg)
    x, y = load_dataset(path)
    tr, te, va = train_test_val_split(x, y)
    full_set_size = opt_cfg.get("full_set_size") or tr[0].shape[0]

    ood_path = ensure_toy_npz("ring", data_dir=args.data_dir,
                              radius=args.ood_radius,
                              fname=ring_cache_fname(args.ood_radius))
    ox, oy = load_dataset(ood_path)
    _, ote, _ = train_test_val_split(ox, oy)

    bs = map_cfg["batch_size"]
    _, test_loader, val_loader = make_dataloaders(
        ArrayDataset(*tr), ArrayDataset(*te), ArrayDataset(*va),
        batch_size=bs, seed=0)
    _, ood_loader, _ = make_dataloaders(
        ArrayDataset(*tr), ArrayDataset(*ote), ArrayDataset(*va),
        batch_size=bs, seed=0)

    model = get_model(model_cfg)
    m = ip_cfg["m"]
    X_full = jnp.asarray(tr[0])
    range_clip = args.range_clip if args.range_clip > 0 else None
    z_first = jnp.asarray(tr[0][:m])
    z_kmeans = jnp.asarray(kmeans_init(np.asarray(tr[0]), m, seed=7))

    train_kwargs = dict(
        alpha=alpha_train, num_steps=ip_cfg["epochs"],
        full_set_size=full_set_size,
        objective=ip_cfg.get("objective", "gram"),
        st_samples=ip_cfg["st_samples"],
        slq_samples=ip_cfg["slq_samples"],
        slq_num_matvecs=ip_cfg["slq_num_matvecs"],
        cg_tol=ip_cfg.get("cg_tol", 1e-3),
        cg_maxiter=ip_cfg.get("cg_maxiter"),
        precond_rank=ip_cfg.get("precond_rank", 64), verbose=False)

    out = open(args.out, "w")
    rows = []

    variants = []
    for spec in args.variants:
        name, ef, af = spec.split(":")
        ef = args.long_factor if ef == "LF" else int(ef)
        variants.append((name, map_cfg["epochs"] * ef, float(af)))

    for i in range(args.n_map_seeds):
        mseed = 500 + 104729 * i
        for variant, epochs, alpha_factor in variants:
            mtrain_loader, _, _ = make_dataloaders(
                ArrayDataset(*tr), ArrayDataset(*te), ArrayDataset(*va),
                batch_size=bs, seed=(mseed + 1) % (2**31))
            state = create_train_state(
                model, jax.random.PRNGKey(mseed),
                jnp.asarray(tr[0][:1]), optax.adam(map_cfg["lr"]),
                model_kind=model_cfg["type"])
            t0 = time.time()
            state = train_map(state, mtrain_loader, test_loader,
                              num_epochs=epochs,
                              alpha=alpha * alpha_factor,
                              verbose=False)
            t_map = time.time() - t0
            vnll, vacc = val_metrics_map(state, val_loader)
            tnll, tacc = val_metrics_map(state, test_loader)
            wnorm = float(jnp.sqrt(sum(
                jnp.vdot(p_, p_).real
                for p_ in jax.tree_util.tree_leaves(state.params))))
            mrow = {"kind": "map_point", "map_seed": mseed,
                    "variant": variant, "epochs": epochs,
                    "map_val_nll": round(vnll, 5),
                    "map_val_acc": round(vacc, 4),
                    "map_test_nll": round(tnll, 5),
                    "map_test_acc": round(tacc, 4),
                    "wnorm": round(wnorm, 3),
                    "map_s": round(t_map, 1)}
            print("[map-study] " + json.dumps(mrow), flush=True)
            out.write(json.dumps(mrow) + "\n")
            out.flush()

            for zs in range(args.n_z_seeds):
                ip_seed = (ip_cfg["seed"] if zs == 0
                           else 1000 + 7919 * zs) % (2**31)
                batches = cycling_batches(make_dataloaders(
                    ArrayDataset(*tr), ArrayDataset(*te),
                    ArrayDataset(*va), batch_size=ip_cfg["batch_size"],
                    seed=ip_seed)[0])
                for init_name, z0 in (("first_m", z_first),
                                      ("kmeans", z_kmeans)):
                    t0 = time.time()
                    Z = train_inducing_points(
                        state, z0, optax.adam(ip_cfg["lr"]), batches,
                        rng=jax.random.PRNGKey(ip_seed), **train_kwargs)
                    t_train = time.time() - t0
                    kl = float(full_set_kl(Z, X_full, state, alpha,
                                           full_set_size))
                    predictor = ScalableLLAPredictor(
                        state, Z, full_set_size=full_set_size,
                        range_clip_min=range_clip)
                    erng = jax.random.PRNGKey(155858)
                    val_nll, _ = eval_dataset(
                        state, val_loader, Z, alpha=alpha,
                        full_set_size=full_set_size,
                        num_mc_samples=args.mc,
                        rng=jax.random.fold_in(erng, 1),
                        predictor=predictor)
                    rec = eval_dataset_extended(
                        state, test_loader, Z, alpha=alpha,
                        full_set_size=full_set_size,
                        num_mc_samples=args.mc,
                        rng=jax.random.fold_in(erng, 2),
                        predictor=predictor)
                    auroc = auroc_ood(
                        state, rec["probs"], ood_loader, Z, alpha=alpha,
                        full_set_size=full_set_size,
                        num_mc_samples=args.mc,
                        rng=jax.random.fold_in(erng, 3),
                        predictor=predictor)
                    row = {"kind": "run", "map_seed": mseed,
                           "variant": variant, "z_seed": ip_seed,
                           "z_init": init_name,
                           "map_val_nll": round(vnll, 5),
                           "full_set_kl": round(kl, 4),
                           "val_nll": round(float(val_nll), 5),
                           "nll": round(float(rec["nll"]), 5),
                           "acc": round(float(rec["acc"]), 4),
                           "ece": round(float(rec["ece"]), 5),
                           "brier": round(float(rec["brier"]), 5),
                           "ood_auroc": round(float(auroc), 5),
                           "train_s": round(t_train, 1)}
                    print("[map-study] " + json.dumps(row), flush=True)
                    out.write(json.dumps(row) + "\n")
                    out.flush()
                    rows.append(row)
    out.close()

    # ---- selector analysis --------------------------------------------
    variant_names = [v[0] for v in variants]
    print("\n=== MAP-axis analysis (AUROC in %) ===")
    for variant in variant_names:
        for init_name in ("first_m", "kmeans"):
            sel = [r for r in rows if r["variant"] == variant
                   and r["z_init"] == init_name]
            if not sel:
                continue
            a = np.array([r["ood_auroc"] for r in sel]) * 100
            print(f"{variant:5s}/{init_name:8s}: "
                  f"mean {a.mean():.1f}  min {a.min():.1f}  "
                  f"max {a.max():.1f}  (n={len(a)})")
    # MAP selection by val NLL: per (variant, init), pick the MAP seed with
    # the lowest map_val_nll; report the mean-over-z-seeds AUROC of that MAP
    # vs the grand mean and the oracle MAP.
    for variant in variant_names:
        for init_name in ("first_m", "kmeans"):
            sel = [r for r in rows if r["variant"] == variant
                   and r["z_init"] == init_name]
            if not sel:
                continue
            by_map = {}
            for r in sel:
                by_map.setdefault(r["map_seed"], []).append(r)
            means = {s: float(np.mean([r["ood_auroc"] for r in rr])) * 100
                     for s, rr in by_map.items()}
            vnlls = {s: rr[0]["map_val_nll"] for s, rr in by_map.items()}
            pick = min(vnlls, key=vnlls.get)
            oracle = max(means, key=means.get)
            print(f"{variant:5s}/{init_name:8s}: val-NLL-selected MAP "
                  f"{means[pick]:.1f} | grand mean "
                  f"{np.mean(list(means.values())):.1f} | oracle MAP "
                  f"{means[oracle]:.1f}")


if __name__ == "__main__":
    main()
