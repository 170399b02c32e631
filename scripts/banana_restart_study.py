"""Per-candidate restart study: which train-time selector predicts OOD AUROC?

The round-4 scatter (``results/banana_r4_scatter.jsonl``) shows k-restart
Z training selected by full-set KL moves the fresh-rerun AUROC@r1.05
scatter from 77-79% to 77-85% — better, but selection helped some seeds
and hurt others, i.e. the KL ranking of candidates only weakly predicts
their OOD ranking. This script gets the data to choose the selector
empirically: for each seed it trains ``--n_restarts`` candidates exactly
as ``train_inducing_points_restarts`` would, then evaluates EVERY
candidate (not just the KL-argmin) — recording per candidate the full-set
KL, the validation NLL, and the final test/OOD metrics at the
like-for-like operating point (ring radius 1.05, MC from the config).

From the rows we can compute, per seed: AUROC of the KL-selected
candidate, of the val-NLL-selected candidate, of the oracle best, and of
the mean candidate — i.e. exactly how much each implementable selector
recovers of the oracle gap.

No reference analog (the reference trains Z once from a fixed seed,
``/root/reference/src/train_inducing.py:235``, and its recorded banana
variance columns are eval-MC repetitions of that single Z,
``/root/reference/vis-exp-data.py:5-41``).

Usage (CPU):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python \
        scripts/banana_restart_study.py --n_seeds 8 --n_restarts 4 \
        --out results/banana_r4_restart_study.jsonl
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
    auroc_ood, eval_dataset, eval_dataset_extended, make_batch_sampler)
from laplace_inducing_points_tpu.inference.lla import ScalableLLAPredictor
from laplace_inducing_points_tpu.models.registry import get_model
from laplace_inducing_points_tpu.models.state import create_train_state
from laplace_inducing_points_tpu.training.inducing import (
    full_set_kl, train_inducing_points)
from laplace_inducing_points_tpu.utils import setup_compile_cache
from laplace_inducing_points_tpu.utils.checkpoint import load_train_state
from laplace_inducing_points_tpu.utils.config import load_experiment_config


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n_seeds", type=int, default=8)
    p.add_argument("--n_restarts", type=int, default=4)
    p.add_argument("--config", default="configs/toy/classifier_banana.yml")
    p.add_argument("--ood_radius", type=float, default=1.05)
    p.add_argument("--mc", type=int, default=None,
                   help="eval MC samples (default: config ip.mc_samples)")
    p.add_argument("--range_clip", type=float, default=1.0)
    p.add_argument("--num_steps", type=int, default=None,
                   help="override ip.epochs (Z-training steps)")
    p.add_argument("--alpha_anneal", type=str, default=None,
                   help="comma list of training-phase alphas (continuation: "
                        "train num_steps/len(list) steps at each, e.g. "
                        "'10,0.0025'). Eval alpha stays the config value. "
                        "Default: config alpha throughout.")
    p.add_argument("--data_dir", default="data/")
    p.add_argument("--ckpt_map", default="checkpoint/map/")
    p.add_argument("--out", default="results/banana_r4_restart_study.jsonl")
    args = p.parse_args()

    setup_compile_cache()
    cfg = load_experiment_config(args.config)
    model_cfg, opt_cfg = cfg["model"], cfg["optimization"]
    ip_cfg = opt_cfg["ip"]
    alpha = float(opt_cfg["alpha"])
    mc = args.mc or ip_cfg["mc_samples"]
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

    bs = opt_cfg["map"]["batch_size"]
    _, test_loader, val_loader = make_dataloaders(
        ArrayDataset(*tr), ArrayDataset(*te), ArrayDataset(*va),
        batch_size=bs, seed=0)
    _, ood_loader, _ = make_dataloaders(
        ArrayDataset(*tr), ArrayDataset(*ote), ArrayDataset(*va),
        batch_size=bs, seed=0)

    model = get_model(model_cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(model_cfg.get("seed", 0)),
        jnp.asarray(tr[0][:1]), optax.adam(opt_cfg["map"]["lr"]),
        model_kind=model_cfg["type"])
    state = load_train_state(state, os.path.join(args.ckpt_map,
                                                 "map_banana"))

    m = ip_cfg["m"]
    z_init = jnp.asarray(tr[0][:m])
    X_full = jnp.asarray(tr[0])
    range_clip = args.range_clip if args.range_clip > 0 else None

    # OOD-free far-probe set: uniform points in the 25%-expanded bounding
    # box of the TRAIN set, kept only where farther from every train point
    # than 3x the 95th-percentile nearest-neighbor spacing. Uses train
    # statistics only (no OOD data) — a candidate-selection signal for
    # "does this Z keep uncertainty high off the data manifold?".
    pk = jax.random.PRNGKey(977)
    lo, hi = X_full.min(0), X_full.max(0)
    span = hi - lo
    cand = jax.random.uniform(pk, (4096, X_full.shape[1]),
                              minval=lo - 0.25 * span,
                              maxval=hi + 0.25 * span)
    d2 = jnp.sum((cand[:, None, :] - X_full[None, :, :]) ** 2, -1)
    nn_cand = jnp.sqrt(d2.min(1))
    d2_tr = jnp.sum((X_full[:, None, :] - X_full[None, :, :]) ** 2, -1)
    d2_tr = d2_tr + jnp.eye(X_full.shape[0]) * 1e9
    nn_spacing = jnp.percentile(jnp.sqrt(d2_tr.min(1)), 95)
    far = cand[nn_cand > 3.0 * nn_spacing][:256]
    print(f"[study] far-probe set: {far.shape[0]} points "
          f"(spacing threshold {float(3.0 * nn_spacing):.3f})", flush=True)

    train_kwargs = dict(
        alpha=alpha, num_steps=args.num_steps or ip_cfg["epochs"],
        full_set_size=full_set_size,
        objective=ip_cfg.get("objective", "gram"),
        st_samples=ip_cfg["st_samples"],
        slq_samples=ip_cfg["slq_samples"],
        slq_num_matvecs=ip_cfg["slq_num_matvecs"],
        cg_tol=ip_cfg["cg_tol"], cg_maxiter=ip_cfg["cg_maxiter"],
        precond_rank=ip_cfg["precond_rank"], verbose=False)

    with open(args.out, "w"):
        pass
    for s in range(args.n_seeds):
        ip_seed = 1000 + 7919 * s          # same seeds as banana_scatter.py
        # mirror train_inducing_points_restarts' per-restart rng exactly
        rng0 = jax.random.PRNGKey(ip_seed % (2**31))
        batches = cycling_batches(make_dataloaders(
            ArrayDataset(*tr), ArrayDataset(*te), ArrayDataset(*va),
            batch_size=ip_cfg["batch_size"], seed=ip_seed % (2**31))[0])
        for r in range(args.n_restarts):
            r_rng = jax.random.fold_in(rng0, r)
            if r == 0:
                z0 = z_init
            else:
                idx = jax.random.choice(jax.random.fold_in(r_rng, 1),
                                        X_full.shape[0], shape=(m,),
                                        replace=X_full.shape[0] < m)
                z0 = X_full[idx]
            t0 = time.time()
            if args.alpha_anneal:
                phases = [float(a) for a in args.alpha_anneal.split(",")]
                per = max(1, train_kwargs["num_steps"] // len(phases))
                Z = z0
                for pi, a_ph in enumerate(phases):
                    kw = dict(train_kwargs, alpha=a_ph, num_steps=per)
                    Z = train_inducing_points(
                        state, Z, optax.adam(ip_cfg["lr"]), batches,
                        rng=jax.random.fold_in(r_rng, 100 + pi), **kw)
            else:
                Z = train_inducing_points(state, z0,
                                          optax.adam(ip_cfg["lr"]),
                                          batches, rng=r_rng, **train_kwargs)
            t_train = time.time() - t0
            kl = float(full_set_kl(Z, X_full, state, alpha, full_set_size))

            predictor = ScalableLLAPredictor(
                state, Z, full_set_size=full_set_size,
                range_clip_min=range_clip)
            erng = jax.random.PRNGKey(155858)
            val_nll, _ = eval_dataset(
                state, val_loader, Z, alpha=alpha,
                full_set_size=full_set_size, num_mc_samples=mc,
                rng=jax.random.fold_in(erng, 1), predictor=predictor)
            rec = eval_dataset_extended(
                state, test_loader, Z, alpha=alpha,
                full_set_size=full_set_size, num_mc_samples=mc,
                rng=jax.random.fold_in(erng, 2), predictor=predictor)
            auroc = auroc_ood(
                state, rec["probs"], ood_loader, Z, alpha=alpha,
                full_set_size=full_set_size, num_mc_samples=mc,
                rng=jax.random.fold_in(erng, 3), predictor=predictor)
            sampler = make_batch_sampler(
                state, Z, alpha=alpha, full_set_size=full_set_size,
                num_mc_samples=mc, predictor=predictor)
            logits = sampler(far, jax.random.fold_in(erng, 4), None)
            p_probe = jax.nn.softmax(logits, axis=-1).mean(0)
            probe_maxp = float(jnp.mean(jnp.max(p_probe, -1)))
            probe_ent = float(jnp.mean(
                -jnp.sum(p_probe * jnp.log(p_probe + 1e-12), -1)))
            row = {"seed": ip_seed, "restart": r,
                   "alpha_anneal": args.alpha_anneal,
                   "full_set_kl": round(kl, 4),
                   "val_nll": round(float(val_nll), 5),
                   "nll": round(float(rec["nll"]), 5),
                   "acc": round(float(rec["acc"]), 4),
                   "ece": round(float(rec["ece"]), 5),
                   "brier": round(float(rec["brier"]), 5),
                   "ood_auroc": round(float(auroc), 5),
                   "probe_maxp": round(probe_maxp, 5),
                   "probe_ent": round(probe_ent, 5),
                   "train_s": round(t_train, 1)}
            print("[study] " + json.dumps(row), flush=True)
            with open(args.out, "a") as fh:
                fh.write(json.dumps(row) + "\n")

    # ---- per-seed selector comparison ------------------------------------
    rows = [json.loads(l) for l in open(args.out)]
    seeds = sorted({r["seed"] for r in rows})
    sel = {"kl": [], "val_nll": [], "probe_ent": [], "oracle": [],
           "mean": [], "first": []}
    for sd in seeds:
        cands = [r for r in rows if r["seed"] == sd]
        sel["kl"].append(min(cands, key=lambda r: r["full_set_kl"])
                         ["ood_auroc"])
        sel["val_nll"].append(min(cands, key=lambda r: r["val_nll"])
                              ["ood_auroc"])
        sel["probe_ent"].append(max(cands, key=lambda r: r["probe_ent"])
                                ["ood_auroc"])
        sel["oracle"].append(max(c["ood_auroc"] for c in cands))
        sel["mean"].append(float(np.mean([c["ood_auroc"] for c in cands])))
        sel["first"].append(cands[0]["ood_auroc"])
    for k, v in sel.items():
        print(f"[study] selector={k:8s} AUROC min={min(v):.3f} "
              f"max={max(v):.3f} mean={float(np.mean(v)):.3f}", flush=True)


if __name__ == "__main__":
    main()
