"""Evaluation CLI: NLL / ACC / Brier / ECE (+ OOD AUROC) with timing.

Parity: ``/root/reference/scale_experiments/evaluate.py:236-351`` — loads
MAP + inducing-point checkpoints, runs timed evaluation repetitions, and an
optional OOD pass.

Usage:
    python -m laplace_inducing_points_tpu.cli.evaluate \
        --dataset mnist --ood-dataset fmnist \
        --config configs/scale/lenet5_mnist.yml --scalable
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import optax

from laplace_inducing_points_tpu.data.loader import (ArrayDataset,
                                                     make_dataloaders)
from laplace_inducing_points_tpu.data.scale import get_dataloaders
from laplace_inducing_points_tpu.data.toy import (ensure_toy_npz, load_dataset,
                                                  train_test_val_split)
from laplace_inducing_points_tpu.evaluation.harness import (auroc_ood,
                                                            eval_dataset_extended)
from laplace_inducing_points_tpu.models.registry import get_model
from laplace_inducing_points_tpu.models.state import create_train_state
from laplace_inducing_points_tpu.utils.checkpoint import (load_array,
                                                          load_train_state)
from laplace_inducing_points_tpu.utils.config import load_experiment_config

TOY_DATASETS = ("sine", "xor", "spiral", "ring", "banana")


def _loaders(name: str, batch_size: int, data_dir: str):
    if name in TOY_DATASETS:
        x, y = load_dataset(ensure_toy_npz(name, data_dir=data_dir))
        tr, te, va = train_test_val_split(x, y)
        return make_dataloaders(ArrayDataset(*tr), ArrayDataset(*te),
                                ArrayDataset(*va), batch_size)
    return get_dataloaders(name, batch_size, root=data_dir, aug=False)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True)
    p.add_argument("--ood-dataset", default=None)
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt_map", default="checkpoint/map/")
    p.add_argument("--ckpt_induc", default="checkpoint/ind/")
    p.add_argument("--scalable", action="store_true")
    p.add_argument("--alpha_ip", type=float, default=None)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--out_json", default=None,
                   help="append per-repetition metrics as JSON lines")
    p.add_argument("--data_dir", default="data/")
    return p


def main(argv=None):
    from laplace_inducing_points_tpu.utils import setup_compile_cache
    setup_compile_cache()
    args = build_parser().parse_args(argv)
    cfg = load_experiment_config(args.config)
    model_cfg = cfg["model"]
    opt_cfg = cfg["optimization"]
    ip_cfg = opt_cfg["ip"]
    alpha = args.alpha_ip if args.alpha_ip is not None else opt_cfg["alpha"]
    full_set_size = opt_cfg["full_set_size"]
    print(f"alpha={alpha}")

    train_loader, test_loader, _ = _loaders(
        args.dataset, opt_cfg["map"]["batch_size"], args.data_dir)
    ood_loader = None
    if args.ood_dataset:
        if args.ood_dataset in TOY_DATASETS:
            ood_loader, _, _ = _loaders(args.ood_dataset,
                                        opt_cfg["map"]["batch_size"],
                                        args.data_dir)
        else:
            _, ood_loader, _ = _loaders(args.ood_dataset,
                                        opt_cfg["map"]["batch_size"],
                                        args.data_dir)

    dummy = jnp.asarray(next(iter(train_loader))[0][:1], dtype=jnp.float32)
    full_set_size = full_set_size or len(train_loader.dataset)
    model = get_model(model_cfg)
    state = create_train_state(model,
                               jax.random.PRNGKey(model_cfg.get("seed", 0)),
                               dummy, optax.adam(1e-3),
                               model_kind=model_cfg["type"])
    state = load_train_state(
        state, os.path.join(args.ckpt_map, f"map_{args.dataset}"))
    Z = load_array(args.ckpt_induc, f"ind_{args.dataset}", ip_cfg["epochs"])

    rng = jax.random.PRNGKey(155858)
    for i in range(args.iters):
        rng = jax.random.fold_in(rng, i)
        t0 = time.time()
        nll, acc, bri, cal, probs, labels = eval_dataset_extended(
            state, test_loader, Z, alpha=alpha, full_set_size=full_set_size,
            num_mc_samples=ip_cfg["mc_samples"], rng=rng,
            scalable=args.scalable)
        dt = time.time() - t0
        print(f"\nTest NLL   : {nll:8.5f}"
              f"\nTest Acc   : {acc * 100:8.3f} %"
              f"\nBrier      : {bri:8.5f}"
              f"\nECE (15bin): {cal:8.5f}"
              f"\nTime       : {dt:6.1f} s")
        record = {"dataset": args.dataset, "alpha": alpha, "iter": i,
                  "nll": round(nll, 5), "acc": round(acc, 5),
                  "brier": round(bri, 5), "ece": round(cal, 5),
                  "wallclock_s": round(dt, 2)}
        if ood_loader is not None:
            rng = jax.random.fold_in(rng, 7)
            auroc = auroc_ood(state, probs, ood_loader, Z, alpha=alpha,
                              full_set_size=full_set_size,
                              num_mc_samples=ip_cfg["mc_samples"], rng=rng,
                              scalable=args.scalable)
            print(f"OOD AUROC  : {auroc * 100:8.3f} %")
            record["ood_auroc"] = round(auroc, 5)
        if args.out_json:
            os.makedirs(os.path.dirname(args.out_json) or ".", exist_ok=True)
            with open(args.out_json, "a") as f:
                f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
