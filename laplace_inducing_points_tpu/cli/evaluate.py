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
from laplace_inducing_points_tpu.inference.lla import ScalableLLAPredictor
from laplace_inducing_points_tpu.models.registry import get_model
from laplace_inducing_points_tpu.models.state import create_train_state
from laplace_inducing_points_tpu.utils.checkpoint import (load_array,
                                                          load_run_meta,
                                                          load_train_state)
from laplace_inducing_points_tpu.utils.config import load_experiment_config

TOY_DATASETS = ("sine", "xor", "spiral", "ring", "banana")


def _loaders(name: str, batch_size: int, data_dir: str, data_cfg=None,
             **gen_kwargs):
    if name in TOY_DATASETS:
        data_cfg = dict(data_cfg or {})
        data_cfg.update(gen_kwargs)
        x, y = load_dataset(ensure_toy_npz(
            name, data_dir=data_dir, n=data_cfg.pop("n", 512),
            noise=data_cfg.pop("noise", 0.05),
            seed=data_cfg.pop("seed", 42), **data_cfg))
        tr, te, va = train_test_val_split(x, y)
        return make_dataloaders(ArrayDataset(*tr), ArrayDataset(*te),
                                ArrayDataset(*va), batch_size)
    return get_dataloaders(name, batch_size, root=data_dir, aug=False)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True)
    p.add_argument("--ood-dataset", default=None)
    p.add_argument("--ood_ring_radius", type=float, default=None,
                   help="when --ood-dataset is 'ring', generate it at this "
                        "radius. Default: the reference data-gen CLI's "
                        "hard-coded 2.0 (toydata.py:227-233); its generator "
                        "function default is 1.05 (:91) — the non-trivial "
                        "OOD set flush against the banana support. "
                        "RESULTS.md reports both")
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt_map", default="checkpoint/map/")
    p.add_argument("--ckpt_induc", default="checkpoint/ind/")
    p.add_argument("--scalable", action="store_true")
    p.add_argument("--alpha_ip", type=float, default=None)
    p.add_argument("--range_clip", type=float, default=1.0,
                   help="clip range-space eigenvalues of (aI+bG) from below "
                        "inside the posterior inverse sqrt; 1.0 reproduces "
                        "the reference's monkeypatched sampler "
                        "(matfree_monkeypatch.py:20); <=0 disables (exact)")
    p.add_argument("--sample_block", type=int, default=None,
                   help="chunk the MC-sample axis of the predictive "
                        "push-forward (bounds HBM at large models x large "
                        "batch); default: config sampling.sample_block")
    p.add_argument("--predictive", choices=["weight", "cov", "matfree"],
                   default=None,
                   help="scalable predictive path: 'weight' pushes each MC "
                        "draw through a jvp (reference parity); 'cov' builds "
                        "per-image predictive statistics with K backward "
                        "passes and samples a 2K-dim Gaussian — same "
                        "distribution, ~K/S of the network work, and "
                        "alpha-independent cached stats across repetitions; "
                        "'matfree' evaluates d_z-UNBOUNDED checkpoints "
                        "(Matheron draws via Nystrom-preconditioned CG, no "
                        "d_z x D factor, no eigh — use for inducing sets "
                        "beyond eigh/HBM range; exact sampler, so "
                        "--range_clip is ignored). "
                        "Default: config sampling.predictive, else 'weight'")
    p.add_argument("--cg_tol", type=float, default=None,
                   help="matfree predictive: CG tolerance (default config "
                        "sampling.cg_tol, 1e-4)")
    p.add_argument("--cg_maxiter", type=int, default=None,
                   help="matfree predictive: CG iteration cap (default "
                        "10*d_z)")
    p.add_argument("--precond_power", type=int, default=None,
                   help="matfree predictive: Nystrom sketch subspace-"
                        "iteration passes (default config sampling."
                        "precond_power, 0); raises sketch accuracy at "
                        "front-loaded spectra for (1+power)*rank matvecs")
    p.add_argument("--precond_rank", type=int, default=None,
                   help="matfree predictive: Nystrom deflation rank, 0 "
                        "disables (default config sampling.precond_rank, 64)")
    p.add_argument("--cg_example_block", type=int, default=None,
                   help="matfree predictive: run the HIGHEST-precision CG "
                        "operator's jvp/vjp in example blocks of this size "
                        "(bounds the remote-compile graph; default config "
                        "sampling.cg_example_block)")
    p.add_argument("--jac_block", type=int, default=None,
                   help="image-axis chunk for the cov path's Jacobian build "
                        "(bounds (block, K, D) HBM); default config "
                        "sampling.jac_block")
    p.add_argument("--mesh", action="store_true",
                   help="shard the MC-sample axis of the scalable predictor "
                        "over all local devices (data-parallel evaluation; "
                        "no-op on one device)")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--max_batches", type=int, default=None,
                   help="evaluate only the first N test batches (smoke "
                        "runs / CI; metrics then cover a subset)")
    p.add_argument("--out_json", default=None,
                   help="append per-repetition metrics as JSON lines")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a TensorBoard-loadable jax.profiler device "
                        "trace of the LAST evaluation repetition into DIR "
                        "(utils.profiling.trace). With --iters >= 2 the "
                        "traced repetition is warm (compiles and the "
                        "amortized factor build happened in earlier reps); "
                        "with --iters 1 the trace INCLUDES one-time JIT "
                        "compilation and the posterior factor build — not "
                        "steady state (a warning is printed)")
    p.add_argument("--data_dir", default="data/")
    return p


def main(argv=None):
    from laplace_inducing_points_tpu.utils import setup_compile_cache
    setup_compile_cache()
    from laplace_inducing_points_tpu.utils import acquire_tpu_lock
    acquire_tpu_lock()   # serialize with the driver bench window
    args = build_parser().parse_args(argv)
    cfg = load_experiment_config(args.config)
    model_cfg = cfg["model"]
    opt_cfg = cfg["optimization"]
    ip_cfg = opt_cfg["ip"]
    # alpha precedence: CLI flag > pipeline-recorded (grid-searched) alpha
    # > config — so evaluation reproduces the training pipeline's operating
    # point with NO hand-picked value
    meta = load_run_meta(args.ckpt_induc, f"ind_{args.dataset}")
    if args.alpha_ip is not None:
        alpha, alpha_src = args.alpha_ip, "cli"
    elif meta and "alpha_ip" in meta:
        alpha, alpha_src = float(meta["alpha_ip"]), "pipeline meta"
    else:
        alpha, alpha_src = opt_cfg["alpha"], "config"
    full_set_size = opt_cfg["full_set_size"]
    print(f"alpha={alpha} ({alpha_src})")

    train_loader, test_loader, _ = _loaders(
        args.dataset, opt_cfg["map"]["batch_size"], args.data_dir,
        data_cfg=cfg.get("data"))
    ood_loader = None
    if args.ood_dataset:
        # test split for ALL dataset kinds (toy included) — a consistent
        # OOD evaluation protocol
        ood_kwargs = {}
        if args.ood_dataset == "ring" and args.ood_ring_radius is not None:
            from laplace_inducing_points_tpu.data.toy import ring_cache_fname
            ood_kwargs = {"radius": args.ood_ring_radius,
                          "fname": ring_cache_fname(args.ood_ring_radius)}
        _, ood_loader, _ = _loaders(args.ood_dataset,
                                    opt_cfg["map"]["batch_size"],
                                    args.data_dir, **ood_kwargs)

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

    # amortize the posterior factor across repetitions AND the OOD pass —
    # it depends only on (state, Z, alpha-free algebra)
    predictor = None
    example_block = ip_cfg.get("example_block")
    range_clip = args.range_clip if args.range_clip > 0 else None
    sample_block = (args.sample_block if args.sample_block is not None
                    else cfg.get("sampling", {}).get("sample_block"))
    if args.scalable:
        t0 = time.time()
        mesh = None
        if args.mesh and len(jax.devices()) > 1:
            from laplace_inducing_points_tpu.parallel.mesh import make_mesh
            mesh = make_mesh()
            print(f"[mesh] MC-sample axis over {len(jax.devices())} devices")
        sampling_cfg = cfg.get("sampling", {})
        predictive = (args.predictive
                      or sampling_cfg.get("predictive", "weight"))
        jac_block = (args.jac_block if args.jac_block is not None
                     else sampling_cfg.get("jac_block"))
        if predictive != "weight":
            print(f"[predictor] predictive method: {predictive}")
            if predictive == "cov" and (mesh is not None or sample_block):
                print("[predictor] NOTE: --mesh/sample_block apply only to "
                      "the weight-space push-forward; the cov path runs "
                      "replicated (its per-sample cost is a 2K x 2K matvec "
                      "— there is nothing worth sharding)")
                mesh = None
            if predictive == "matfree" and range_clip is not None:
                print("[predictor] NOTE: the matfree path's Matheron "
                      "sampler is exact — --range_clip is ignored")
        cg_tol = (args.cg_tol if args.cg_tol is not None
                  else sampling_cfg.get("cg_tol", 1e-4))
        cg_maxiter = (args.cg_maxiter if args.cg_maxiter is not None
                      else sampling_cfg.get("cg_maxiter"))
        precond_rank = (args.precond_rank if args.precond_rank is not None
                        else sampling_cfg.get("precond_rank", 64)) or None
        precond_power = (args.precond_power
                         if args.precond_power is not None
                         else sampling_cfg.get("precond_power", 0))
        cg_example_block = (args.cg_example_block
                            if args.cg_example_block is not None
                            else sampling_cfg.get("cg_example_block"))
        predictor = ScalableLLAPredictor(state, Z,
                                         full_set_size=full_set_size,
                                         example_block=example_block,
                                         range_clip_min=range_clip,
                                         sample_block=sample_block,
                                         mesh=mesh,
                                         method=predictive,
                                         jac_block=jac_block,
                                         cg_tol=cg_tol,
                                         cg_maxiter=cg_maxiter,
                                         precond_rank=precond_rank,
                                         precond_power=precond_power,
                                         cg_example_block=cg_example_block)
        jax.block_until_ready(predictor.nys if predictive == "matfree"
                              else predictor.lam)
        print(f"[predictor] posterior factor built in {time.time()-t0:.1f} s")

    # method tag for the out_json rows: rows from different predictive
    # paths routinely land in one JSONL (e.g. the weight-vs-matfree
    # cross-check), so each row must say which path produced it
    method_tag = predictive if args.scalable else "dense"

    if args.max_batches:
        class _Limited:
            """First-N-batches view; a stable object so the cov predictor's
            loader-identity cache keys persist across repetitions."""
            def __init__(self, loader, n):
                self.loader, self.n = loader, n
            def __iter__(self):
                import itertools
                return itertools.islice(iter(self.loader), self.n)
        test_loader = _Limited(test_loader, args.max_batches)
        print(f"[eval] limited to first {args.max_batches} test batches")

    import contextlib

    from laplace_inducing_points_tpu.utils.profiling import trace

    if args.profile and args.iters == 1:
        print("[profile] WARNING: --iters 1 means the traced repetition is "
              "COLD — the trace includes JIT compilation and the one-time "
              "posterior factor build, not steady-state execution. Use "
              "--iters >= 2 for a warm trace.")

    rng = jax.random.PRNGKey(155858)
    for i in range(args.iters):
        rng = jax.random.fold_in(rng, i)
        t0 = time.time()
        # trace only the last repetition: with iters >= 2 it is warm
        # (compiles and the amortized factor build are behind it) so the
        # trace shows steady-state device execution; with iters == 1 the
        # only repetition is cold and the warning above applies
        prof = (trace(args.profile)
                if args.profile and i == args.iters - 1
                else contextlib.nullcontext())
        with prof:
            rec = eval_dataset_extended(
                state, test_loader, Z, alpha=alpha,
                full_set_size=full_set_size,
                num_mc_samples=ip_cfg["mc_samples"], rng=rng,
                scalable=args.scalable, predictor=predictor)
        dt = time.time() - t0
        if "acc" in rec:
            print(f"\nTest NLL   : {rec['nll']:8.5f}"
                  f"\nTest Acc   : {rec['acc'] * 100:8.3f} %"
                  f"\nBrier      : {rec['brier']:8.5f}"
                  f"\nECE (15bin): {rec['ece']:8.5f}"
                  f"\nTime       : {dt:6.1f} s")
            record = {"dataset": args.dataset, "alpha": alpha, "iter": i,
                      "predictive": method_tag,
                      "mc": ip_cfg["mc_samples"],
                      "nll": round(rec["nll"], 5), "acc": round(rec["acc"], 5),
                      "brier": round(rec["brier"], 5),
                      "ece": round(rec["ece"], 5),
                      "wallclock_s": round(dt, 2)}
        else:
            print(f"\nTest NLL   : {rec['nll']:8.5f}"
                  f"\nTest RMSE  : {rec['rmse']:8.5f}"
                  f"\nPICP (90%) : {rec['picp90'] * 100:8.3f} %"
                  f"\nTime       : {dt:6.1f} s")
            record = {"dataset": args.dataset, "alpha": alpha, "iter": i,
                      "predictive": method_tag,
                      "mc": ip_cfg["mc_samples"],
                      "nll": round(rec["nll"], 5),
                      "rmse": round(rec["rmse"], 5),
                      "picp90": round(rec["picp90"], 5),
                      "wallclock_s": round(dt, 2)}
        if ood_loader is not None and "probs" in rec:
            rng = jax.random.fold_in(rng, 7)
            auroc = auroc_ood(state, rec["probs"], ood_loader, Z, alpha=alpha,
                              full_set_size=full_set_size,
                              num_mc_samples=ip_cfg["mc_samples"], rng=rng,
                              scalable=args.scalable, predictor=predictor)
            print(f"OOD AUROC  : {auroc * 100:8.3f} %")
            record["ood_auroc"] = round(auroc, 5)
        if args.out_json:
            os.makedirs(os.path.dirname(args.out_json) or ".", exist_ok=True)
            with open(args.out_json, "a") as f:
                f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
