"""Scale-experiment trainer: MNIST / FashionMNIST / CIFAR-10.

Parity: ``/root/reference/scale_experiments/train.py`` — MAP with cosine LR
decay, optional α grid search, inducing-point training — with a working
``--continue`` (the reference declares the flag but never implements it,
``train.py:31-32``) and mesh-sharded data parallelism.

Usage:
    python -m laplace_inducing_points_tpu.cli.train_scale full_pipeline \
        --dataset mnist --config configs/scale/lenet5_mnist.yml
"""

from __future__ import annotations

import argparse
import math
import os

import jax
import jax.numpy as jnp
import optax

from laplace_inducing_points_tpu.data.loader import cycling_batches
from laplace_inducing_points_tpu.data.scale import get_dataloaders
from laplace_inducing_points_tpu.models.registry import get_model
from laplace_inducing_points_tpu.models.state import create_train_state
from laplace_inducing_points_tpu.parallel.mesh import batch_sharding, make_mesh
from laplace_inducing_points_tpu.training.grid_search import grid_search_alpha
from laplace_inducing_points_tpu.training.inducing import train_inducing_points
from laplace_inducing_points_tpu.training.map import cosine_lr, train_map
from laplace_inducing_points_tpu.utils.checkpoint import (load_train_state,
                                                          save_array,
                                                          save_run_meta,
                                                          save_train_state)
from laplace_inducing_points_tpu.utils.config import load_experiment_config


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["train_map", "train_inducing",
                                    "full_pipeline"])
    p.add_argument("--dataset", required=True,
                   help="mnist | fmnist | cifar10")
    p.add_argument("--config", required=True)
    p.add_argument("--continue", dest="resume", action="store_true",
                   help="resume MAP training from the latest checkpoint")
    p.add_argument("--alpha_ip", type=float, default=None)
    p.add_argument("--alpha_mode", default="grid",
                   choices=["grid", "evidence"],
                   help="grid = validation-NLL grid search; evidence = "
                        "interleave MAP with gradient ascent on the log "
                        "marginal likelihood (train_map_then_alpha)")
    p.add_argument("--objective", default=None,
                   choices=["dense", "gram", "gram_chunked", "stochastic", "stochastic_matfree"])
    p.add_argument("--ckpt_map", default="checkpoint/map/")
    p.add_argument("--ckpt_induc", default="checkpoint/ind/")
    p.add_argument("--data_dir", default="data/")
    p.add_argument("--no-mesh", action="store_true",
                   help="disable data-parallel sharding")
    p.add_argument("--train_log", default=None,
                   help="JSONL path: per-step {step, loss, seconds} rows "
                        "for the inducing phase plus one kl_training_run "
                        "summary row (loss trajectory, s/step, CG "
                        "healthcheck) — the training-run evidence format "
                        "of results/matfree_scale_tpu.jsonl")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a TensorBoard-loadable jax.profiler device "
                        "trace of the inducing-training phase into DIR "
                        "(utils.profiling.trace). Traces grow with step "
                        "count — use a short run when profiling. Only the "
                        "inducing phase is traced: with mode=train_map "
                        "(which has no inducing phase) the flag is an error")
    p.add_argument("--range_clip", type=float, default=1.0,
                   help="clip min for (alpha + beta*lam) inside the "
                        "posterior inverse sqrt during the alpha grid "
                        "search — MUST match cli.evaluate's setting so the "
                        "selected alpha is optimal for the posterior "
                        "actually evaluated; 1.0 is both CLIs' default "
                        "(reference monkeypatch parity); <=0 disables")
    return p


def main(argv=None):
    from laplace_inducing_points_tpu.utils import setup_compile_cache
    setup_compile_cache()
    from laplace_inducing_points_tpu.utils import acquire_tpu_lock
    acquire_tpu_lock()   # serialize with the driver bench window
    args = build_parser().parse_args(argv)
    if args.profile and args.mode == "train_map":
        # --profile traces the inducing phase only; in train_map mode main()
        # returns before it, so the flag would silently produce no trace
        raise SystemExit(
            "--profile traces the inducing-training phase, which "
            "mode=train_map never reaches — run mode=train_inducing or "
            "full_pipeline to profile, or drop the flag")
    cfg = load_experiment_config(args.config)
    model_cfg = cfg["model"]
    opt_cfg = cfg["optimization"]
    map_cfg = opt_cfg["map"]
    ip_cfg = opt_cfg["ip"]
    alpha = opt_cfg["alpha"]
    full_set_size = opt_cfg["full_set_size"]

    train_loader, test_loader, val_loader = get_dataloaders(
        args.dataset, map_cfg["batch_size"], root=args.data_dir)
    full_set_size = full_set_size or len(train_loader.dataset)

    sharding = None
    if not args.no_mesh and len(jax.devices()) > 1:
        mesh = make_mesh()
        sharding = batch_sharding(mesh)
        print(f"[mesh] data-parallel over {len(jax.devices())} devices")

    dummy = jnp.asarray(next(iter(train_loader))[0][:1], dtype=jnp.float32)
    # schedule over the steps the loader actually yields (full_set_size is
    # the beta-recalibration N, which may differ from the loaded dataset —
    # e.g. the offline surrogate is smaller than the real full set; and the
    # train loader drops its tail batch, so ask the loader, don't recompute)
    try:
        steps_per_epoch = len(train_loader)
    except TypeError:
        steps_per_epoch = math.ceil(len(train_loader.dataset)
                                    / map_cfg["batch_size"])
    if map_cfg.get("schedule", "cosine") == "cosine":
        lr = cosine_lr(map_cfg["lr"], map_cfg["epochs"], steps_per_epoch)
    else:
        lr = map_cfg["lr"]
    model = get_model(model_cfg)
    state = create_train_state(model,
                               jax.random.PRNGKey(model_cfg.get("seed", 0)),
                               dummy, optax.adam(lr),
                               model_kind=model_cfg["type"])

    map_dir = os.path.join(args.ckpt_map, f"map_{args.dataset}")
    if args.resume:
        try:
            state = load_train_state(state, map_dir)
            print(f"[resume] continuing from step {int(state.step)}")
        except FileNotFoundError:
            print("[resume] no checkpoint found — starting fresh")

    evidence_alpha = None
    if args.mode in ("train_map", "full_pipeline"):
        if args.alpha_mode == "evidence":
            from laplace_inducing_points_tpu.training.alpha import (
                train_map_then_alpha)
            state, evidence_alpha = train_map_then_alpha(
                state, train_loader, test_loader,
                num_epochs=map_cfg["epochs"], alpha0=alpha,
                burnin=max(map_cfg["epochs"] // 4, 1),
                full_set_size=full_set_size)
            print(f"[alpha] evidence-optimized alpha = {evidence_alpha:.5f}")
        else:
            state = train_map(state, train_loader, test_loader,
                              num_epochs=map_cfg["epochs"], alpha=alpha,
                              sharding=sharding)
        save_train_state(state, map_dir, step=map_cfg["epochs"])
        print("[DONE] MAP training.")
        if args.mode == "train_map":
            return
    elif not args.resume:
        state = load_train_state(state, map_dir)

    # inducing points: init from a training batch of size m (no augmentation)
    m = ip_cfg["m"]
    init_loader, *_ = get_dataloaders(args.dataset, m, aug=False,
                                      root=args.data_dir)
    z_init = jnp.asarray(next(iter(init_loader))[0], dtype=jnp.float32)
    ip_loader, _, _ = get_dataloaders(args.dataset, ip_cfg["batch_size"],
                                      aug=False, root=args.data_dir)

    alpha_ip = args.alpha_ip if args.alpha_ip is not None else evidence_alpha
    alpha_src = "cli" if args.alpha_ip is not None else "evidence"
    if alpha_ip is None:
        range_clip = args.range_clip if args.range_clip > 0 else None
        sampling_cfg = cfg.get("sampling", {})
        alpha_ip = grid_search_alpha(
            state, z_init, val_loader, full_set_size=full_set_size,
            num_mc_samples=ip_cfg["mc_samples"], log10_min=1.0,
            log10_max=3.0, n_coarse=8, range_clip_min=range_clip,
            predictive=sampling_cfg.get("predictive", "weight"),
            jac_block=sampling_cfg.get("jac_block"))
        alpha_src = "grid"

    objective = args.objective or ip_cfg.get("objective", "gram")

    callback = None
    train_log_rows = []
    if args.train_log:
        import json
        import time

        t_last = [time.perf_counter()]

        def callback(step, _Z, loss):
            now = time.perf_counter()
            row = {"step": step, "loss": round(loss, 4),
                   "seconds": round(now - t_last[0], 2)}
            t_last[0] = now
            train_log_rows.append(row)
            with open(args.train_log, "a" if step else "w") as f:
                f.write(json.dumps(row) + "\n")

    import contextlib

    from laplace_inducing_points_tpu.utils.profiling import trace
    prof = trace(args.profile) if args.profile else contextlib.nullcontext()
    with prof:
        Z = train_inducing_points(
            state, z_init, optax.adam(ip_cfg["lr"]),
            cycling_batches(ip_loader), alpha=alpha_ip,
            num_steps=ip_cfg["epochs"], full_set_size=full_set_size,
            objective=objective,
            rng=jax.random.PRNGKey(ip_cfg["seed"] % (2**31)),
            st_samples=ip_cfg["st_samples"], slq_samples=ip_cfg["slq_samples"],
            slq_num_matvecs=ip_cfg["slq_num_matvecs"],
            example_block=ip_cfg.get("example_block"),
            cg_tol=ip_cfg["cg_tol"], cg_maxiter=ip_cfg["cg_maxiter"],
            precond_rank=ip_cfg["precond_rank"],
            precond_power=ip_cfg["precond_power"],
            cg_example_block=ip_cfg.get("cg_example_block"),
            callback=callback)
    if args.profile:
        print(f"[profile] device trace written to {args.profile}")
    if args.train_log and train_log_rows:
        import json

        import numpy as np
        losses = [r["loss"] for r in train_log_rows]
        warm = ([r["seconds"] for r in train_log_rows[1:]]
                or [r["seconds"] for r in train_log_rows])
        summary = {"op": "kl_training_run", "objective": objective,
                   "M": int(m), "steps": len(losses),
                   "seconds_per_step": round(float(np.median(warm)), 2),
                   "first_step_seconds": train_log_rows[0]["seconds"],
                   "loss_first": losses[0], "loss_last": losses[-1],
                   "loss_min": min(losses), "alpha_ip": float(alpha_ip),
                   "cg_tol": ip_cfg["cg_tol"],
                   "cg_maxiter": ip_cfg["cg_maxiter"],
                   "precond_rank": ip_cfg["precond_rank"],
                   "precond_power": ip_cfg["precond_power"]}
        if objective == "stochastic_matfree":
            from laplace_inducing_points_tpu.training.inducing import (
                matfree_cg_healthcheck)
            hc = matfree_cg_healthcheck(
                state, Z, alpha_ip, full_set_size=full_set_size,
                cg_tol=ip_cfg["cg_tol"], cg_maxiter=ip_cfg["cg_maxiter"],
                precond_rank=ip_cfg["precond_rank"],
                precond_power=ip_cfg["precond_power"],
                cg_example_block=ip_cfg.get("cg_example_block"), warn=False)
            summary["cg_rel_residual_post"] = f"{hc['cg_rel_residual']:.2e}"
            summary["cg_converged_post"] = bool(hc["converged"])
            summary["kappa_post"] = round(hc["kappa"], 1)
            summary["kappa_deflated_post"] = round(hc["kappa_deflated"], 1)
            summary["predicted_iters_post"] = round(hc["predicted_iters"], 1)
        with open(args.train_log, "a") as f:
            f.write(json.dumps(summary) + "\n")
        print(f"[train_log] wrote {len(train_log_rows)} step rows + summary "
              f"-> {args.train_log}")
    save_array(Z, args.ckpt_induc, f"ind_{args.dataset}", ip_cfg["epochs"])
    # record the alpha this Z was trained for, so cli.evaluate's
    # "pipeline meta" precedence reproduces the operating point without a
    # hand-passed --alpha_ip (parity with main_toy's meta record)
    save_run_meta(args.ckpt_induc, f"ind_{args.dataset}",
                  {"alpha_ip": float(alpha_ip), "alpha_src": alpha_src,
                   "objective": objective})
    print(f"[DONE] Inducing training (alpha_ip={alpha_ip:.5g}, "
          f"{alpha_src}).")


if __name__ == "__main__":
    main()
