"""Toy-experiment pipeline driver.

Parity: ``/root/reference/main.py`` — modes ``train_map`` /
``train_inducing`` / ``visualize`` / ``full_pipeline`` over the toy datasets,
plus the reference's flags (``--full``, ``--scalable``,
``--num_mc_samples_lla``, ``--alpha_ip``, ``--plot_Z``, ``--plot_X``).
Data is generated on demand (no pre-baked npz required).

Usage:
    python -m laplace_inducing_points_tpu.cli.main_toy full_pipeline \
        --dataset banana --config configs/toy/classifier_banana.yml
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import optax

from laplace_inducing_points_tpu.data.loader import (ArrayDataset,
                                                     cycling_batches,
                                                     make_dataloaders)
from laplace_inducing_points_tpu.data.toy import (ensure_toy_npz, load_dataset,
                                                  train_test_val_split)
from laplace_inducing_points_tpu.models.registry import get_model
from laplace_inducing_points_tpu.models.state import create_train_state
from laplace_inducing_points_tpu.training.grid_search import grid_search_alpha
from laplace_inducing_points_tpu.training.inducing import (
    train_inducing_points, train_inducing_points_restarts)
from laplace_inducing_points_tpu.training.map import train_map
from laplace_inducing_points_tpu.utils.checkpoint import (load_array,
                                                          load_train_state,
                                                          save_array,
                                                          save_run_meta,
                                                          save_train_state)
from laplace_inducing_points_tpu.utils.config import load_experiment_config
from laplace_inducing_points_tpu.viz import nplot


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["train_map", "train_inducing",
                                    "visualize", "full_pipeline"])
    p.add_argument("--dataset", required=True,
                   help="toy dataset name (sine/xor/spiral/ring/banana) or "
                        "path to an .npz with x,y arrays")
    p.add_argument("--config", required=True, help="experiment YAML")
    p.add_argument("--full", action="store_true",
                   help="visualize full-data LLA instead of IP-LLA")
    p.add_argument("--scalable", action="store_true",
                   help="matrix-free IP objective + LLA sampling")
    p.add_argument("--objective", default=None,
                   choices=["dense", "gram", "stochastic", "stochastic_matfree"],
                   help="override the inducing objective")
    p.add_argument("--num_mc_samples_lla", type=int, default=1000)
    p.add_argument("--alpha_ip", type=float, default=None)
    p.add_argument("--alpha_mode", default="config",
                   choices=["config", "grid"],
                   help="'config' uses optimization.alpha end-to-end (the "
                        "semantics of the reference's recorded operating "
                        "points); 'grid' runs the val-NLL grid search — "
                        "note val-NLL is monotone in alpha on separable toys "
                        "and drives alpha to the grid edge, collapsing OOD "
                        "AUROC (see RESULTS.md)")
    p.add_argument("--range_clip", type=float, default=1.0,
                   help="reference-parity eigenvalue clip inside the "
                        "posterior inverse sqrt (<=0 disables)")
    p.add_argument("--restarts", type=int, default=None,
                   help="k-restart Z training selected by full-set exact "
                        "KL (variance fix for the multi-modal Z landscape; "
                        "RESULTS.md 'Banana round 4'). Default: config "
                        "optimization.ip.restarts (toy configs: 4); 1 = "
                        "single run")
    p.add_argument("--alpha_train", type=float, default=None,
                   help="train Z at this prior precision (landscape "
                        "smoothing; evaluation keeps the pipeline alpha). "
                        "Default: config optimization.ip.alpha_train, else "
                        "the pipeline alpha. RESULTS.md 'Banana round 4'")
    p.add_argument("--ip_seed", type=int, default=None,
                   help="override optimization.ip.seed (Z-training rng, "
                        "minibatch shuffle, restart inits) — used by the "
                        "end-to-end variance measurements in RESULTS.md "
                        "'Banana round 4'")
    p.add_argument("--plot_Z", action="store_true")
    p.add_argument("--plot_X", action="store_true")
    p.add_argument("--style", default=None, choices=["thesis"],
                   help="'thesis' applies the reference's global figure "
                        "theme (seaborn darkgrid, Computer Modern serif at "
                        "size 22, icefire heatmaps; viz/style.py — mathtext "
                        "in place of its usetex, no TeX binary needed)")
    p.add_argument("--comparison", action="store_true",
                   help="also render the LA-vs-LLA 1x3 predictive-mean "
                        "figure and the 2x1 IP-LLA mean/std figure "
                        "(reference nplot.py:255-394)")
    p.add_argument("--map_restarts", type=int, default=None,
                   help="train k independent MAP fits (fresh model init + "
                        "fresh loader order) and keep the one with the "
                        "lowest validation NLL. The round-5 MAP-axis study "
                        "(scripts/banana_map_study.py, RESULTS.md 'Banana "
                        "round 5') measured the val-NLL selector to be "
                        "informative only with a mildly strengthened MAP "
                        "prior — pair with --map_alpha_factor 2. Default: "
                        "config optimization.map.restarts, else 1.")
    p.add_argument("--map_alpha_factor", type=float, default=None,
                   help="multiply the MAP L2 prior by this factor (the "
                        "inducing/eval alpha is untouched). 2 = the 'reg2' "
                        "variant of the round-5 MAP-axis study: bootstrap "
                        "mean OOD AUROC 84.0 with 4 MAP restarts vs 82.1 "
                        "base. Default: config optimization.map."
                        "alpha_factor, else 1 (parity with the reference).")
    p.add_argument("--ckpt_map", default="checkpoint/map/")
    p.add_argument("--ckpt_induc", default="checkpoint/ind/")
    p.add_argument("--fig_dir", default="fig/")
    p.add_argument("--data_dir", default="data/")
    return p


def main(argv=None):
    from laplace_inducing_points_tpu.utils import setup_compile_cache
    setup_compile_cache()
    from laplace_inducing_points_tpu.utils import acquire_tpu_lock
    acquire_tpu_lock()   # serialize with the driver bench window
    args = build_parser().parse_args(argv)
    if args.style == "thesis":
        from laplace_inducing_points_tpu.viz.style import use_thesis_style
        use_thesis_style()
    cfg = load_experiment_config(args.config)
    model_cfg = cfg["model"]
    opt_cfg = cfg["optimization"]
    map_cfg = opt_cfg["map"]
    ip_cfg = opt_cfg["ip"]
    if args.ip_seed is not None:
        ip_cfg["seed"] = args.ip_seed
    model_kind = model_cfg["type"]
    alpha = opt_cfg["alpha"]

    # ---- data --------------------------------------------------------------
    if args.dataset.endswith(".npz"):
        x, y = load_dataset(args.dataset)
        ds_name = os.path.splitext(os.path.basename(args.dataset))[0]
    else:
        data_cfg = dict(cfg.get("data") or {})
        path = ensure_toy_npz(args.dataset, data_dir=args.data_dir,
                              n=data_cfg.pop("n", 512),
                              noise=data_cfg.pop("noise", 0.05),
                              seed=data_cfg.pop("seed", 42),
                              **data_cfg)   # e.g. split_in_middle
        x, y = load_dataset(path)
        ds_name = args.dataset
    (tr, te, va) = train_test_val_split(x, y)
    train_loader, test_loader, val_loader = make_dataloaders(
        ArrayDataset(*tr), ArrayDataset(*te), ArrayDataset(*va),
        batch_size=map_cfg["batch_size"], seed=map_cfg["seed"] % (2**31))
    full_set_size = opt_cfg.get("full_set_size") or tr[0].shape[0]

    # ---- model + state -----------------------------------------------------
    model = get_model(model_cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(model_cfg.get("seed", 0)),
        jnp.asarray(tr[0][:1]), optax.adam(map_cfg["lr"]),
        model_kind=model_kind)

    map_dir = os.path.join(args.ckpt_map, f"map_{ds_name}")

    # ---- PART A: MAP -------------------------------------------------------
    map_restarts = (args.map_restarts if args.map_restarts is not None
                    else int(map_cfg.get("restarts", 1)))
    map_alpha_factor = (args.map_alpha_factor
                        if args.map_alpha_factor is not None
                        else float(map_cfg.get("alpha_factor", 1.0)))
    map_alpha = alpha * map_alpha_factor
    if args.mode in ("train_map", "full_pipeline"):
        if map_restarts > 1:
            # k-restart MAP selected by validation NLL (round-5 MAP-axis
            # study; the selector is only informative with a strengthened
            # MAP prior — see --map_alpha_factor). Candidate 0 is the
            # default pipeline's exact draw (same init key, same loader).
            from laplace_inducing_points_tpu.training.map import (
                eval_classification, eval_regression)
            eval_step = (eval_regression if model_kind == "regressor"
                         else eval_classification)

            def val_nll(st):
                tot, nb = 0.0, 0
                for xb, yb in val_loader:
                    tot += float(eval_step(st, (jnp.asarray(xb),
                                                jnp.asarray(yb)))[0])
                    nb += 1
                return tot / max(nb, 1)

            best, best_nll, cand_nlls = None, None, []
            for i in range(map_restarts):
                if i == 0:
                    cand, ld = state, train_loader
                else:
                    cand = create_train_state(
                        model,
                        jax.random.PRNGKey(
                            (model_cfg.get("seed", 0) + i * 104729)
                            % (2 ** 31)),
                        jnp.asarray(tr[0][:1]), optax.adam(map_cfg["lr"]),
                        model_kind=model_kind)
                    ld, _, _ = make_dataloaders(
                        ArrayDataset(*tr), ArrayDataset(*te),
                        ArrayDataset(*va),
                        batch_size=map_cfg["batch_size"],
                        seed=(map_cfg["seed"] + i * 7919) % (2 ** 31))
                cand = train_map(cand, ld, test_loader,
                                 num_epochs=map_cfg["epochs"],
                                 alpha=map_alpha)
                nll_i = val_nll(cand)
                cand_nlls.append(round(nll_i, 5))
                if best_nll is None or nll_i < best_nll:
                    best, best_nll = cand, nll_i
            state = best
            print(f"[map] {map_restarts} restarts (alpha_factor="
                  f"{map_alpha_factor}) val NLLs {cand_nlls} -> "
                  f"kept {best_nll:.5f}")
        else:
            state = train_map(state, train_loader, test_loader,
                              num_epochs=map_cfg["epochs"],
                              alpha=map_alpha)
        save_train_state(state, map_dir, step=map_cfg["epochs"])
        if model_kind == "classifier":
            nplot.plot_map_2d_classification(
                state, tr[0], tr[1],
                save_path=os.path.join(args.fig_dir,
                                       f"{ds_name}_{model_kind}_map.png"))
        print("[DONE] MAP training.")
        if args.mode == "train_map":
            return
    else:
        state = load_train_state(state, map_dir)

    # ---- PART B: inducing points ------------------------------------------
    m = ip_cfg["m"]
    z_init = jnp.asarray(tr[0][:m])
    ip_batches = cycling_batches(
        make_dataloaders(ArrayDataset(*tr), ArrayDataset(*te),
                         ArrayDataset(*va), batch_size=ip_cfg["batch_size"],
                         seed=ip_cfg["seed"] % (2**31))[0])
    objective = args.objective or (
        "stochastic" if args.scalable else ip_cfg.get("objective", "gram"))

    alpha_ip = args.alpha_ip
    if alpha_ip is None and args.alpha_mode == "config":
        alpha_ip = float(alpha)
        print(f"[alpha] using config alpha end-to-end: {alpha_ip}")
    if alpha_ip is None:
        # toy grid bounds follow the reference's driver call
        # (/root/reference/main.py:244-254): alpha in [1e-3, 10], 16 coarse
        # points — NOT the grid_search default [1e-3, 1e2]
        alpha_ip = grid_search_alpha(
            state, z_init, val_loader, full_set_size=full_set_size,
            num_mc_samples=ip_cfg["mc_samples"],
            log10_min=-3.0, log10_max=1.0, n_coarse=16,
            range_clip_min=(args.range_clip if args.range_clip > 0
                            else None))

    if args.mode in ("train_inducing", "full_pipeline"):
        cb = None
        if args.plot_Z and model_kind == "classifier":
            cb = nplot.make_inducing_callback(ds_name, xtrain=tr[0],
                                              ytrain=tr[1],
                                              fig_dir=args.fig_dir)
        # Z may be TRAINED at a smoothed (higher-alpha) objective while the
        # posterior/eval alpha stays alpha_ip: the low-alpha KL landscape is
        # multi-modal seed-to-seed while the alpha~1 one is not (measured:
        # scripts/banana_restart_study.py, RESULTS.md "Banana round 4").
        alpha_train = (args.alpha_train if args.alpha_train is not None
                       else ip_cfg.get("alpha_train"))
        if alpha_train is not None and float(alpha_train) != float(alpha_ip):
            print(f"[alpha] Z-training at alpha_train={alpha_train} "
                  f"(posterior/eval alpha stays {alpha_ip})")
        train_kwargs = dict(
            alpha=(float(alpha_train) if alpha_train is not None
                   else alpha_ip),
            num_steps=ip_cfg["epochs"],
            full_set_size=full_set_size, objective=objective,
            rng=jax.random.PRNGKey(ip_cfg["seed"] % (2**31)),
            st_samples=ip_cfg["st_samples"],
            slq_samples=ip_cfg["slq_samples"],
            slq_num_matvecs=ip_cfg["slq_num_matvecs"],
            example_block=ip_cfg.get("example_block"),
            cg_tol=ip_cfg["cg_tol"], cg_maxiter=ip_cfg["cg_maxiter"],
            precond_rank=ip_cfg["precond_rank"],
            precond_power=ip_cfg["precond_power"],
            callback=cb)
        n_restarts = (args.restarts if args.restarts is not None
                      else ip_cfg.get("restarts", 1))
        meta = {"alpha_ip": float(alpha_ip), "objective": objective}
        if alpha_train is not None:
            meta["alpha_train"] = float(alpha_train)
        if n_restarts > 1:
            Z, kl_best, kls = train_inducing_points_restarts(
                state, z_init, optax.adam(ip_cfg["lr"]), ip_batches,
                selection_X=jnp.asarray(tr[0]), n_restarts=n_restarts,
                **train_kwargs)
            meta.update(restarts=n_restarts, full_set_kl=kl_best,
                        restart_kls=kls)
        else:
            Z = train_inducing_points(
                state, z_init, optax.adam(ip_cfg["lr"]), ip_batches,
                **train_kwargs)
        save_array(Z, args.ckpt_induc, f"ind_{ds_name}", ip_cfg["epochs"])
        save_run_meta(args.ckpt_induc, f"ind_{ds_name}", meta)
        print("[DONE] Inducing training.")
    else:
        Z = load_array(args.ckpt_induc, f"ind_{ds_name}", ip_cfg["epochs"])

    # ---- PART C: visualization --------------------------------------------
    if args.mode in ("visualize", "full_pipeline"):
        Z_plot = jnp.asarray(tr[0]) if args.full else Z
        if model_kind == "classifier":
            suffix = "_mf" if args.scalable else ""
            nplot.plot_lla_2d_classification(
                state, tr[0], tr[1], Z_plot, alpha_ip,
                key=jax.random.PRNGKey(ip_cfg["seed"] % (2**31) + 1),
                num_mc_samples=args.num_mc_samples_lla,
                full_set_size=None if args.full else full_set_size,
                scalable=args.scalable, plot_Z=args.plot_Z,
                plot_X=args.plot_X,
                save_path=os.path.join(
                    args.fig_dir,
                    f"{ds_name}_{model_kind}_lla_"
                    f"{'full' if args.full else 'ip'}{suffix}.png"))
        else:
            nplot.plot_regression_lla_1d(
                state, tr[0], tr[1], Z_plot, alpha_ip,
                full_set_size=None if args.full else full_set_size,
                save_path=os.path.join(args.fig_dir,
                                       f"{ds_name}_{model_kind}_lla.png"))
        if args.comparison and model_kind == "classifier":
            mc = min(args.num_mc_samples_lla, 100)
            nplot.make_predictive_mean_figure(
                state, tr[0], tr[1], alpha_ip,
                key=jax.random.PRNGKey(7), num_mc_samples=mc,
                save_path=os.path.join(args.fig_dir,
                                       f"{ds_name}_mean_comparison.png"))
            nplot.make_comparison_figure(
                state, tr[0], tr[1], Z_plot, alpha_ip,
                key=jax.random.PRNGKey(8), num_mc_samples=mc,
                scalable=args.scalable,
                full_set_size=None if args.full else full_set_size,
                save_path=os.path.join(args.fig_dir,
                                       f"{ds_name}_ip_lla_comparison.png"))
        print("[DONE] Visualization.")


if __name__ == "__main__":
    main()
