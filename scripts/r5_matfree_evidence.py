"""Round-5 matfree evidence: gradient-accuracy contract + optimization proof.

Closes VERDICT r4 tasks 2 and 3 with measured, committed artifacts:

* **Part 1 — gradient contract (task 3)**: same-keys rel-L2 and cosine of
  the ``stochastic_matfree`` ∂KL/∂Z against the materialized twin at
  M=1024 (d_z=10,240), swept over ``precond_rank`` × ``cg_maxiter``, with
  the materialized estimator's own PROBE NOISE (gradient spread across
  probe keys) as the yardstick "subdominant" is measured against; plus the
  usable-α envelope (CG residual and gradient error as α shrinks toward
  the MAP value where the inner solve is known to stall).
* **Part 2 — trajectory tracking (task 2a)**: 50 shared-keys/shared-batches
  training steps under the materialized ``stochastic`` and the
  ``stochastic_matfree`` objectives from the same init; a fixed-probe
  common-random-numbers KL judge evaluates snapshots of both trajectories,
  showing the matfree run descends the SAME objective the materialized run
  does.
* **Part 3 — descent at d_z=40,960 (task 2b)**: fixed-probe CRN KL of the
  M=4096 checkpoint trained by ``cli.train_scale`` (before = the CLI's
  deterministic data init, after = the committed checkpoint) under 3
  independent judge keys; plus a from-NOISE 60-step run whose KL drop is
  unambiguous (the data init starts near-optimal — M covers half the
  surrogate train set — so its delta alone would understate what the
  optimizer does).

Reference anchors: the materialized twin is the reference's own Woodbury
path (``/root/reference/src/train_inducing.py:87-173``); the reference has
no gradient-accuracy instrument at all (its CG exits silently,
``/root/reference/src/stochtrace.py:138-149``).

Usage (TPU, env untouched, AFTER scripts/r5_tpu_jobA.sh):
    nohup python -u scripts/r5_matfree_evidence.py \
        --out results/matfree_evidence_r5.jsonl > /tmp/r5_jobB.log 2>&1 &
CPU smoke:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/r5_matfree_evidence.py \
        --m_small 16 --m_large 32 --steps_small 4 --steps_noise 4 \
        --st 4 --judge_st 8 --slq_matvecs 8 --batch 32 --eval_batch 32 \
        --ranks 0 4 --maxiters 8 32 --alphas 0.5 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from laplace_inducing_points_tpu.models.registry import get_model
from laplace_inducing_points_tpu.models.state import create_train_state
from laplace_inducing_points_tpu.training.inducing import (
    kl_objective_stochastic, matfree_cg_healthcheck, optimize_step)
from laplace_inducing_points_tpu.utils.checkpoint import (load_array,
                                                          load_train_state)
from laplace_inducing_points_tpu.utils.config import load_experiment_config


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/scale/lenet5_mnist_matfree4k.yml")
    p.add_argument("--ckpt_map", default="checkpoint/map/")
    p.add_argument("--ckpt_ind4k", default="checkpoint/ind4k/")
    p.add_argument("--ind4k_step", type=int, default=300)
    p.add_argument("--dataset", default="mnist")
    p.add_argument("--m_small", type=int, default=1024)
    p.add_argument("--m_large", type=int, default=4096)
    p.add_argument("--alpha", type=float, default=50.0)
    p.add_argument("--full_set", type=int, default=8192)
    p.add_argument("--batch", type=int, default=256,
                   help="data batch for the gradient-contract objective")
    p.add_argument("--train_batch", type=int, default=128,
                   help="data batch for the trajectory/noise training steps "
                        "(matches the CLI's ip.batch_size so the M=4096 "
                        "optimize_step graph is already compile-cached)")
    p.add_argument("--eval_batch", type=int, default=512,
                   help="fixed data batch for the CRN KL judge")
    p.add_argument("--st", type=int, default=16)
    p.add_argument("--judge_st", type=int, default=64,
                   help="probe count of the KL judge (lower probe noise)")
    p.add_argument("--slq_matvecs", type=int, default=64)
    p.add_argument("--cg_tol", type=float, default=1e-3)
    p.add_argument("--ranks", type=int, nargs="+", default=[0, 16, 64, 128])
    p.add_argument("--maxiters", type=int, nargs="+",
                   default=[25, 50, 100, 200, 400],
                   help="cg_maxiter sweep at the default rank (64)")
    p.add_argument("--powers", type=int, nargs="+", default=[0, 1],
                   help="sketch subspace-iteration sweep at the base "
                        "(rank, maxiter) — the round-5 fix for the "
                        "trained-MAP sketch misalignment")
    p.add_argument("--base_rank", type=int, default=64)
    p.add_argument("--base_maxiter", type=int, default=100)
    p.add_argument("--base_power", type=int, default=1,
                   help="precond_power for parts 2/3 training steps and "
                        "the part-3 judge (round-5 default after the "
                        "misalignment study)")
    p.add_argument("--alphas", type=float, nargs="+",
                   default=[0.005, 0.05, 0.5, 5.0, 50.0],
                   help="usable-alpha envelope (0.005 = the MAP prior "
                        "where the matfree4k header says CG stalls)")
    p.add_argument("--steps_small", type=int, default=50)
    p.add_argument("--steps_noise", type=int, default=60)
    p.add_argument("--lr", type=float, default=0.008)
    p.add_argument("--skip_part0", action="store_true")
    p.add_argument("--skip_part1", action="store_true")
    p.add_argument("--skip_part2", action="store_true")
    p.add_argument("--skip_part3", action="store_true")
    p.add_argument("--cond_ranks", type=int, nargs="+",
                   default=[64, 128, 256, 512, 1024],
                   help="part 0: precond_rank sweep for the conditioning "
                        "profile (healthcheck-only, no objective calls)")
    p.add_argument("--cond_maxiters", type=int, nargs="+",
                   default=[100, 400])
    p.add_argument("--cond_powers", type=int, nargs="+", default=[0, 1])
    p.add_argument("--cond_sources", nargs="+",
                   default=["init_small", "init_large", "checkpoint"],
                   choices=["init_small", "init_large", "checkpoint"],
                   help="part 0: which (M, Z) profiles to run — each "
                        "(shape, rank, power) is a fresh remote compile, "
                        "so trim this on a cold cache")
    p.add_argument("--cg_example_block", type=int, default=None,
                   help="blocked HIGHEST CG operator (BlockedWFactor): "
                        "bounds every matfree remote-compile graph to this "
                        "many examples per lax.map/scan body")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from laplace_inducing_points_tpu.utils import (acquire_tpu_lock,
                                                   setup_compile_cache)
    setup_compile_cache()
    acquire_tpu_lock()
    log(f"[evidence] devices: {jax.devices()}")

    cfg = load_experiment_config(args.config)
    model = get_model(cfg["model"])

    from laplace_inducing_points_tpu.data.scale import get_dataloaders
    train_loader, *_ = get_dataloaders(args.dataset, args.batch, aug=False)
    x_all = np.asarray(train_loader.dataset.x, dtype=np.float32)

    dummy = jnp.asarray(x_all[:1])
    state = create_train_state(model,
                               jax.random.PRNGKey(cfg["model"].get("seed", 0)),
                               dummy, optax.adam(1e-3),
                               model_kind=cfg["model"]["type"])
    state = load_train_state(
        state, os.path.join(args.ckpt_map, f"map_{args.dataset}"))
    log(f"[evidence] MAP checkpoint loaded (step {int(state.step)})")

    rows = []

    def record(**kw):
        rows.append(kw)
        log("[evidence] " + json.dumps(kw))
        if args.out:
            with open(args.out, "a" if rows[1:] else "w") as f:
                f.write(json.dumps(kw) + "\n")

    def loader_first_batch(m):
        """The CLI's deterministic Z init: first batch of a fresh m-sized
        train loader (cli/train_scale.py builds z_init exactly this way;
        the loader's shuffle is seeded, so this reconstructs the M=4096
        run's starting point bit-for-bit)."""
        ld, *_ = get_dataloaders(args.dataset, m, aug=False)
        return jnp.asarray(next(iter(ld))[0], dtype=jnp.float32)

    obj_kw = dict(full_set_size=args.full_set, st_samples=args.st,
                  slq_samples=2, slq_num_matvecs=args.slq_matvecs)

    # -- jitted twins: alpha and key ride as DYNAMIC args (one compile
    #    covers the whole alpha envelope and every probe key); Z/X/state
    #    are jit arguments, never closure constants (the relay gotcha) ----
    mat_obj = partial(kl_objective_stochastic, **obj_kw)
    mat_vg = jax.jit(lambda z, x, st, a, k:
                     jax.value_and_grad(mat_obj)(z, x, st, a, k))

    def make_mf_vg(rank, power=0):
        """One compiled graph per (rank, power): alpha, key AND cg_maxiter
        ride as dynamic args (the maxiter sweep reuses the compile —
        inducing.py's None-guard keeps the traced int out of any
        __bool__)."""
        def f(z, x, st, a, k, mi):
            return kl_objective_stochastic(
                z, x, st, a, k, materialize_w=False, cg_tol=args.cg_tol,
                cg_maxiter=mi, precond_rank=rank or None,
                precond_power=power,
                cg_example_block=args.cg_example_block, **obj_kw)
        return jax.jit(lambda z, x, st, a, k, mi:
                       jax.value_and_grad(f)(z, x, st, a, k, mi))

    def gstats(g_ref, g):
        diff = float(jnp.linalg.norm((g - g_ref).ravel()))
        nref = float(jnp.linalg.norm(g_ref.ravel()))
        cos = float(jnp.vdot(g.ravel(), g_ref.ravel())
                    / (jnp.linalg.norm(g.ravel())
                       * jnp.linalg.norm(g_ref.ravel()) + 1e-30))
        return diff / (nref + 1e-30), cos

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        return time.perf_counter() - t0, out

    X = jnp.asarray(x_all[:args.batch])
    keys = [jax.random.PRNGKey(s) for s in (101, 202, 303)]

    # ======================================================================
    # Part 0: conditioning profile of the TRAINED MAP (round-5 discovery:
    # the trained MAP's Gram has lambda_max ~500x the random init round 4
    # measured on — rank-64 deflation that sufficed there stalls at
    # M=4096, healthcheck residual 8.88e+00). Healthcheck-only sweep:
    # lam_max / kappa / kappa_deflated / predicted_iters / measured
    # residual per (M, rank, maxiter) — picks the (rank, maxiter) at which
    # the M=4096 retrain's inner CG actually converges, and doubles as the
    # usable-envelope contract table (VERDICT r4 task 3).
    # ======================================================================
    if not args.skip_part0:
        def profile(Z, M, source):
            d_z = M * 10
            log(f"[evidence] part 0: conditioning profile at M={M} "
                f"({source})")
            for rank in args.cond_ranks:
                if rank >= d_z:
                    continue
                for power in args.cond_powers:
                    for mi in args.cond_maxiters:
                        t0 = time.time()
                        hc = matfree_cg_healthcheck(
                            state, Z, args.alpha,
                            full_set_size=args.full_set,
                            cg_tol=args.cg_tol, cg_maxiter=mi,
                            precond_rank=rank, precond_power=power,
                            key=jax.random.PRNGKey(11),
                            cg_example_block=args.cg_example_block,
                            warn=False)
                        record(op="cond_profile", M=M, d_z=d_z,
                               source=source,
                               alpha=args.alpha, precond_rank=rank,
                               precond_power=power,
                               cg_maxiter=mi, cg_tol=args.cg_tol,
                               lam_max=f"{hc['lam_max']:.4g}",
                               lam_seen=f"{hc['lam_seen']:.4g}",
                               kappa=round(hc["kappa"], 1),
                               kappa_deflated=round(hc["kappa_deflated"], 1),
                               predicted_iters=round(hc["predicted_iters"],
                                                     1),
                               cg_rel_residual=f"{hc['cg_rel_residual']:.2e}",
                               cg_converged=bool(hc["converged"]),
                               seconds=round(time.time() - t0, 2))

        if "init_small" in args.cond_sources:
            profile(loader_first_batch(args.m_small), args.m_small, "init")
        if "init_large" in args.cond_sources:
            profile(loader_first_batch(args.m_large), args.m_large, "init")
        # The configuration the M=4096 EVAL actually runs: trained MAP
        # weights AND the trained inducing set from the CLI checkpoint —
        # this is where the round-5 eval's Matheron CG hit residual 1.76
        # at rank 64 / maxiter 200, so the (rank, maxiter) verdict must be
        # read off THIS profile, not the init one.
        if "checkpoint" in args.cond_sources:
            try:
                Z_ck = load_array(args.ckpt_ind4k, f"ind_{args.dataset}",
                                  args.ind4k_step)
                if Z_ck.shape[0] == args.m_large:
                    profile(jnp.asarray(Z_ck), args.m_large,
                            "cli_checkpoint")
                else:
                    log(f"[evidence] part 0 checkpoint profile SKIPPED: "
                        f"checkpoint M={Z_ck.shape[0]} != --m_large")
            except FileNotFoundError:
                log("[evidence] part 0 checkpoint profile SKIPPED: "
                    "no M=4096 checkpoint")

    # ======================================================================
    # Part 1: gradient-accuracy contract at M=1024 (VERDICT r4 task 3)
    # ======================================================================
    if not args.skip_part1:
        M = args.m_small
        Z = loader_first_batch(M)
        d_z = M * 10
        log(f"[evidence] part 1: gradient contract at M={M} (d_z={d_z})")

        # probe-noise yardstick: materialized gradient across 3 probe keys
        mats = []
        for k in keys:
            t, (v, g) = timed(mat_vg, Z, X, state, args.alpha, k)
            mats.append((float(v), g, t))
        noise_rel, noise_cos = [], []
        for i in range(len(mats)):
            for j in range(i + 1, len(mats)):
                r, c = gstats(mats[i][1], mats[j][1])
                noise_rel.append(r)
                noise_cos.append(c)
        record(op="grad_probe_noise", M=M, d_z=d_z, alpha=args.alpha,
               st_samples=args.st,
               value_mean=round(float(np.mean([m[0] for m in mats])), 2),
               value_spread=round(float(np.ptp([m[0] for m in mats])), 2),
               grad_rel_l2_between_keys=[round(r, 4) for r in noise_rel],
               grad_cosine_between_keys=[round(c, 4) for c in noise_cos],
               seconds=round(mats[0][2], 2))
        v_ref, g_ref = mats[0][0], mats[0][1]

        combos = ([(r, args.base_maxiter, 0) for r in args.ranks]
                  + [(args.base_rank, mi, 0) for mi in args.maxiters
                     if mi != args.base_maxiter]
                  + [(args.base_rank, args.base_maxiter, pw)
                     for pw in args.powers if pw != 0])
        vg_by_rank = {}
        for rank, maxiter, power in combos:
            if (rank, power) not in vg_by_rank:
                vg_by_rank[(rank, power)] = make_mf_vg(rank, power)
            vg = vg_by_rank[(rank, power)]
            t, (v, g) = timed(vg, Z, X, state, args.alpha, keys[0],
                              jnp.int32(maxiter))
            rel, cos = gstats(g_ref, g)
            hc = matfree_cg_healthcheck(
                state, Z, args.alpha, full_set_size=args.full_set,
                cg_tol=args.cg_tol, cg_maxiter=maxiter,
                precond_rank=rank or None, precond_power=power,
                key=jax.random.PRNGKey(11),
                cg_example_block=args.cg_example_block,
                warn=False)
            record(op="grad_contract", M=M, d_z=d_z, alpha=args.alpha,
                   precond_rank=rank, cg_maxiter=maxiter,
                   precond_power=power,
                   cg_tol=args.cg_tol,
                   value_rel_err=f"{abs(float(v) - v_ref) / abs(v_ref):.2e}",
                   grad_rel_l2=round(rel, 4), grad_cosine=round(cos, 6),
                   probe_noise_rel_l2=round(float(np.mean(noise_rel)), 4),
                   subdominant=bool(rel < np.mean(noise_rel)),
                   cg_rel_residual=f"{hc['cg_rel_residual']:.2e}",
                   cg_converged=bool(hc["converged"]),
                   kappa=round(hc["kappa"], 1),
                   kappa_deflated=round(hc["kappa_deflated"], 1),
                   predicted_iters=round(hc["predicted_iters"], 1),
                   seconds=round(t, 2))

        # usable-alpha envelope at the round-5 defaults (rank, maxiter,
        # power): alpha is a dynamic jit arg, so this whole sweep reuses
        # two compiled graphs
        vg = (vg_by_rank.get((args.base_rank, args.base_power))
              or make_mf_vg(args.base_rank, args.base_power))
        for a in args.alphas:
            _, (v_m, g_m) = timed(mat_vg, Z, X, state, a, keys[0])
            t, (v, g) = timed(vg, Z, X, state, a, keys[0],
                              jnp.int32(args.base_maxiter))
            rel, cos = gstats(g_m, g)
            hc = matfree_cg_healthcheck(
                state, Z, a, full_set_size=args.full_set,
                cg_tol=args.cg_tol, cg_maxiter=args.base_maxiter,
                precond_rank=args.base_rank,
                precond_power=args.base_power,
                key=jax.random.PRNGKey(11),
                cg_example_block=args.cg_example_block, warn=False)
            record(op="alpha_envelope", M=M, d_z=d_z, alpha=a,
                   precond_rank=args.base_rank,
                   cg_maxiter=args.base_maxiter,
                   precond_power=args.base_power,
                   value_rel_err=f"{abs(float(v) - float(v_m)) / max(abs(float(v_m)), 1e-30):.2e}",
                   grad_rel_l2=round(rel, 4), grad_cosine=round(cos, 6),
                   cg_rel_residual=f"{hc['cg_rel_residual']:.2e}",
                   cg_converged=bool(hc["converged"]),
                   kappa=round(hc["kappa"], 1),
                   kappa_deflated=round(hc["kappa_deflated"], 1),
                   predicted_iters=round(hc["predicted_iters"], 1),
                   seconds=round(t, 2))

    # ======================================================================
    # Part 2: shared-keys trajectory tracking at M=1024 (task 2a)
    # ======================================================================
    if not args.skip_part2:
        M = args.m_small
        Z0 = loader_first_batch(M)
        d_z = M * 10
        n_steps = args.steps_small
        log(f"[evidence] part 2: {n_steps}-step twin trajectories at M={M}")

        rng = np.random.default_rng(7)
        batch_idx = [rng.choice(x_all.shape[0], args.train_batch,
                                replace=False) for _ in range(n_steps)]
        batches = [jnp.asarray(x_all[i]) for i in batch_idx]
        step_keys = jax.random.split(jax.random.PRNGKey(12), n_steps)

        judge_kw = dict(full_set_size=args.full_set,
                        st_samples=args.judge_st, slq_samples=4,
                        slq_num_matvecs=args.slq_matvecs)
        judge = jax.jit(lambda z, x, st, a, k: kl_objective_stochastic(
            z, x, st, a, k, **judge_kw))
        X_eval = jnp.asarray(x_all[:args.eval_batch])
        jkey = jax.random.PRNGKey(999)
        snap_every = max(n_steps // 5, 1)

        def run(objective):
            opt = optax.adam(args.lr)
            Z, opt_state = Z0, opt.init(Z0)
            losses, snaps = [], {0: Z0}
            for i in range(n_steps):
                Z, opt_state, loss = optimize_step(
                    Z, batches[i], state, args.alpha, opt_state,
                    step_keys[i], objective=objective, optimizer=opt,
                    full_set_size=args.full_set, st_samples=args.st,
                    slq_samples=2, slq_num_matvecs=args.slq_matvecs,
                    cg_tol=args.cg_tol, cg_maxiter=args.base_maxiter,
                    precond_rank=args.base_rank,
                    precond_power=args.base_power,
                    cg_example_block=args.cg_example_block)
                losses.append(float(loss))
                if (i + 1) % snap_every == 0 or i == n_steps - 1:
                    snaps[i + 1] = Z
            return losses, snaps

        t0 = time.perf_counter()
        losses_mat, snaps_mat = run("stochastic")
        t_mat = time.perf_counter() - t0
        t0 = time.perf_counter()
        losses_mf, snaps_mf = run("stochastic_matfree")
        t_mf = time.perf_counter() - t0

        kl_mat = {s: float(judge(z, X_eval, state, args.alpha, jkey))
                  for s, z in sorted(snaps_mat.items())}
        kl_mf = {s: float(judge(z, X_eval, state, args.alpha, jkey))
                 for s, z in sorted(snaps_mf.items())}
        corr = float(np.corrcoef(losses_mat, losses_mf)[0, 1])
        last = max(snaps_mat)
        z_rel = float(jnp.linalg.norm((snaps_mf[last] - snaps_mat[last]).ravel())
                      / jnp.linalg.norm((snaps_mat[last] - Z0).ravel()))
        record(op="trajectory_tracking", M=M, d_z=d_z, alpha=args.alpha,
               steps=n_steps, lr=args.lr,
               precond_rank=args.base_rank, precond_power=args.base_power,
               cg_maxiter=args.base_maxiter,
               loss_corr=round(corr, 4),
               loss_mat_first_last=[round(losses_mat[0], 2),
                                    round(losses_mat[-1], 2)],
               loss_mf_first_last=[round(losses_mf[0], 2),
                                   round(losses_mf[-1], 2)],
               kl_judge_mat={str(k): round(v, 2) for k, v in kl_mat.items()},
               kl_judge_mf={str(k): round(v, 2) for k, v in kl_mf.items()},
               kl_delta_mat=round(kl_mat[last] - kl_mat[0], 2),
               kl_delta_mf=round(kl_mf[last] - kl_mf[0], 2),
               z_rel_divergence_vs_update=round(z_rel, 4),
               seconds_per_step_mat=round(t_mat / n_steps, 2),
               seconds_per_step_mf=round(t_mf / n_steps, 2),
               judge_st=args.judge_st)

    # ======================================================================
    # Part 3: descent at M=4096 / d_z=40,960 (task 2b)
    # ======================================================================
    if not args.skip_part3:
        M = args.m_large
        d_z = M * 10
        judge_kw = dict(full_set_size=args.full_set,
                        st_samples=args.judge_st, slq_samples=4,
                        slq_num_matvecs=args.slq_matvecs,
                        materialize_w=False, cg_tol=1e-4,
                        cg_maxiter=300, precond_rank=args.base_rank,
                        precond_power=args.base_power,
                        cg_example_block=args.cg_example_block)
        judge = jax.jit(lambda z, x, st, a, k: kl_objective_stochastic(
            z, x, st, a, k, **judge_kw))
        X_eval = jnp.asarray(x_all[:args.eval_batch])
        jkeys = [jax.random.PRNGKey(s) for s in (555, 666, 777)]

        # 3a. the CLI-trained checkpoint vs its deterministic init
        try:
            Z_final = load_array(args.ckpt_ind4k, f"ind_{args.dataset}",
                                 args.ind4k_step)
        except FileNotFoundError:
            Z_final = None
            log("[evidence] part 3a SKIPPED: no M=4096 checkpoint yet")
        if Z_final is not None and Z_final.shape[0] != M:
            log(f"[evidence] part 3a SKIPPED: checkpoint M={Z_final.shape[0]} "
                f"!= --m_large {M} (the before/after KLs would use different "
                f"beta recalibrations and not be comparable)")
            Z_final = None
        if Z_final is not None:
            Z_init = loader_first_batch(M)
            log(f"[evidence] part 3a: CRN KL before/after at M={M}")
            deltas = []
            for jk in jkeys:
                k0 = float(judge(Z_init, X_eval, state, args.alpha, jk))
                k1 = float(judge(jnp.asarray(Z_final), X_eval, state,
                                 args.alpha, jk))
                deltas.append({"kl_init": round(k0, 2),
                               "kl_final": round(k1, 2),
                               "delta": round(k1 - k0, 2)})
                log(f"[evidence]   judge key: {deltas[-1]}")
            record(op="fullset_kl_before_after", M=M, d_z=d_z,
                   alpha=args.alpha, source="cli_checkpoint",
                   judge_st=args.judge_st, judges=deltas,
                   descended=bool(all(d["delta"] < 0 for d in deltas)))

        # 3b. from-noise descent (unambiguous optimization at scale: the
        # data init is near-optimal — M covers half the surrogate set)
        n_steps = args.steps_noise
        log(f"[evidence] part 3b: {n_steps}-step from-noise run at M={M}")
        Z = jax.random.normal(jax.random.PRNGKey(31), (M,) + x_all.shape[1:])
        kl0 = [float(judge(Z, X_eval, state, args.alpha, jk))
               for jk in jkeys]
        opt = optax.adam(args.lr)
        opt_state = opt.init(Z)
        rng = np.random.default_rng(8)
        losses = []
        t0 = time.perf_counter()
        for i in range(n_steps):
            Xb = jnp.asarray(x_all[rng.choice(x_all.shape[0],
                                              args.train_batch,
                                              replace=False)])
            Z, opt_state, loss = optimize_step(
                Z, Xb, state, args.alpha, opt_state,
                jax.random.fold_in(jax.random.PRNGKey(13), i),
                objective="stochastic_matfree", optimizer=opt,
                full_set_size=args.full_set, st_samples=args.st,
                slq_samples=2, slq_num_matvecs=args.slq_matvecs,
                cg_tol=args.cg_tol, cg_maxiter=args.base_maxiter,
                precond_rank=args.base_rank,
                precond_power=args.base_power,
                cg_example_block=args.cg_example_block)
            losses.append(float(loss))
            if i % 10 == 0:
                log(f"[evidence]   noise step {i}: loss={losses[-1]:.1f}")
            if not np.isfinite(losses[-1]):
                log("[evidence] DIVERGED")
                break
        dt = time.perf_counter() - t0
        kl1 = [float(judge(Z, X_eval, state, args.alpha, jk))
               for jk in jkeys]
        record(op="noise_descent", M=M, d_z=d_z, alpha=args.alpha,
               steps=len(losses), lr=args.lr, judge_st=args.judge_st,
               precond_rank=args.base_rank, precond_power=args.base_power,
               cg_maxiter=args.base_maxiter,
               kl_init=[round(v, 2) for v in kl0],
               kl_final=[round(v, 2) for v in kl1],
               kl_delta=[round(b - a, 2) for a, b in zip(kl0, kl1)],
               loss_first_last=[round(losses[0], 2), round(losses[-1], 2)],
               seconds_per_step=round(dt / max(len(losses), 1), 2),
               descended=bool(all(b < a for a, b in zip(kl0, kl1))))

    log(f"[evidence] DONE: {len(rows)} rows")


if __name__ == "__main__":
    main()
