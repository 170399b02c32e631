"""d_z-unbounded matrix-free pipeline demo on real hardware (round 3).

Runs the two matrix-free components that make the pipeline d_z-unbounded —
the ``stochastic_matfree`` KL objective (CG-Woodbury,
``training/inducing.py::kl_objective_stochastic(materialize_w=False)``) and
the matrix-free Matheron sampler
(``inference/sample.py::make_matheron_sampler(materialize_w=False)``) — at
inducing-set sizes where the materialized path is *physically impossible*:
at M=6144 LeNet5 examples (d_z = M*K = 61,440) the row factor R is a
(61440, 61706) f32 array = 15.2 GB, larger than the chip's 15.5 GB HBM
before counting anything else, and the d_z x d_z Gram another 15.1 GB.
Neither array ever exists on the matrix-free path (statically asserted in
``tests/test_variational.py``); each CG iteration is one jvp+vjp pair of
the batched model.

At a smaller shape where both paths fit, the same script times the
materialized twins so the "matfree tax" is quantified on the same chip.

No reference analog: the reference's Woodbury always materializes the
dense d_z Gram (``/root/reference/src/train_inducing.py:122-132``) and its
sampler needs dense Gram eigendecompositions via matfree's Lanczos on a
materialized operator pair (``/root/reference/src/sample.py:55-145``).

Usage (TPU, env untouched; background it — first remote compile is slow):
    nohup python scripts/matfree_scale_demo.py --out results/matfree_scale_tpu.jsonl &
CPU smoke:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/matfree_scale_demo.py \
        --m_small 32 --m_large 64 --probes 4 --st_samples 8 --skip_grad_large
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

from laplace_inducing_points_tpu.core import operators as ops
from laplace_inducing_points_tpu.core.params import flatten_nn_params
from laplace_inducing_points_tpu.inference.sample import make_matheron_sampler
from laplace_inducing_points_tpu.models.scale import LeNet5
from laplace_inducing_points_tpu.models.state import create_train_state
from laplace_inducing_points_tpu.training.inducing import (
    kl_objective_stochastic, matfree_cg_healthcheck, optimize_step)
from laplace_inducing_points_tpu.utils import setup_compile_cache


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def hbm_gib() -> float | None:
    try:
        stats = jax.devices()[0].memory_stats()
        return stats["bytes_in_use"] / 2**30
    except Exception:
        return None


def timed(fn, *args, reps: int = 2):
    """Per-call wall-clock of a jitted fn (these ops are seconds-scale, so
    the ~33 ms tunnel dispatch latency is noise — slope timing unneeded)."""
    out = fn(*args)
    jax.block_until_ready(out)            # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--m_small", type=int, default=1024,
                   help="shape where materialized and matfree both fit")
    p.add_argument("--m_large", type=int, default=6144,
                   help="shape where only matfree fits (R > HBM)")
    p.add_argument("--m_large_grad", type=int, default=4096,
                   help="large shape for the objective GRAD step — the "
                        "CG-under-grad additionally holds the remat'd "
                        "batched-model activations (M, 28, 28, 6), which "
                        "OOMs at 6144 (16.4G > 15.75G HBM); at 4096 the "
                        "materialized path is still impossible "
                        "(R 9.4 GiB + Gram 6.7 GiB > HBM)")
    p.add_argument("--probes", type=int, default=8)
    p.add_argument("--st_samples", type=int, default=16)
    p.add_argument("--slq_matvecs", type=int, default=64)
    p.add_argument("--cg_tol", type=float, default=1e-3)
    p.add_argument("--cg_maxiter", type=int, default=100)
    p.add_argument("--precond_rank", type=int, default=64,
                   help="Nyström sketch rank for the preconditioned row")
    p.add_argument("--alpha", type=float, default=50.0)
    p.add_argument("--data_batch", type=int, default=256)
    p.add_argument("--full_set", type=int, default=60000)
    p.add_argument("--skip_grad_large", action="store_true")
    p.add_argument("--skip_small", action="store_true",
                   help="skip the small-shape twin comparison (e.g. when "
                        "only the training run is wanted)")
    p.add_argument("--train_steps", type=int, default=0,
                   help="round 4 (VERDICT r3 item 4): run an actual "
                        "multi-step stochastic_matfree TRAINING run at "
                        "m_large_grad — optimize_step in a loop with the "
                        "Nystrom preconditioner, loss trajectory + s/step "
                        "+ CG healthcheck recorded; 0 disables")
    p.add_argument("--train_lr", type=float, default=0.01)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    setup_compile_cache()
    from laplace_inducing_points_tpu.utils import acquire_tpu_lock
    acquire_tpu_lock()
    log(f"[matfree] devices: {jax.devices()}")

    model = LeNet5()
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (1, 28, 28, 1))
    state = create_train_state(model, jax.random.PRNGKey(1), x1,
                               optax.adam(1e-3), model_kind="classifier")
    D = flatten_nn_params(state.params)[0].shape[0]
    X = jax.random.normal(jax.random.PRNGKey(2),
                          (args.data_batch, 28, 28, 1))
    rows = []

    def record(**kw):
        kw["hbm_gib_in_use"] = hbm_gib()
        rows.append(kw)
        log("[matfree] " + json.dumps(kw))
        if args.out:                      # incremental: survive a crash
            with open(args.out, "a" if rows[1:] else "w") as f:
                f.write(json.dumps(kw) + "\n")

    def healthcheck(M: int, precond_rank=None, Z=None):
        """CG convergence visibility: did the inner solve reach tol, or
        exit on maxiter? (round 4 — silent stalls were the trap). Pass
        ``Z`` to probe at a specific (e.g. trained) inducing set."""
        if Z is None:
            Z = jax.random.normal(jax.random.PRNGKey(3), (M, 28, 28, 1))
        hc = matfree_cg_healthcheck(
            state, Z, args.alpha, full_set_size=args.full_set,
            cg_tol=args.cg_tol, cg_maxiter=args.cg_maxiter,
            precond_rank=precond_rank, key=jax.random.PRNGKey(11),
            warn=False)
        return hc

    def objective_step(M: int, materialize: bool, with_grad: bool,
                       precond_rank=None):
        Z = jax.random.normal(jax.random.PRNGKey(3), (M, 28, 28, 1))
        obj = partial(kl_objective_stochastic,
                      full_set_size=args.full_set,
                      st_samples=args.st_samples, slq_samples=2,
                      slq_num_matvecs=args.slq_matvecs,
                      materialize_w=materialize,
                      cg_tol=args.cg_tol, cg_maxiter=args.cg_maxiter,
                      precond_rank=precond_rank)
        # X and state ride as jit ARGUMENTS, never closure constants: an
        # inlined (batch, 28, 28, 1) X makes the TPU AOT compiler constant-
        # fold the whole batched forward pass — the ~1.3 MB-MLIR graphs
        # with X inlined were OOM-SIGKILLed by the remote compile helper
        # (twice, round 4), while the argument-passing optimize_step (296
        # KB MLIR) of the same objective compiled fine. The verify-skill
        # relay gotcha, in its compile-memory form.
        if with_grad:
            fn = jax.jit(lambda z, x, st: jax.value_and_grad(obj)(
                z, x, st, args.alpha, jax.random.PRNGKey(4)))
            t, (val, g) = timed(fn, Z, X, state)
            gnorm = float(jnp.linalg.norm(g.ravel()))
        else:
            fn = jax.jit(lambda z, x, st: obj(z, x, st, args.alpha,
                                              jax.random.PRNGKey(4)))
            t, val = timed(fn, Z, X, state)
            gnorm = None
        return t, float(np.asarray(val)), gnorm

    def sampler_draws(M: int, materialize: bool, precond_rank=None):
        Z = jax.random.normal(jax.random.PRNGKey(3), (M, 28, 28, 1))
        apply, d = make_matheron_sampler(
            state, Z, args.alpha, full_set_size=args.full_set,
            materialize_w=materialize,
            cg_tol=args.cg_tol, cg_maxiter=args.cg_maxiter,
            precond_rank=precond_rank,
            precond_key=jax.random.PRNGKey(8))
        eps = jax.random.normal(jax.random.PRNGKey(5), (args.probes, D))
        eta = jax.random.normal(jax.random.PRNGKey(6), (args.probes, d))
        # materialized apply is internally jitted with R/L as ARGUMENTS;
        # re-jitting the closure would inline the (d, D) factor as HLO
        # constants (GBs -> relay request-limit blowup). The matfree apply
        # captures only model params (D,) and, when preconditioned, the
        # (d, k) Nystrom factors -- MBs, not GBs -- so jit the whole CG
        # program.
        fn = apply if materialize else jax.jit(apply)
        t, out = timed(fn, eps, eta)
        return t, d, out

    # ---- small shape: both paths, same keys -> agreement + tax ----------
    Ms = args.m_small
    if not args.skip_small:
        log(f"[matfree] small shape M={Ms} (d_z={Ms * 10}): both paths")
        t_mat, d_s, draws_mat = sampler_draws(Ms, materialize=True)
        record(op="matheron_draws", path="materialized", M=Ms, d_z=d_s, D=D,
               probes=args.probes, seconds=round(t_mat, 3))
        t_mf, _, draws_mf = sampler_draws(Ms, materialize=False)
        rel = float(jnp.max(jnp.abs(draws_mf - draws_mat))
                    / (jnp.max(jnp.abs(draws_mat)) + 1e-12))
        record(op="matheron_draws", path="matfree_cg", M=Ms, d_z=d_s, D=D,
               probes=args.probes, seconds=round(t_mf, 3),
               cg_tol=args.cg_tol, cg_maxiter=args.cg_maxiter,
               rel_vs_materialized=f"{rel:.2e}",
               tax_x=round(t_mf / t_mat, 1))
        t_pc, _, draws_pc = sampler_draws(Ms, materialize=False,
                                          precond_rank=args.precond_rank)
        rel_pc = float(jnp.max(jnp.abs(draws_pc - draws_mat))
                       / (jnp.max(jnp.abs(draws_mat)) + 1e-12))
        record(op="matheron_draws", path="matfree_cg_nystrom", M=Ms, d_z=d_s,
               D=D, probes=args.probes, seconds=round(t_pc, 3),
               cg_tol=args.cg_tol, cg_maxiter=args.cg_maxiter,
               precond_rank=args.precond_rank,
               rel_vs_materialized=f"{rel_pc:.2e}",
               tax_x=round(t_pc / t_mat, 1))
        del draws_mat, draws_mf, draws_pc

        t_omat, v_omat, g_omat = objective_step(Ms, materialize=True,
                                                with_grad=True)
        record(op="kl_objective_grad", path="materialized", M=Ms, d_z=d_s,
               seconds=round(t_omat, 3), value=round(v_omat, 2),
               grad_norm=round(g_omat, 4))
        t_omf, v_omf, g_omf = objective_step(Ms, materialize=False,
                                             with_grad=True)
        hc_plain = healthcheck(Ms)
        record(op="kl_objective_grad", path="matfree_cg", M=Ms, d_z=d_s,
               seconds=round(t_omf, 3), value=round(v_omf, 2),
               grad_norm=round(g_omf, 4),
               value_rel_err=f"{abs(v_omf - v_omat) / abs(v_omat):.2e}",
               tax_x=round(t_omf / t_omat, 1),
               cg_rel_residual=f"{hc_plain['cg_rel_residual']:.2e}",
               cg_converged=hc_plain['converged'])
        # round 4 (VERDICT r3 weak 5): the PRECONDITIONED objective row —
        # previously only draws had a precond measurement
        t_opc, v_opc, g_opc = objective_step(Ms, materialize=False,
                                             with_grad=True,
                                             precond_rank=args.precond_rank)
        hc_pc = healthcheck(Ms, precond_rank=args.precond_rank)
        record(op="kl_objective_grad", path="matfree_cg_nystrom", M=Ms,
               d_z=d_s, seconds=round(t_opc, 3), value=round(v_opc, 2),
               grad_norm=round(g_opc, 4),
               precond_rank=args.precond_rank,
               value_rel_err=f"{abs(v_opc - v_omat) / abs(v_omat):.2e}",
               tax_x=round(t_opc / t_omat, 1),
               cg_rel_residual=f"{hc_pc['cg_rel_residual']:.2e}",
               cg_converged=hc_pc['converged'])

    # ---- large shape: matfree only (R alone would exceed HBM) -----------
    Ml = args.m_large
    d_l = Ml * 10
    r_gib = d_l * D * 4 / 2**30
    log(f"[matfree] large shape M={Ml} (d_z={d_l}): R would be "
        f"{r_gib:.1f} GiB — matfree only")
    t_dl, _, _ = sampler_draws(Ml, materialize=False)
    record(op="matheron_draws", path="matfree_cg", M=Ml, d_z=d_l, D=D,
           probes=args.probes, seconds=round(t_dl, 3),
           materialized_r_gib=round(r_gib, 1),
           cg_tol=args.cg_tol, cg_maxiter=args.cg_maxiter)
    if not args.skip_grad_large:
        Mg = args.m_large_grad
        d_g = Mg * 10
        rg_gib = d_g * D * 4 / 2**30
        t_ol, v_ol, g_ol = objective_step(Mg, materialize=False,
                                          with_grad=True,
                                          precond_rank=args.precond_rank)
        hc_l = healthcheck(Mg, precond_rank=args.precond_rank)
        record(op="kl_objective_grad", path="matfree_cg_nystrom", M=Mg,
               d_z=d_g, seconds=round(t_ol, 3), value=round(v_ol, 2),
               grad_norm=round(g_ol, 4), precond_rank=args.precond_rank,
               cg_rel_residual=f"{hc_l['cg_rel_residual']:.2e}",
               cg_converged=hc_l['converged'],
               materialized_r_plus_gram_gib=round(
                   rg_gib + d_g * d_g * 4 / 2**30, 1))

    # ---- round 4: an actual TRAINING RUN, not a single step --------------
    if args.train_steps > 0:
        Mg = args.m_large_grad
        d_g = Mg * 10
        log(f"[matfree] training run: {args.train_steps} steps of "
            f"stochastic_matfree at M={Mg} (d_z={d_g}), "
            f"precond_rank={args.precond_rank}")
        hc0 = healthcheck(Mg, precond_rank=args.precond_rank)
        log(f"[matfree] pre-run CG healthcheck: residual "
            f"{hc0['cg_rel_residual']:.2e} "
            f"({'converged' if hc0['converged'] else 'MAXITER STALL'})")
        Z = jax.random.normal(jax.random.PRNGKey(3), (Mg, 28, 28, 1))
        opt = optax.adam(args.train_lr)
        opt_state = opt.init(Z)
        rng = jax.random.PRNGKey(12)
        losses, t_steps = [], []
        t_start = time.perf_counter()
        for step in range(args.train_steps):
            rng, sub, xk = jax.random.split(rng, 3)
            Xb = jax.random.normal(xk, (args.data_batch, 28, 28, 1))
            t0 = time.perf_counter()
            Z, opt_state, loss = optimize_step(
                Z, Xb, state, args.alpha, opt_state, sub,
                objective="stochastic_matfree", optimizer=opt,
                full_set_size=args.full_set,
                st_samples=args.st_samples, slq_samples=2,
                slq_num_matvecs=args.slq_matvecs,
                cg_tol=args.cg_tol, cg_maxiter=args.cg_maxiter,
                precond_rank=args.precond_rank)
            loss = float(np.asarray(loss))
            dt = time.perf_counter() - t0
            losses.append(round(loss, 2))
            t_steps.append(dt)
            log(f"[matfree] step {step:3d}: loss={loss:.2f} ({dt:.1f}s)")
            if not np.isfinite(loss):
                log("[matfree] DIVERGED — stopping the run")
                break
        hc1 = healthcheck(Mg, precond_rank=args.precond_rank, Z=Z)
        warm = t_steps[1:] or t_steps
        record(op="kl_training_run", path="matfree_cg_nystrom", M=Mg,
               d_z=d_g, steps=len(losses),
               seconds_per_step=round(float(np.median(warm)), 2),
               first_step_seconds=round(t_steps[0], 2),
               total_seconds=round(time.perf_counter() - t_start, 1),
               loss_first=losses[0], loss_last=losses[-1],
               loss_min=min(losses),
               loss_trajectory=losses,
               precond_rank=args.precond_rank, cg_tol=args.cg_tol,
               cg_maxiter=args.cg_maxiter,
               cg_rel_residual_pre=f"{hc0['cg_rel_residual']:.2e}",
               cg_rel_residual_post=f"{hc1['cg_rel_residual']:.2e}",
               cg_converged=bool(hc0['converged'] and hc1['converged']))

    if args.out:
        log(f"[matfree] wrote {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()
