"""Round-5 on-chip A/B: the bf16 operator floor in the matfree inner CG,
and its removal by the HIGHEST blocked operator — checkpoint-free.

The committed pre-fix evidence (results/matfree_evidence_r5.jsonl) shows
CG stuck at relative residual 1.08-1.70 where exact arithmetic needs ~15
iterations; the diagnosis (RESULTS.md "Matfree inner CG: the bf16
operator floor") is that a matvec carrying relative error eps floors the
attainable residual at ~eps*lam_max/rho = eps*kappa no matter the
preconditioning, and the TPU MXU's DEFAULT precision is bf16 passes with
eps ~ 4e-3.  The fix (every CG-operator W factor at
matmul_precision="highest", example-blocked so the remote compile helper
survives the f32 conv emulation) could not be re-measured at the original
checkpoints — the round's VM rotation wiped checkpoint/ — so this script
measures the floor LAW itself, which is state-independent:

    DEFAULT arm:  rel residual after CG ~ eps_bf16 * kappa  (stall)
    HIGHEST arm:  rel residual -> tol                        (converges)

swept over kappa = lam_max/rho in {1e2, 1e3, 1e4} at the SAME LeNet5
Gram operator (M inducing images, softmax GGN) — rho rides as a dynamic
jit argument, so the sweep reuses one compiled graph per arm.  Both
arms' final residuals are measured with the HIGHEST operator (the honest
metric: measuring the DEFAULT arm with its own bf16 matvec would hide
the very error being demonstrated).

Staged like training/inducing.py's healthcheck probes: each jit holds
exactly ONE W-factor instantiation (the remote compile helper SIGKILLs
on multi-factor HIGHEST monoliths — RESULTS.md, results/
precision_confirm_r5*.jsonl), and every stage is fault-wrapped so a
compile OOM records a stage_error row instead of killing the job.

Reference anchor: the reference's CG exits silently
(/root/reference/src/stochtrace.py:138-149) and runs f32 CUDA matvecs —
this failure class is TPU-native and so is its instrument.

Usage (TPU, env untouched, chip free):
    nohup python -u scripts/r5_floor_ab.py > /tmp/r5_floor_ab.log 2>&1 &
CPU smoke (DEFAULT==f32 on CPU, so both arms converge — checks plumbing):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/r5_floor_ab.py \
        --m 32 --kappas 100 --maxiter 400 --out /tmp/floor_ab_smoke.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512, help="inducing set size")
    p.add_argument("--block", type=int, default=128,
                   help="cg_example_block for the HIGHEST arm (the shipped "
                        "config value)")
    p.add_argument("--n_probes", type=int, default=2)
    p.add_argument("--kappas", type=float, nargs="+",
                   default=[1e2, 1e3, 1e4])
    p.add_argument("--cg_tol", type=float, default=1e-3)
    p.add_argument("--maxiter", type=int, default=1500,
                   help="generous vs the ~0.5*sqrt(kappa)*ln(2/tol) bound "
                        "(~380 at kappa=1e4) so a stall is unambiguous")
    p.add_argument("--out", default="results/floor_ab_r5.jsonl")
    args = p.parse_args()

    from laplace_inducing_points_tpu.utils import (acquire_tpu_lock,
                                                   setup_compile_cache)
    setup_compile_cache()
    acquire_tpu_lock()
    log(f"[floor_ab] devices: {jax.devices()}")

    from laplace_inducing_points_tpu.models.registry import get_model
    from laplace_inducing_points_tpu.models.state import create_train_state
    from laplace_inducing_points_tpu.core import operators as ops
    from laplace_inducing_points_tpu.ops import cg as cg_mod

    key = jax.random.PRNGKey(0)
    model = get_model({"name": "LeNet5"})
    state = create_train_state(model, jax.random.fold_in(key, 1),
                               jnp.zeros((1, 28, 28, 1)), optax.adam(1e-3),
                               "classifier")
    # on-device synthetic inducing images (host->device transfers of numpy
    # batches can hang through the tunnel; jax.random never does)
    Z = 0.5 + 0.25 * jax.random.normal(jax.random.fold_in(key, 2),
                                       (args.m, 28, 28, 1))
    b = jax.random.normal(jax.random.fold_in(key, 3),
                          (args.n_probes, args.m * 10))

    rows = []

    def emit(row):
        rows.append(row)
        log(f"[floor_ab] {json.dumps(row)}")
        if args.out:
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "w") as fh:
                for r in rows:
                    fh.write(json.dumps(r) + "\n")

    # --- stage 1: lam_max (DEFAULT factor — a 4e-3-accurate top eigenvalue
    # is plenty for choosing rho; keeps the fast-compiling graph) ----------
    @jax.jit
    def lam_max_fn(state, Z, key):
        wz = ops.make_w_factor(state, Z)
        d = wz.inner_shape[0] * wz.inner_shape[1]

        def gmv(u):
            M, K = wz.inner_shape
            return wz.t_matvec(wz.matvec(u.reshape(M, K))).reshape(d)

        v0 = jax.random.normal(key, (d,))
        v = jax.lax.fori_loop(
            0, 30,
            lambda _, v: (lambda w: w / jnp.maximum(jnp.linalg.norm(w),
                                                    1e-30))(gmv(v)),
            v0 / jnp.linalg.norm(v0))
        return jnp.maximum(jnp.vdot(v, gmv(v)), 0.0)

    t0 = time.monotonic()
    try:
        lam_max = float(lam_max_fn(state, Z, jax.random.fold_in(key, 4)))
    except Exception as e:  # noqa: BLE001 - record and bail, chip job
        emit({"op": "stage_error", "stage": "lam_max",
              "error": f"{type(e).__name__}: {e}"[:400]})
        return
    emit({"op": "lam_max", "M": args.m, "d_z": args.m * 10,
          "lam_max": f"{lam_max:.4g}",
          "seconds": round(time.monotonic() - t0, 2)})

    # --- stage 2: DEFAULT-arm CG (bf16 MXU passes — the pre-fix operator) -
    @partial(jax.jit, static_argnames=("maxiter", "tol"))
    def cg_default(state, Z, b, rho, maxiter, tol):
        wz = ops.make_w_factor(state, Z)

        def c_matmat(Xm):
            return wz.gram_matmat(Xm, block=b.shape[0]) + rho * Xm

        return cg_mod.cg_batched(c_matmat, b, tol=tol, maxiter=maxiter)

    # --- stage 3: HIGHEST blocked arm + the honest residual of BOTH -------
    @partial(jax.jit, static_argnames=("maxiter", "tol", "block"))
    def cg_highest_and_measure(state, Z, b, X_def, rho, maxiter, tol, block):
        wz = ops.make_w_factor_blocked(state, Z, block,
                                       matmul_precision="highest")

        def c_matmat(Xm):
            return wz.gram_matmat(Xm, block=b.shape[0]) + rho * Xm

        X_hi = cg_mod.cg_batched(c_matmat, b, tol=tol, maxiter=maxiter)
        den = jnp.maximum(jnp.linalg.norm(b, axis=-1), 1e-30)

        def rel(X):
            return jnp.max(jnp.linalg.norm(c_matmat(X) - b, axis=-1) / den)

        return rel(X_def), rel(X_hi)

    for kappa in args.kappas:
        rho = lam_max / kappa
        t0 = time.monotonic()
        try:
            X_def = jax.block_until_ready(
                cg_default(state, Z, b, rho, args.maxiter, args.cg_tol))
        except Exception as e:  # noqa: BLE001
            emit({"op": "stage_error", "stage": f"default@{kappa:g}",
                  "error": f"{type(e).__name__}: {e}"[:400]})
            continue
        t_def = time.monotonic() - t0
        t0 = time.monotonic()
        try:
            r_def, r_hi = cg_highest_and_measure(
                state, Z, b, X_def, rho, args.maxiter, args.cg_tol,
                args.block)
            r_def = float(r_def)
            r_hi = float(r_hi)
        except Exception as e:  # noqa: BLE001
            emit({"op": "stage_error", "stage": f"highest@{kappa:g}",
                  "error": f"{type(e).__name__}: {e}"[:400]})
            continue
        t_hi = time.monotonic() - t0
        emit({"op": "floor_ab", "M": args.m, "d_z": args.m * 10,
              "block": args.block, "n_probes": args.n_probes,
              "kappa": kappa, "rho": f"{rho:.4g}",
              "cg_tol": args.cg_tol, "maxiter": args.maxiter,
              "rel_residual_default": f"{r_def:.3e}",
              "rel_residual_highest": f"{r_hi:.3e}",
              "floor_law_eps": f"{r_def / kappa:.2e}",
              "seconds_default": round(t_def, 2),
              "seconds_highest": round(t_hi, 2)})

    emit({"op": "done", "backend": jax.devices()[0].platform})


if __name__ == "__main__":
    main()
