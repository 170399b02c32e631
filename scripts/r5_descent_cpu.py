"""Round-5 descent proof: the matfree KL trainer OPTIMIZES, it does not
merely execute (VERDICT r4 weak 2 / task 2).

The round-4 evidence gap: the 30-step d_z=40,960 chip run's 0.04% loss
drop sat inside the +/-100 noise band of a 16-probe stochastic
objective — and the round-5 diagnosis showed that run's gradients were
bf16-floored anyway (RESULTS.md "Matfree inner CG: the bf16 operator
floor"). This script supplies the missing demonstration at a shape where
every ground truth is exact, using the SAME library entry points the
scale CLIs call (`train_inducing_points`, objectives "stochastic" /
"stochastic_matfree"):

  1. **Trajectory tracking** (task 2a): train Z twice from the same init
     with the SAME rng — once with the materialized stochastic objective,
     once matrix-free. Identical key streams mean identical probe draws;
     the only difference is Cholesky-Woodbury vs batched-CG solves, so
     the per-step loss gap measures exactly the CG error.
  2. **Resolvable descent beyond noise** (task 2b): the full-set KL here
     is the EXACT dense objective (`kl_objective_dense` — deterministic,
     no probes), evaluated at Z_init and each arm's Z_final. A drop in
     the exact KL cannot hide inside estimator noise by construction.
  3. **Gradient contract at the trained point**: same-key rel-L2 and
     cosine of dKL/dZ (matfree vs materialized) at Z_init and Z_final —
     the small-shape analog of the on-chip contract rows
     (results/matfree_evidence_r5.jsonl).

CPU caveat, stated honestly: XLA:CPU matmuls are f32, so the bf16
operator floor does NOT bind here — this measures that the matfree
TRAINER descends and tracks its twin when the inner CG is healthy (the
fixed-operator regime; the floor itself is measured on the chip in
results/floor_ab_r5.jsonl). Reference anchor: the reference trains
inducing points only via its materialized objective
(/root/reference/src/train_inducing.py:235-324); a matrix-free trainer
has no reference counterpart to compare against, hence the dense twin.

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -u \
        scripts/r5_descent_cpu.py --out results/descent_cpu_r5.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--m", type=int, default=32)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--st_samples", type=int, default=64)
    p.add_argument("--precond_rank", type=int, default=16)
    p.add_argument("--map_steps", type=int, default=400)
    p.add_argument("--out", default="results/descent_cpu_r5.jsonl")
    args = p.parse_args()

    from laplace_inducing_points_tpu.data.toy import banana_dataset
    from laplace_inducing_points_tpu.models.toy import SimpleClassifier
    from laplace_inducing_points_tpu.models.state import create_train_state
    from laplace_inducing_points_tpu.training.inducing import (
        kl_objective_dense, kl_objective_stochastic, train_inducing_points)

    key = jax.random.PRNGKey(0)
    x, y = banana_dataset(args.n, jax.random.fold_in(key, 1))
    model = SimpleClassifier(num_hidden=16, num_layers=2, num_classes=2)
    state = create_train_state(model, jax.random.fold_in(key, 2), x,
                               optax.adam(5e-2), "classifier")

    @jax.jit
    def map_step(state):
        def loss_fn(params):
            logits = state.apply_fn({"params": params}, x)
            oh = jax.nn.one_hot(y, 2)
            return jnp.mean(optax.softmax_cross_entropy(logits, oh))
        return state.apply_gradients(grads=jax.grad(loss_fn)(state.params))

    for _ in range(args.map_steps):
        state = map_step(state)
    logits = state.apply_fn({"params": state.params}, x)
    acc = float(jnp.mean(jnp.argmax(logits, -1) == y))
    log(f"[descent] MAP trained: train ACC {acc:.3f}")

    z_init = x[: args.m]                      # data-driven init (reference's)
    rows = []

    def emit(row):
        rows.append(row)
        log(f"[descent] {json.dumps(row)}")
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    common = dict(alpha=args.alpha, num_steps=args.steps,
                  full_set_size=args.n, st_samples=args.st_samples,
                  precond_rank=args.precond_rank, verbose=False)

    def batches():
        while True:
            yield x, y

    def run_arm(objective):
        losses = []
        zf = train_inducing_points(
            state, z_init, optax.adam(args.lr), batches(),
            objective=objective, rng=jax.random.PRNGKey(7),
            callback=lambda s, Z, l: losses.append(round(l, 4)), **common)
        return zf, losses

    z_mat, loss_mat = run_arm("stochastic")
    z_mf, loss_mf = run_arm("stochastic_matfree")

    dense = jax.jit(lambda Z: kl_objective_dense(
        Z, x, state, args.alpha, full_set_size=args.n))
    kl0 = float(dense(z_init))
    kl_mat = float(dense(z_mat))
    kl_mf = float(dense(z_mf))

    # per-step tracking gap between the arms (identical probe keys)
    la = jnp.asarray(loss_mat)
    lb = jnp.asarray(loss_mf)
    gap = jnp.abs(la - lb) / jnp.maximum(jnp.abs(la), 1e-30)
    # estimator noise band at Z_init: std of the materialized stochastic
    # objective over fresh keys (what a "loss drop" must beat)
    obj = jax.jit(lambda Z, k: kl_objective_stochastic(
        Z, x, state, args.alpha, k, full_set_size=args.n,
        st_samples=args.st_samples))
    vals = jnp.stack([obj(z_init, jax.random.PRNGKey(100 + i))
                      for i in range(8)])
    noise_sd = float(jnp.std(vals))

    emit({"op": "kl_training_descent", "objectives": "stochastic vs "
          "stochastic_matfree (same rng)", "M": args.m, "n": args.n,
          "alpha": args.alpha, "steps": args.steps,
          "map_acc": round(acc, 4),
          "loss_mat_first_last": [loss_mat[0], loss_mat[-1]],
          "loss_mf_first_last": [loss_mf[0], loss_mf[-1]],
          "tracking_gap_median": f"{float(jnp.median(gap)):.2e}",
          "tracking_gap_max": f"{float(jnp.max(gap)):.2e}",
          "dense_kl_init": round(kl0, 4),
          "dense_kl_final_materialized": round(kl_mat, 4),
          "dense_kl_final_matfree": round(kl_mf, 4),
          "kl_drop_matfree": round(kl0 - kl_mf, 4),
          "stoch_objective_noise_sd": round(noise_sd, 4),
          "drop_over_noise_sd": round((kl0 - kl_mf) / max(noise_sd, 1e-30),
                                      1),
          "loss_mat_traj": loss_mat, "loss_mf_traj": loss_mf})

    # gradient contract at init and at the trained point (same key)
    def gcontract(Z, tag):
        k = jax.random.PRNGKey(11)
        g_mat = jax.grad(lambda z: kl_objective_stochastic(
            z, x, state, args.alpha, k, full_set_size=args.n,
            st_samples=args.st_samples, materialize_w=True))(Z)
        g_mf = jax.grad(lambda z: kl_objective_stochastic(
            z, x, state, args.alpha, k, full_set_size=args.n,
            st_samples=args.st_samples, materialize_w=False,
            precond_rank=args.precond_rank))(Z)
        a, b = g_mat.ravel(), g_mf.ravel()
        rel = float(jnp.linalg.norm(a - b) / jnp.maximum(
            jnp.linalg.norm(a), 1e-30))
        cos = float(jnp.vdot(a, b) / jnp.maximum(
            jnp.linalg.norm(a) * jnp.linalg.norm(b), 1e-30))
        emit({"op": "grad_contract", "at": tag, "M": args.m,
              "rel_l2": f"{rel:.3e}", "cosine": f"{cos:.6f}",
              "grad_norm_materialized": f"{float(jnp.linalg.norm(a)):.4e}",
              "grad_norm_matfree": f"{float(jnp.linalg.norm(b)):.4e}"})

    gcontract(z_init, "z_init")
    gcontract(z_mf, "z_final_matfree")
    emit({"op": "done", "backend": jax.devices()[0].platform})


if __name__ == "__main__":
    main()
