"""Round-5 TPU confirmation of the matfree-CG precision root cause.

The round-5 diagnosis: the inner CG's Gram matvec ran at DEFAULT matmul
precision — bf16 MXU passes (rel err ~4e-3) — so the CG residual was
floored at ~eps*lam_max/rho >> 1 at the trained-MAP flagship Gram
(lam_max=2.1e6, rho=25) no matter the preconditioner.  The committed fix
(core/operators.py::linearize_model(matmul_precision="highest")) makes
every CG-operator site full-f32.  This script measures the SAME
conditioning profiles that stalled before the fix (committed rows in
results/matfree_evidence_r5.jsonl: deflated kappa 14-33, predicted 14-22
iters, residual stuck at 1.08-1.70) with the fixed operator, on the real
chip.

Staged and fault-tolerant: the chipless remote-compile helper SIGKILLs on
the biggest M=4096 graphs (observed twice, round 5), so each stage is
wrapped and a compile OOM records a row with "error" instead of killing
the job.  Stages, smallest first:

  A. M=1024 healthcheck (checkpoint Z): rank 64 x power {0,1} x
     maxiter {100,400}.  Round-4 baseline at these settings: CG exiting
     on maxiter at residual 6-8e-2.  Expected now: converged.
  B. M=1024 on-chip gradient contract: same-keys matfree-vs-materialized
     value + grad (round-4 baseline: value rel err 1.5e-4 but grad norms
     4.7% apart with cg_converged=false on every row).
  C. M=4096 healthcheck (checkpoint Z): n_probes=1 (slimmer graph than
     the SIGKILLed 4-probe one), rank 64, power {0,1}.

Reference anchor: the reference has no CG-convergence instrument at all
(its matfree solve exits silently, /root/reference/src/stochtrace.py:
138-149) and never ran its pipeline at d_z=40,960.

Usage (TPU, env untouched, chip must be free):
    nohup python -u scripts/r5_precision_confirm.py \
        --out results/precision_confirm_r5.jsonl > /tmp/r5_jobE.log 2>&1 &
CPU smoke:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python \
        scripts/r5_precision_confirm.py --m_small 16 --m_large 32 \
        --st 4 --slq_matvecs 8 --batch 32 --skip_ckpt
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
    kl_objective_stochastic, matfree_cg_healthcheck)
from laplace_inducing_points_tpu.utils.checkpoint import (load_array,
                                                          load_train_state)
from laplace_inducing_points_tpu.utils.config import load_experiment_config


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/scale/lenet5_mnist_matfree4k.yml")
    p.add_argument("--ckpt_map", default="checkpoint/map/")
    p.add_argument("--dataset", default="mnist")
    p.add_argument("--m_small", type=int, default=1024)
    p.add_argument("--m_large", type=int, default=4096)
    p.add_argument("--ckpt_small", default="checkpoint/ind1k/")
    p.add_argument("--ckpt_small_step", type=int, default=60)
    p.add_argument("--ckpt_large", default="checkpoint/ind4k/")
    p.add_argument("--ckpt_large_step", type=int, default=300)
    p.add_argument("--skip_ckpt", action="store_true",
                   help="use loader-init Z instead of checkpoints (CPU smoke)")
    p.add_argument("--alpha", type=float, default=50.0)
    p.add_argument("--full_set", type=int, default=8192)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--st", type=int, default=16)
    p.add_argument("--slq_matvecs", type=int, default=64)
    p.add_argument("--cg_tol", type=float, default=1e-3)
    p.add_argument("--rank", type=int, default=64)
    p.add_argument("--powers", type=int, nargs="+", default=[0, 1])
    p.add_argument("--maxiters", type=int, nargs="+", default=[100, 400])
    p.add_argument("--cg_example_block", type=int, default=None,
                   help="blocked HIGHEST CG operator (BlockedWFactor): "
                        "bounds the remote-compile graph to this many "
                        "examples per lax.map/scan body")
    p.add_argument("--env_alphas", type=float, nargs="+",
                   default=[0.005, 0.05, 0.5, 5.0, 50.0],
                   help="stage B usable-alpha envelope sweep (alpha rides "
                        "as a dynamic jit arg — no extra compiles; 0.005 = "
                        "the MAP prior where the pre-fix CG stalled)")
    p.add_argument("--n_probes", type=int, default=2,
                   help="healthcheck CG probe count (pass 4 to reuse the "
                        "graphs train_inducing_points' pre-training "
                        "healthcheck already compiled)")
    p.add_argument("--skip_a", action="store_true")
    p.add_argument("--skip_b", action="store_true")
    p.add_argument("--skip_c", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from laplace_inducing_points_tpu.utils import (acquire_tpu_lock,
                                                   setup_compile_cache)
    setup_compile_cache()
    acquire_tpu_lock()
    log(f"[confirm] devices: {jax.devices()}")

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
    log(f"[confirm] MAP checkpoint loaded (step {int(state.step)})")

    rows = []

    def record(**kw):
        rows.append(kw)
        log("[confirm] " + json.dumps(kw))
        if args.out:
            with open(args.out, "a" if rows[1:] else "w") as f:
                f.write(json.dumps(kw) + "\n")

    def guarded(stage, fn):
        """Run one stage; a remote-compile SIGKILL (or any JAX runtime
        error) records the failure and lets the next stage proceed."""
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — survive compile-helper OOM
            record(op="stage_error", stage=stage,
                   error=f"{type(e).__name__}: {e}"[:400])

    def load_z(path, m, step):
        if args.skip_ckpt:
            ld, *_ = get_dataloaders(args.dataset, m, aug=False)
            return jnp.asarray(next(iter(ld))[0], dtype=jnp.float32)
        return jnp.asarray(load_array(path, f"ind_{args.dataset}", step))

    def health(Z, M, source, n_probes, powers):
        d_z = M * 10
        for power in powers:
            for mi in args.maxiters:
                t0 = time.time()
                hc = matfree_cg_healthcheck(
                    state, Z, args.alpha, full_set_size=args.full_set,
                    cg_tol=args.cg_tol, cg_maxiter=mi,
                    precond_rank=args.rank, precond_power=power,
                    key=jax.random.PRNGKey(11), n_probes=n_probes,
                    cg_example_block=args.cg_example_block,
                    warn=False)
                record(op="cond_profile_f32", M=M, d_z=d_z, source=source,
                       alpha=args.alpha, precond_rank=args.rank,
                       precond_power=power, cg_maxiter=mi,
                       cg_tol=args.cg_tol, n_probes=n_probes,
                       cg_example_block=args.cg_example_block,
                       lam_max=f"{hc['lam_max']:.4g}",
                       lam_seen=f"{hc['lam_seen']:.4g}",
                       kappa=round(hc["kappa"], 1),
                       kappa_deflated=round(hc["kappa_deflated"], 1),
                       predicted_iters=round(hc["predicted_iters"], 1),
                       cg_rel_residual=f"{hc['cg_rel_residual']:.2e}",
                       cg_converged=bool(hc["converged"]),
                       seconds=round(time.time() - t0, 2))

    # Stage A — M=1024 healthcheck with the f32 operator
    if not args.skip_a:
        def stage_a():
            Z = load_z(args.ckpt_small, args.m_small, args.ckpt_small_step)
            log(f"[confirm] stage A: M={args.m_small} healthcheck")
            health(Z, args.m_small, "ckpt_small", n_probes=args.n_probes,
                   powers=args.powers)
        guarded("A", stage_a)

    # Stage B — M=1024 on-chip gradient contract (same keys)
    if not args.skip_b:
        def stage_b():
            Z = load_z(args.ckpt_small, args.m_small, args.ckpt_small_step)
            X = jnp.asarray(x_all[:args.batch])
            log(f"[confirm] stage B: M={args.m_small} gradient contract")
            obj_kw = dict(full_set_size=args.full_set, st_samples=args.st,
                          slq_samples=2, slq_num_matvecs=args.slq_matvecs)
            mat_obj = partial(kl_objective_stochastic, **obj_kw)
            mat_vg = jax.jit(lambda z, x, st, a, k:
                             jax.value_and_grad(mat_obj)(z, x, st, a, k))

            # STAGED sketch (round 5): the monolithic matfree grad graph —
            # rank-64 HIGHEST sketch + CG + SLQ in one jit — SIGKILLed the
            # remote compile helper; the sketch rides in as device arrays
            # (same 0x4E59 fold as the internal build, bit-comparable).
            from laplace_inducing_points_tpu.training.inducing import (
                _probe_sketch)

            def mf(z, x, st, a, k, mi, sk):
                return kl_objective_stochastic(
                    z, x, st, a, k, materialize_w=False,
                    cg_tol=args.cg_tol, cg_maxiter=mi,
                    precond_rank=args.rank, precond_power=1,
                    precond_sketch=sk,
                    cg_example_block=args.cg_example_block, **obj_kw)
            mf_vg = jax.jit(lambda z, x, st, a, k, mi, sk:
                            jax.value_and_grad(mf)(z, x, st, a, k, mi, sk))

            keys = [jax.random.PRNGKey(s) for s in (101, 202)]
            t0 = time.time()
            v_ref, g_ref = mat_vg(Z, X, state, args.alpha, keys[0])
            jax.block_until_ready(g_ref)
            t_mat = time.time() - t0
            v2, g2 = mat_vg(Z, X, state, args.alpha, keys[1])
            jax.block_until_ready(g2)
            noise = float(jnp.linalg.norm((g2 - g_ref).ravel())
                          / (jnp.linalg.norm(g_ref.ravel()) + 1e-30))
            sketch = _probe_sketch(state, Z, keys[0], args.rank, 1,
                                   example_block=args.cg_example_block)
            jax.block_until_ready(sketch)
            for mi in args.maxiters:
                t0 = time.time()
                v, g = mf_vg(Z, X, state, args.alpha, keys[0],
                             jnp.int32(mi), sketch)
                jax.block_until_ready(g)
                rel = float(jnp.linalg.norm((g - g_ref).ravel())
                            / (jnp.linalg.norm(g_ref.ravel()) + 1e-30))
                cos = float(jnp.vdot(g.ravel(), g_ref.ravel())
                            / (jnp.linalg.norm(g.ravel())
                               * jnp.linalg.norm(g_ref.ravel()) + 1e-30))
                record(op="grad_contract_f32", M=args.m_small,
                       d_z=args.m_small * 10, alpha=args.alpha,
                       precond_rank=args.rank, precond_power=1,
                       cg_maxiter=mi, cg_tol=args.cg_tol,
                       cg_example_block=args.cg_example_block,
                       value_rel_err=f"{abs(float(v - v_ref)) / abs(float(v_ref)):.2e}",
                       grad_rel_l2=round(rel, 4), grad_cosine=round(cos, 6),
                       grad_norm_mat=round(float(jnp.linalg.norm(g_ref.ravel())), 2),
                       grad_norm_mf=round(float(jnp.linalg.norm(g.ravel())), 2),
                       probe_noise_rel_l2=round(noise, 4),
                       subdominant=bool(rel < noise),
                       seconds=round(time.time() - t0, 2),
                       seconds_materialized=round(t_mat, 2))

            # usable-alpha envelope: alpha is a DYNAMIC argument of both
            # twins, so the whole sweep reuses the two compiled graphs —
            # this is the "document the envelope as a checked contract"
            # measurement (VERDICT r4 task 3) at production shape
            for a in args.env_alphas:
                va, ga = mat_vg(Z, X, state, a, keys[0])
                jax.block_until_ready(ga)
                v, g = mf_vg(Z, X, state, a, keys[0],
                             jnp.int32(args.maxiters[-1]), sketch)
                jax.block_until_ready(g)
                rel = float(jnp.linalg.norm((g - ga).ravel())
                            / (jnp.linalg.norm(ga.ravel()) + 1e-30))
                cos = float(jnp.vdot(g.ravel(), ga.ravel())
                            / (jnp.linalg.norm(g.ravel())
                               * jnp.linalg.norm(ga.ravel()) + 1e-30))
                record(op="alpha_envelope_f32", M=args.m_small,
                       d_z=args.m_small * 10, alpha=a,
                       precond_rank=args.rank, precond_power=1,
                       cg_maxiter=args.maxiters[-1], cg_tol=args.cg_tol,
                       cg_example_block=args.cg_example_block,
                       value_rel_err=f"{abs(float(v - va)) / max(abs(float(va)), 1e-30):.2e}",
                       grad_rel_l2=round(rel, 4), grad_cosine=round(cos, 6))
        guarded("B", stage_b)

    # Stage C — M=4096 healthcheck, slim probe (n_probes=1)
    if not args.skip_c:
        def stage_c():
            Z = load_z(args.ckpt_large, args.m_large, args.ckpt_large_step)
            log(f"[confirm] stage C: M={args.m_large} healthcheck "
                f"(n_probes=1)")
            health(Z, args.m_large, "ckpt_large", n_probes=1,
                   powers=args.powers)
        guarded("C", stage_c)

    log(f"[confirm] DONE — {len(rows)} rows")


if __name__ == "__main__":
    main()
