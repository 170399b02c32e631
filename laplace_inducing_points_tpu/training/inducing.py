"""Inducing-point optimization: minimize KL[q(θ|Z) ‖ q(θ|D)] over Z.

Parity: ``/root/reference/src/train_inducing.py`` — all three objective
variants are provided, rebuilt on the batched operator layer:

* ``kl_objective_dense``    — full D×D curvatures (test oracle; reference
  ``alternative_objective_dense``, ``:176-192``),
* ``kl_objective_gram``     — exact, matrix-free-in-D: everything through
  the small Grams ``WzᵀWz``/``WxᵀWz`` with a Cholesky Woodbury solve
  (reference ``alternative_objective_scalable_exact``, ``:26-84``). This is
  the **production** path on TPU: for M inducing points with K outputs the
  Grams are (M·K)², built by MXU matmuls — no estimator variance at all.
* ``kl_objective_stochastic`` — Hutch++ trace + SLQ log-det with shared
  Rademacher probes (reference ``alternative_objective_scalable``,
  ``:87-173``). Its win over the gram path is avoiding the **data-batch**
  Gram/cross-Gram (``d_x × d_z`` work becomes probe-count-bounded MVPs).
  By default the inducing-side solve goes through the dense ``d_z × d_z``
  Gram (Woodbury, parity with the reference); ``materialize_w=False``
  (objective name ``stochastic_matfree``) replaces it with a CG solve
  against the matrix-free Gram operator, making the whole objective free
  of ``d_z × D`` / ``d_z × d_z`` intermediates — the d_z-beyond-eigh
  regime the reference has no path for. Note:
  the reference's SLQ target omits the ``β = N/M`` recalibration inside the
  bidiagonal operator (``:164-168`` stacks ``[√α·v; Wzᵀv]``); this
  implementation includes it so the stochastic objective is consistent with
  the dense KL (the discrepancy is documented here, not reproduced).

Gradients w.r.t. Z flow through every path — estimators, QR, Krylov
recurrences, Cholesky — as required by ``optimize_step``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import optax

from laplace_inducing_points_tpu.core import operators as ops
from laplace_inducing_points_tpu.ops import slq as slq_mod
from laplace_inducing_points_tpu.ops.pallas.syrk import syrk
from laplace_inducing_points_tpu.ops import stochtrace as st


# ---------------------------------------------------------------------------
# objectives
# ---------------------------------------------------------------------------

def kl_objective_dense(Z, X, state, alpha, key=None,
                       full_set_size: Optional[int] = None) -> jnp.ndarray:
    """tr(S S_z⁻¹) + logdet(S_z)   (Z-independent logdet S dropped)."""
    S = ops.curvature_dense(state, X, alpha, full_set_size)
    S_z = ops.curvature_dense(state, Z, alpha, full_set_size)
    S_z_inv = jnp.linalg.inv(S_z)
    trace_term = jnp.trace(ops.pdot(S, S_z_inv))
    logdet_term = -jnp.linalg.slogdet(S_z_inv)[1]
    return trace_term + logdet_term


def _grams(state, Z, X, example_block=None):
    """Unscaled Gram blocks through materialized Lᵀ J rows."""
    Rz = ops.dense_wt(state, Z, example_block=example_block)     # (d_z, D)
    Rx = ops.dense_wt(state, X, example_block=example_block)     # (d_x, D)
    Gzz = syrk(Rz)
    Gxz = ops.pdot(Rx, Rz.T)
    tr_Gxx = jnp.sum(Rx * Rx)
    return Gzz, Gxz, tr_Gxx, Rz.shape[1]


def _pivot_jitter(C: jnp.ndarray) -> jnp.ndarray:
    """Cholesky pivot-safety jitter for a theoretically-PD matrix.

    f32 round-off perturbs the computed Gram's spectrum by O(eps·λ_max), so
    the jitter must track the SPECTRAL norm, not the mean diagonal — at
    d_z=500 / λ_max≈2.6e5 (saturated flagship ResNet MAP, CIFAR M=50) a
    mean-diagonal jitter left C indefinite and the first inducing step
    NaN'd. λ_max is bounded cheaply inside the jit by the Gershgorin row
    sum; 2e-6 ≈ 16·eps_f32 clears the round-off band while staying below
    the f32 information limit of any eigenvalue it could bias.
    """
    lam_max_bound = jnp.max(jnp.sum(jnp.abs(C), axis=1))
    return 2e-6 * lam_max_bound


def _kl_core(Gzz, Gxz, tr_Gxx, D, alpha, beta, gamma,
             include_constants: bool = True) -> jnp.ndarray:
    """KL value from the small Gram blocks (shared by the monolithic and
    chunk-compiled gram objectives).

    With β=N/M, γ=N/K, Mᵢ = β⁻¹I + α⁻¹Gzz:

      trace  = D + γα⁻¹tr(Gxx) − α⁻¹tr(Mᵢ⁻¹Gzz) − γα⁻²tr(Gxz Mᵢ⁻¹ Gxzᵀ)
      logdet = D·log α + logdet(I + (β/α)·Gzz)
    """
    a_inv = 1.0 / alpha
    d_z = Gzz.shape[0]
    eye = jnp.eye(d_z, dtype=Gzz.dtype)

    # Numerically-stable C-form: with Mᵢ = β⁻¹I + α⁻¹Gzz = α⁻¹C,
    # C = Gzz + (α/β)I keeps every factored matrix at the Gram's own scale
    # (the naive Mᵢ has entries ~α⁻¹‖Gzz‖, whose f32 Cholesky overflows its
    # pivot tolerance for small α — observed NaNs on the sine experiment at
    # α=1e-3). A relative jitter guards the rank-deficient CE case where
    # λ_min(Gzz)=0 and α/β alone can sit below f32 pivot round-off.
    C = Gzz + (alpha / beta) * eye
    L = jnp.linalg.cholesky(ops.ensure_symmetry(C, jitter=0.0)
                            + _pivot_jitter(C) * eye)
    C_inv_Gzz = jax.scipy.linalg.cho_solve((L, True), Gzz)
    C_inv_Gxz_t = jax.scipy.linalg.cho_solve((L, True), Gxz.T)

    trace_term = (- jnp.trace(C_inv_Gzz)
                  - gamma * a_inv * jnp.sum(Gxz.T * C_inv_Gxz_t))
    # logdet(I + (β/α)Gzz) = d_z·log(β/α) + logdet(C), via the Cholesky
    logdet_term = (d_z * jnp.log(beta * a_inv)
                   + 2.0 * jnp.sum(jnp.log(jnp.diag(L))))
    if include_constants:
        trace_term = trace_term + D + gamma * a_inv * tr_Gxx
        logdet_term = logdet_term + D * jnp.log(alpha)
    return trace_term + logdet_term


def kl_objective_gram(Z, X, state, alpha, key=None,
                      full_set_size: Optional[int] = None,
                      include_constants: bool = True,
                      example_block: Optional[int] = None) -> jnp.ndarray:
    """Exact KL through small Grams (the TPU production objective).

    Z-independent constants are kept by default so the value (not just the
    gradient) matches ``kl_objective_dense`` in tests; the reference drops
    them (``/root/reference/src/train_inducing.py:70-85``).
    """
    N = full_set_size or Z.shape[0]
    beta = N / Z.shape[0]
    gamma = N / X.shape[0]
    Gzz, Gxz, tr_Gxx, D = _grams(state, Z, X, example_block)
    return _kl_core(Gzz, Gxz, tr_Gxx, D, alpha, beta, gamma,
                    include_constants)


def kl_objective_stochastic(Z, X, state, alpha, key,
                            full_set_size: Optional[int] = None,
                            st_samples: int = 256,
                            slq_samples: int = 2,
                            slq_num_matvecs: Optional[int] = None,
                            materialize_w: bool = True,
                            cg_tol: float = 1e-3,
                            cg_maxiter: Optional[int] = None,
                            precond_rank: Optional[int] = 64,
                            precond_power: int = 0,
                            precond_sketch=None,
                            cg_example_block: Optional[int] = None
                            ) -> jnp.ndarray:
    """Hutch++ trace + SLQ logdet with shared Rademacher probes.

    Parity: ``alternative_objective_scalable``
    (``/root/reference/src/train_inducing.py:87-173``) — probe sharing, the
    (st_samples−16, 16) Hutch++ split, Woodbury through the dense d_z Gram.

    ``materialize_w=False`` (round 3, beyond-reference): the Woodbury inner
    solve runs as a **batched CG solve against the matrix-free Gram
    operator** ``X ↦ Wzᵀ(Wz X) + (α/β)X`` instead of a Cholesky of the
    dense ``Gzz`` — nothing of size ``d_z × D`` or ``d_z × d_z`` is ever
    materialized (statically asserted in ``tests/test_variational.py``),
    so ``d_z`` can exceed the eigh/Cholesky range. All Hutch++ probes ride
    ONE ``while_loop`` as stacked loop state (``ops/cg.py`` — round 5:
    vmap-of-cg over the HIGHEST operator OOMs the remote compile helper),
    with per-probe tolerance masking. Gradients w.r.t. Z flow through the
    solve by implicit differentiation (``lax.custom_linear_solve``
    ``symmetric=True`` — the transpose solve reuses the same PSD
    operator). The reference's stacked SLQ operator is already
    matrix-free; only its Woodbury wasn't
    (``/root/reference/src/train_inducing.py:122-132``). Cost: each CG
    iteration is one probe-chunked jvp+vjp sweep of the batched model at
    Z; ``cg_tol`` trades iterations against bias in the trace estimate
    (error enters linearly, bounded by the ~1/√P estimator noise for
    tol ≪ 1/√P).

    Round-4 defaults: ``precond_rank=64`` (Nyström deflation ON —
    unpreconditioned CG at GGN spectra exits on maxiter, not tolerance;
    see ``inference/sample.py::make_matheron_sampler``'s accuracy
    contract) and ``cg_tol=1e-3`` (measured 6.1e-5 objective-value
    agreement with the materialized twin at d_z=10,240 — far inside the
    estimator's probe noise). jax's CG reports neither iterations nor the
    final residual, so ``train_inducing_points`` runs
    :func:`matfree_cg_healthcheck` before step 0 and warns on maxiter
    exits.
    """
    N = full_set_size or Z.shape[0]
    M = Z.shape[0]
    beta = N / M
    a_inv = 1.0 / alpha
    sqrt_alpha = jnp.sqrt(alpha)
    sqrt_beta = jnp.sqrt(beta)
    slq_num_matvecs = slq_num_matvecs or max(int(0.8 * M), 4)

    # operators: S on the data minibatch (γ-recalibrated), W_z unscaled
    lin_x = ops.linearize_model(state, X)
    s_vp = ops.make_curvature_operator(state, X, alpha, full_set_size=N,
                                       lin=lin_x)
    wz = ops.make_w_factor(state, Z, full_set_size=None)
    Mk, Kk = wz.inner_shape
    d_z = Mk * Kk

    if materialize_w:
        Rz = ops.dense_wt(state, Z)
        Gzz = syrk(Rz)
        eye = jnp.eye(d_z, dtype=Gzz.dtype)
        # stable C-form Woodbury (see kl_objective_gram): Mᵢ⁻¹ = α·C⁻¹
        C = Gzz + (alpha / beta) * eye
        L = jnp.linalg.cholesky(ops.ensure_symmetry(C, jitter=0.0)
                                + _pivot_jitter(C) * eye)

        def c_solve(u):
            return jax.scipy.linalg.cho_solve((L, True), u)
    else:
        # The CG OPERATOR must run at full f32 matmul precision (round-5
        # root cause): on the TPU MXU the default bf16 passes give each
        # Gram matvec a relative error ~4e-3·λ_max, and no preconditioner
        # can push the CG residual below that floor — at the trained-MAP
        # flagship Gram (λ_max≈2.1e6, ρ=α/β≈25) the measured residual was
        # 1.08 at deflated-κ 32 where exact arithmetic predicts 22
        # iterations; the identical probe at HIGHEST converges (see
        # RESULTS.md "Matfree inner CG").  The probe SWEEPS stay at the
        # ~6× cheaper default: their error enters the trace linearly and
        # sits far below the 1/√P estimator noise.
        # ``cg_example_block``: run the HIGHEST operator's jvp/vjp in
        # sequential example blocks — the remote chipless compile helper
        # OOMs on the monolithic HIGHEST factor at M ≥ 1024 (SIGKILL,
        # measured round 5), and blocking makes the compiled unit's size
        # independent of M (see core.operators.BlockedWFactor).
        if cg_example_block:
            wz_cg = ops.make_w_factor_blocked(
                state, Z, cg_example_block, full_set_size=None,
                matmul_precision="highest")
        else:
            wz_cg = ops.make_w_factor(state, Z, full_set_size=None,
                                      matmul_precision="highest")

        precond = None
        if precond_rank and precond_sketch is not None:
            # STAGED sketch (round 5): the caller built (U, lam, good) in
            # its own jit (``_probe_sketch`` — same fold_in constant, same
            # probe block, same HIGHEST factor) and passes it as device
            # arrays. Keeps the value_and_grad graph down to the CG
            # operator's factor instantiations: the monolith with the
            # rank-64 sketch inside SIGKILLed the remote compile helper at
            # HIGHEST precision (M=1024, measured round 5). Semantically
            # identical — the sketch is stop_gradient'd either way and
            # only steers CG's trajectory, never its fixed point.
            from laplace_inducing_points_tpu.ops.nystrom import (
                precond_from_sketch)
            U_s, lam_s, good_s = precond_sketch
            precond = precond_from_sketch(U_s, lam_s, good_s, alpha / beta)
        elif precond_rank:
            from laplace_inducing_points_tpu.ops.nystrom import (
                nystrom_preconditioner, sketch_probe_block)

            blk = sketch_probe_block(Mk, precond_rank)

            def gram_mm(V):                       # (k, d_z) -> (k, d_z)
                return wz_cg.gram_matmat(V, block=blk)

            # fold_in keeps the estimator probes' key stream untouched, so
            # precond on/off changes CG convergence only, never the value
            # being estimated.
            precond = nystrom_preconditioner(
                gram_mm, d_z, precond_rank, alpha / beta,
                jax.random.fold_in(key, 0x4E59), power=precond_power)

        # None-guard (not ``or``): cg_maxiter may ride as a TRACED argument
        # — e.g. the gradient-contract sweep jits it dynamically so one
        # compiled graph serves every iteration budget — and ``or`` would
        # call __bool__ on the tracer
        maxiter = (10 * d_z) if cg_maxiter is None else cg_maxiter

    if materialize_w:
        def sz_inv_vp(v):
            u = wz.t_matvec(v).reshape(d_z)
            x = c_solve(u)
            return a_inv * v - a_inv * wz.matvec(x.reshape(Mk, Kk))

        def composite(V):
            return jax.vmap(lambda v: s_vp(sz_inv_vp(v)))(V)
    else:
        # BATCHED probe solve (round 5): vmap-of-CG-while_loop over the
        # HIGHEST operator OOM-SIGKILLs the remote compile helper even at
        # 4 probes x a block-128 factor, while the same operator compiles
        # under fori_loop and under probe-chunked sweeps (ops/cg.py). One
        # while_loop carries ALL probes as loop state; the operator rides
        # as a probe-chunked gram_matmat — the exact graph shape the
        # Nyström sketch already compiles. Per-row masking keeps every
        # probe's iteration at its own tolerance exit; implicit dZ
        # gradients via lax.custom_linear_solve(symmetric=True), same as
        # jax.scipy's cg.
        from laplace_inducing_points_tpu.ops import cg as cg_mod
        from laplace_inducing_points_tpu.ops.nystrom import (
            sketch_probe_block)
        rho = alpha / beta

        def composite(V):
            P = V.shape[0]
            cgblk = sketch_probe_block(Mk, P)

            def c_matmat(Xm):                      # (P, d_z) -> (P, d_z)
                return (wz_cg.gram_matmat(Xm, block=cgblk) + rho * Xm)

            U = wz.t_matmat(V).reshape(P, d_z)
            X = cg_mod.cg_batched(
                c_matmat, U, tol=cg_tol, maxiter=maxiter,
                precond=cg_mod.rowwise(precond) if precond else None)
            corr = wz.matmat(X.reshape(P, Mk, Kk))             # (P, D)
            return jax.vmap(s_vp)(a_inv * V - a_inv * corr)

    D = wz.num_params
    probes = st.rademacher_probes(key, st_samples, D)
    s2 = min(16, max(st_samples // 4, 1))
    trace_term = st.hutchpp(composite, probes, s1=st_samples - s2, s2=s2)

    # logdet(αI + β Wz Wzᵀ) via Golub–Kahan SLQ on the stacked operator
    def stacked(v):
        u = wz.t_matvec(v).reshape(-1)
        return jnp.concatenate([sqrt_alpha * v, sqrt_beta * u])

    def stacked_t(w):
        a, b = w[:D], w[D:]
        return sqrt_alpha * a + sqrt_beta * wz.matvec(b.reshape(Mk, Kk))

    # remat_body on the matfree path: the scan's saved operator tangents
    # (num_matvecs x M examples' activations) are what OOMed the M=4096
    # preconditioned grad on chip (ops/lanczos.py::golub_kahan_bidiag)
    logdet_term = slq_mod.slq_logdet_product(
        stacked, probes[:slq_samples], num_matvecs=slq_num_matvecs,
        t_matvec=stacked_t, remat_body=not materialize_w)

    return trace_term + logdet_term


OBJECTIVES = {
    "dense": kl_objective_dense,
    "gram": kl_objective_gram,
    "stochastic": kl_objective_stochastic,
    "stochastic_matfree": partial(kl_objective_stochastic,
                                  materialize_w=False),
}


# ---------------------------------------------------------------------------
# matfree CG convergence visibility
# ---------------------------------------------------------------------------

# The probe is STAGED into four small jits rather than one monolith: the
# HIGHEST-precision operator expands every conv/dot into multi-pass f32
# emulation on the MXU, and the remote chipless compile helper OOMs
# (SIGKILL) on a graph holding all five W-factor instantiations at
# M ≥ 1024 (measured, round 5 — the DEFAULT-precision monolith compiled
# fine even at M=4096). Each stage holds exactly ONE HIGHEST factor; the
# sketch rides between stages as device arrays (jit ARGUMENTS, never
# closure constants — the relay gotcha). The probe measures the operator
# the objective's ``c_solve`` actually runs (see kl_objective_stochastic's
# matfree branch — default bf16 matvecs floor the CG residual at
# ~ε·λ_max/ρ regardless of preconditioning).


def _probe_factor(state, Z, example_block=None):
    if example_block:
        wz = ops.make_w_factor_blocked(state, Z, example_block,
                                       full_set_size=None,
                                       matmul_precision="highest")
    else:
        wz = ops.make_w_factor(state, Z, full_set_size=None,
                               matmul_precision="highest")
    Mk, Kk = wz.inner_shape
    d_z = Mk * Kk

    def c_matvec(u, rho):
        gu = wz.t_matvec(wz.matvec(u.reshape(Mk, Kk))).reshape(d_z)
        return gu + rho * u

    return wz, d_z, c_matvec


@partial(jax.jit, static_argnames=("example_block",))
def _probe_lam_max(state, Z, rho, key, example_block=None):
    """Top eigenvalue of C = G + ρI, 30 power-iteration steps (GGN
    spectra are front-loaded, so this converges fast)."""
    _, d_z, c_matvec = _probe_factor(state, Z, example_block)
    v0 = jax.random.normal(jax.random.fold_in(key, 0x9E37), (d_z,))
    v = jax.lax.fori_loop(
        0, 30,
        lambda _, v: (lambda w: w / jnp.maximum(jnp.linalg.norm(w), 1e-30))(
            c_matvec(v, rho)),
        v0 / jnp.linalg.norm(v0))
    return jnp.maximum(jnp.vdot(v, c_matvec(v, rho)) - rho, 0.0)


@partial(jax.jit, static_argnames=("rank", "power", "example_block"))
def _probe_sketch(state, Z, key, rank: int, power: int, example_block=None):
    """Nyström sketch of G — the same construction the objective's
    preconditioner uses (same fold_in constant, same probe block)."""
    from laplace_inducing_points_tpu.ops.nystrom import (nystrom_sketch,
                                                         sketch_probe_block)
    wz, d_z, _ = _probe_factor(state, Z, example_block)
    blk = sketch_probe_block(wz.inner_shape[0], rank)

    def gram_mm(V):
        return wz.gram_matmat(V, block=blk)

    return nystrom_sketch(gram_mm, d_z, rank,
                          jax.random.fold_in(key, 0x4E59), power=power)


@partial(jax.jit, static_argnames=("example_block",))
def _probe_lam_seen(state, Z, U, lam, good, rho, key, example_block=None):
    """MEASURE the deflated spectrum: power-iterate the symmetric
    S = P^{-1/2} C P^{-1/2}. The sketch's λ̂_k estimates λ_{k+1} only
    under fast spectral decay; at trained-MAP Grams it can be off by 5
    orders of magnitude (sketch claimed kappa_defl=2.8 while CG stalled
    at residual 1e+1 — round-5 discovery), so the healthcheck's
    conditioning verdict comes from THIS number."""
    from laplace_inducing_points_tpu.ops.nystrom import (
        precond_inv_sqrt_from_sketch)
    _, d_z, c_matvec = _probe_factor(state, Z, example_block)
    pis = precond_inv_sqrt_from_sketch(U, lam, good, rho)
    s_matvec = lambda u: pis(c_matvec(pis(u), rho))
    w0 = jax.random.normal(jax.random.fold_in(key, 0x51F0), (d_z,))
    w = jax.lax.fori_loop(
        0, 30,
        lambda _, w: (lambda u: u / jnp.maximum(jnp.linalg.norm(u),
                                                1e-30))(s_matvec(w)),
        w0 / jnp.linalg.norm(w0))
    return jnp.maximum(jnp.vdot(w, s_matvec(w)) / jnp.vdot(w, w) - rho, 0.0)


@partial(jax.jit, static_argnames=("n_probes", "cg_tol", "use_precond",
                                   "example_block"))
def _probe_cg(state, Z, U, lam, good, rho, key, n_probes: int,
              cg_tol: float, cg_maxiter, use_precond: bool,
              example_block=None):
    """Worst relative residual of the inner CG on ``n_probes`` random
    right-hand sides (same operator, preconditioner construction, and
    budget as the objective's batched solve). ``cg_maxiter`` is a DYNAMIC
    argument (None or int): a maxiter sweep — the healthcheck's natural
    diagnostic use — reuses one compiled graph. With
    ``use_precond=False`` the sketch arguments are unused dummies.

    Batched CG, not vmap-of-cg: the vmapped while_loop over the HIGHEST
    operator OOM-SIGKILLed the remote compile helper at 4 probes x a
    block-128 factor (round 5; ops/cg.py module docstring)."""
    from laplace_inducing_points_tpu.ops import cg as cg_mod
    from laplace_inducing_points_tpu.ops.nystrom import (precond_from_sketch,
                                                         sketch_probe_block)
    wz, d_z, _ = _probe_factor(state, Z, example_block)
    precond = (precond_from_sketch(U, lam, good, rho)
               if use_precond else None)
    maxiter = (10 * d_z) if cg_maxiter is None else cg_maxiter
    b = jax.random.normal(key, (n_probes, d_z))
    cgblk = sketch_probe_block(wz.inner_shape[0], n_probes)

    def c_matmat(Xm):
        return wz.gram_matmat(Xm, block=cgblk) + rho * Xm

    X = cg_mod.cg_batched(c_matmat, b, tol=cg_tol, maxiter=maxiter,
                          precond=cg_mod.rowwise(precond) if use_precond
                          else None)
    num = jnp.linalg.norm(c_matmat(X) - b, axis=-1)
    den = jnp.maximum(jnp.linalg.norm(b, axis=-1), 1e-30)
    return jnp.max(num / den)


def matfree_cg_healthcheck(state, Z, alpha, *,
                           full_set_size: Optional[int] = None,
                           cg_tol: float = 1e-3,
                           cg_maxiter: Optional[int] = None,
                           precond_rank: Optional[int] = 64,
                           precond_power: int = 0,
                           key: Optional[jax.Array] = None,
                           n_probes: int = 4,
                           cg_example_block: Optional[int] = None,
                           warn: bool = True) -> dict:
    """CG convergence visibility for the ``stochastic_matfree`` paths.

    ``jax.scipy.sparse.linalg.cg`` exposes neither an iteration count nor
    the final residual — a maxiter exit is silent, and at GGN condition
    numbers (κ ≈ λ_max·β/α) *silent stall is the default failure mode*
    (measured: plain CG stuck at 1.25e-2 relative error, RESULTS.md).
    This probe solves the objective's inner system on random RHS with the
    exact same operator/preconditioner/budget and reports the worst
    relative residual; residual ≫ tol ⇒ the exits were maxiter exits.
    Called automatically before matfree training; also useful ad hoc.

    Besides the measured residual, the probe reports the CONDITIONING that
    explains it: ``lam_max`` (power-iterated top Gram eigenvalue), the raw
    ``kappa`` ≈ (λ_max+ρ)/ρ with ρ = α/β, the post-deflation
    ``kappa_deflated`` ≈ (λ̂_k+ρ)/ρ from the Nyström sketch's smallest
    kept eigenvalue (capped below by the preconditioner's deflation
    floor), and ``predicted_iters`` ≈ ½·√κ_defl·ln(2/tol) — the classic
    CG bound. ``predicted_iters ≫ cg_maxiter`` says the budget cannot
    converge at this (α, rank) *before* any training step is spent;
    the usable-α envelope is exactly the set where it doesn't.
    """
    M = Z.shape[0]
    N = full_set_size or M
    key = key if key is not None else jax.random.PRNGKey(0)
    rho = float(alpha) / (N / M)
    # staged probes (compile-helper-sized graphs; see the block comment
    # above _probe_factor)
    eb = cg_example_block
    lam_max = float(_probe_lam_max(state, Z, rho, key, example_block=eb))
    if precond_rank:
        U, lam, good = _probe_sketch(state, Z, key, precond_rank,
                                     precond_power, example_block=eb)
        lam_np = jnp.where(good, lam, jnp.inf)
        lam_defl = float(jnp.min(lam_np))
        if not jnp.isfinite(lam_defl):
            lam_defl = lam_max
        lam_seen = float(_probe_lam_seen(state, Z, U, lam, good, rho, key,
                                         example_block=eb))
        res = float(_probe_cg(state, Z, U, lam, good, rho, key, n_probes,
                              cg_tol, cg_maxiter, True, example_block=eb))
    else:
        lam_defl = lam_max
        lam_seen = lam_max
        dummy = jnp.zeros((1, 1)), jnp.zeros((1,)), jnp.zeros((1,), bool)
        res = float(_probe_cg(state, Z, *dummy, rho, key, n_probes,
                              cg_tol, cg_maxiter, False, example_block=eb))
    kappa = (lam_max + rho) / rho
    # Two deflated-kappa numbers. kappa_deflated_sketch trusts the
    # Nyström sketch's smallest kept eigenvalue (capped below by the
    # deflation floor) — valid ONLY under fast spectral decay, and off by
    # orders of magnitude at trained-MAP Grams. kappa_deflated is the
    # MEASURED one: lam_seen is a 30-step power iteration on the actual
    # preconditioned operator S = P^{-1/2} C P^{-1/2} (the spectrum CG
    # really sees), so the convergence verdict below cannot lie.
    lam_eff = max(lam_defl, 1e-5 * lam_max) if precond_rank else lam_max
    kappa_defl_sketch = (lam_eff + rho) / rho
    kappa_defl = (lam_seen + rho) / rho
    import math
    predicted_iters = 0.5 * math.sqrt(kappa_defl) * math.log(2.0 / cg_tol)
    # floored at the f32-attainable residual: cg_tol below round-off still
    # counts as converged when the solve bottoms out at ~1e-6
    converged = res <= max(5 * cg_tol, 1e-5)
    if warn and not converged:
        import warnings
        warnings.warn(
            f"stochastic_matfree inner CG: relative residual {res:.2e} "
            f"after the full iteration budget (cg_tol={cg_tol:g}) — CG is "
            f"exiting on maxiter, not tolerance. Conditioning: "
            f"lam_max={lam_max:.3g}, kappa={kappa:.3g}, measured "
            f"kappa_deflated={kappa_defl:.3g} (rank {precond_rank}; the "
            f"sketch claims {kappa_defl_sketch:.3g} — trust the measured "
            f"one); the CG bound needs ~{predicted_iters:.0f} iterations "
            f"at this kappa vs the {cg_maxiter or 'default'} budgeted. "
            f"The KL trace term is biased by O(residual); raise "
            f"precond_rank, raise cg_maxiter, or move alpha_ip up the "
            f"usable envelope (kappa scales as 1/alpha).", stacklevel=2)
    return {"cg_rel_residual": res, "converged": converged,
            "cg_tol": cg_tol, "precond_rank": precond_rank,
            "precond_power": precond_power,
            "lam_max": lam_max, "kappa": kappa,
            "lam_seen": lam_seen,
            "kappa_deflated": kappa_defl,
            "kappa_deflated_sketch": kappa_defl_sketch,
            "predicted_iters": predicted_iters}


# ---------------------------------------------------------------------------
# chunk-compiled gram gradient (compile-budget-bounded at large M·D)
# ---------------------------------------------------------------------------
#
# The monolithic ``optimize_step`` differentiates through the full (d_z × D)
# row build in ONE XLA program; at ResNet scale (D=1.08M, M=50) that grad
# graph exceeds the remote-compile budget of the tunneled TPU toolchain
# (observed HTTP 500s; reference never hits this because it never ran a
# single-graph Z-gradient at this scale). The chunked path hand-chains the
# chain rule  dL/dZ = R'(Z)ᵀ · ∂L/∂R  through three SMALL compiled units:
#
#   1. rows:      R chunks    (forward row build, one compile per chunk shape)
#   2. algebra:   value_and_grad of the KL w.r.t. the row matrix (d_z-sized)
#   3. pullback:  per-chunk VJP of the row build applied to ∂L/∂R_chunk
#
# Exact to f32 roundoff vs the monolithic gradient (tested), with compiled-
# unit size independent of M.

@jax.jit
def _rows_chunk(state, z_chunk):
    return ops.dense_wt(state, z_chunk)


@jax.jit
def _rows_chunk_vjp(state, z_chunk, ct_chunk):
    _, vjp = jax.vjp(lambda z: ops.dense_wt(state, z), z_chunk)
    return vjp(ct_chunk)[0]


def _build_rows_chunked(state, pts, chunk):
    M = pts.shape[0]
    chunk = min(chunk, M)
    parts = []
    for s in range(0, M, chunk):
        zc = pts[s:s + chunk]
        n = zc.shape[0]
        if n < chunk:                       # pad to the jitted chunk shape
            zc = jnp.concatenate([zc, pts[:chunk - n]])
        rows = _rows_chunk(state, zc)       # (chunk·K_out, D)
        k_out = rows.shape[0] // chunk
        parts.append(rows[:n * k_out])
    return jnp.concatenate(parts)


@partial(jax.jit, static_argnames=("include_constants",))
def _kl_rows_value_and_ct(Rz, Rx, alpha, beta, gamma,
                          include_constants: bool = True):
    D = Rz.shape[1]

    def f(rz):
        Gzz = syrk(rz)
        Gxz = ops.pdot(Rx, rz.T)
        tr_Gxx = jnp.sum(Rx * Rx)
        return _kl_core(Gzz, Gxz, tr_Gxx, D, alpha, beta, gamma,
                        include_constants)

    return jax.value_and_grad(f)(Rz)


def kl_grad_gram_chunked(Z, X, state, alpha, *,
                         full_set_size: Optional[int] = None,
                         chunk: int = 4, include_constants: bool = True):
    """(loss, dL/dZ) of the gram KL with chunk-bounded compiled units."""
    M, Kb = Z.shape[0], X.shape[0]
    N = full_set_size or M
    beta, gamma = N / M, N / Kb
    Rz = _build_rows_chunked(state, Z, chunk)
    Rx = _build_rows_chunked(state, X, chunk)
    loss, ct = _kl_rows_value_and_ct(Rz, Rx, alpha, beta, gamma,
                                     include_constants)

    k_out = Rz.shape[0] // M
    D = Rz.shape[1]
    ct3 = ct.reshape(M, k_out, D)
    chunk = min(chunk, M)
    grads = []
    for s in range(0, M, chunk):
        zc = Z[s:s + chunk]
        cc = ct3[s:s + chunk]
        n = zc.shape[0]
        if n < chunk:
            zc = jnp.concatenate([zc, Z[:chunk - n]])
            cc = jnp.concatenate(
                [cc, jnp.zeros((chunk - n,) + cc.shape[1:], cc.dtype)])
        g = _rows_chunk_vjp(state, zc, cc.reshape(chunk * k_out, D))
        grads.append(g[:n])
    return loss, jnp.concatenate(grads)


def optimize_step_chunked(Z, X, state, alpha, opt_state, key=None, *,
                          optimizer: optax.GradientTransformation,
                          full_set_size: Optional[int] = None,
                          example_block: Optional[int] = None):
    """Chunk-compiled analog of :func:`optimize_step` (gram objective only).

    ``example_block`` doubles as the chunk size (default 4). The optimizer
    update runs eagerly — negligible next to the row builds it follows.
    """
    chunk = example_block or 4
    loss, grads = kl_grad_gram_chunked(Z, X, state, alpha,
                                       full_set_size=full_set_size,
                                       chunk=chunk)
    updates, new_opt_state = optimizer.update(grads, opt_state, Z)
    new_Z = optax.apply_updates(Z, updates)
    return new_Z, new_opt_state, loss


# ---------------------------------------------------------------------------
# optimization
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("objective", "optimizer", "full_set_size",
                                   "st_samples", "slq_samples",
                                   "slq_num_matvecs", "example_block",
                                   "cg_tol", "cg_maxiter", "precond_rank",
                                   "precond_power", "cg_example_block"))
def optimize_step(Z, X, state, alpha, opt_state, key, *,
                  objective: str = "gram",
                  optimizer: optax.GradientTransformation,
                  full_set_size: Optional[int] = None,
                  st_samples: int = 256, slq_samples: int = 2,
                  slq_num_matvecs: Optional[int] = None,
                  example_block: Optional[int] = None,
                  cg_tol: float = 1e-3,
                  cg_maxiter: Optional[int] = None,
                  precond_rank: Optional[int] = 64,
                  precond_power: int = 0,
                  precond_sketch=None,
                  cg_example_block: Optional[int] = None):
    """One jitted gradient step on Z (parity: ``optimize_step``,
    ``/root/reference/src/train_inducing.py:199-232``).

    ``precond_sketch``: optional staged Nyström sketch ``(U, lam, good)``
    for the matfree objective — device arrays from :func:`_probe_sketch`,
    traced as jit ARGUMENTS so the grad graph never holds the sketch's
    HIGHEST-precision matmat stack (compile-helper OOM otherwise)."""
    kwargs = dict(full_set_size=full_set_size)
    if objective == "gram":
        kwargs.update(example_block=example_block)
    if objective.startswith("stochastic"):
        kwargs.update(st_samples=st_samples, slq_samples=slq_samples,
                      slq_num_matvecs=slq_num_matvecs)
    if objective == "stochastic_matfree":
        kwargs.update(cg_tol=cg_tol, cg_maxiter=cg_maxiter,
                      precond_rank=precond_rank,
                      precond_power=precond_power,
                      precond_sketch=precond_sketch,
                      cg_example_block=cg_example_block)
    loss, grads = jax.value_and_grad(OBJECTIVES[objective])(
        Z, X, state, alpha, key, **kwargs)
    updates, new_opt_state = optimizer.update(grads, opt_state, Z)
    new_Z = optax.apply_updates(Z, updates)
    return new_Z, new_opt_state, loss


@partial(jax.jit, static_argnames=("full_set_size",))
def full_set_kl(Z, X_full, state, alpha, full_set_size: Optional[int] = None):
    """Exact gram KL of a candidate Z against the FULL training set — the
    restart-selection criterion (cheap: toy sets are ≤10³ points, and the
    gram objective is d-bounded). Deterministic: no estimator noise, so
    candidate ranking is stable."""
    return kl_objective_gram(Z, X_full, state, alpha,
                             full_set_size=full_set_size)


def train_inducing_points_restarts(state, z_init: jnp.ndarray,
                                   optimizer: optax.GradientTransformation,
                                   batches: Iterable, *, alpha,
                                   num_steps: int,
                                   selection_X: jnp.ndarray,
                                   candidate_pool: Optional[jnp.ndarray] = None,
                                   n_restarts: int = 4,
                                   full_set_size: Optional[int] = None,
                                   rng: Optional[jax.Array] = None,
                                   verbose: bool = True,
                                   **train_kwargs):
    """k-restart Z training selected by full-set KL (round 4).

    The inducing KL objective's Z landscape is multi-modal: end-to-end toy
    reruns scattered 76–83% OOD AUROC seed-to-seed, and the round-3
    diagnosis (RESULTS.md "Banana round 3") showed the variance comes from
    the seed-to-seed Z optimum, not minibatch noise. The mechanism that
    diagnosis points at: run ``n_restarts`` independent optimizations from
    different inits (restart 0 keeps the caller's ``z_init`` — the
    reference-faithful first-M-points — and restarts r≥1 draw M random
    points from ``candidate_pool``/``selection_X``), then keep the
    candidate with the LOWEST exact full-set gram KL (:func:`full_set_kl`
    — deterministic, so selection adds no variance of its own). The
    reference has no analog (single run, ``/root/reference/src/
    train_inducing.py:235``); cost is ``n_restarts ×`` the training time,
    at toy scale seconds.

    Returns ``(Z_best, kl_best, kls)`` with ``kls`` the per-restart KL
    list (restart order).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    pool = candidate_pool if candidate_pool is not None else selection_X
    m = z_init.shape[0]
    best_Z, best_kl, kls = None, None, []
    for r in range(n_restarts):
        r_rng = jax.random.fold_in(rng, r)
        if r == 0:
            z0 = z_init
        else:
            idx = jax.random.choice(jax.random.fold_in(r_rng, 1),
                                    pool.shape[0], shape=(m,),
                                    replace=pool.shape[0] < m)
            z0 = jnp.asarray(pool)[idx]
        Z = train_inducing_points(
            state, z0, optimizer, batches, alpha=alpha,
            num_steps=num_steps, full_set_size=full_set_size,
            rng=r_rng, verbose=verbose and n_restarts == 1,
            **train_kwargs)
        kl = float(full_set_kl(Z, jnp.asarray(selection_X), state,
                               float(alpha), full_set_size))
        kls.append(kl)
        if verbose:
            print(f"[inducing restart {r}/{n_restarts}] "
                  f"full-set KL = {kl:.4f}")
        if best_kl is None or kl < best_kl:
            best_Z, best_kl = Z, kl
    if verbose:
        print(f"[inducing restarts] selected KL {best_kl:.4f} "
              f"(spread {min(kls):.4f}..{max(kls):.4f})")
    return best_Z, best_kl, kls


def train_inducing_points(state, z_init: jnp.ndarray,
                          optimizer: optax.GradientTransformation,
                          batches: Iterable, *, alpha, num_steps: int,
                          full_set_size: Optional[int] = None,
                          objective: str = "gram", rng: Optional[jax.Array] = None,
                          st_samples: int = 256, slq_samples: int = 2,
                          slq_num_matvecs: Optional[int] = None,
                          example_block: Optional[int] = None,
                          cg_tol: float = 1e-3,
                          cg_maxiter: Optional[int] = None,
                          precond_rank: Optional[int] = 64,
                          precond_power: int = 0,
                          cg_example_block: Optional[int] = None,
                          callback: Optional[Callable] = None,
                          checkpoint_dir: Optional[str] = None,
                          checkpoint_name: str = "ind",
                          checkpoint_every: int = 100,
                          verbose: bool = True) -> jnp.ndarray:
    """Optimize Z against minibatches (parity: ``train_inducing_points``,
    ``/root/reference/src/train_inducing.py:235-324``; the reference's
    inline matplotlib live-plotting is a ``callback`` hook here).
    """
    Z = z_init
    opt_state = optimizer.init(Z)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if objective == "stochastic_matfree":
        # CG convergence visibility BEFORE spending steps: a silent maxiter
        # stall biases every trace term (see matfree_cg_healthcheck)
        rng, hk = jax.random.split(rng)
        hc = matfree_cg_healthcheck(
            state, Z, alpha, full_set_size=full_set_size, cg_tol=cg_tol,
            cg_maxiter=cg_maxiter, precond_rank=precond_rank,
            precond_power=precond_power, key=hk,
            cg_example_block=cg_example_block)
        if verbose:
            print(f"[inducing] matfree CG healthcheck: rel residual "
                  f"{hc['cg_rel_residual']:.2e} "
                  f"({'converged' if hc['converged'] else 'MAXITER STALL'}, "
                  f"tol={cg_tol:g}, precond_rank={precond_rank}, "
                  f"kappa={hc['kappa']:.3g}, "
                  f"kappa_deflated={hc['kappa_deflated']:.3g}, "
                  f"~{hc['predicted_iters']:.0f} iters needed)")
    it = iter(batches)
    last_finite_Z = Z           # divergence guard: never return/save NaN Z
    for step in range(num_steps):
        x_batch, _ = next(it)
        rng, sub = jax.random.split(rng)
        if objective == "gram_chunked":
            Z, opt_state, loss = optimize_step_chunked(
                Z, x_batch, state, alpha, opt_state, sub,
                optimizer=optimizer, full_set_size=full_set_size,
                example_block=example_block)
        else:
            sketch = None
            if objective == "stochastic_matfree" and precond_rank:
                # Fresh per-step sketch, built OUTSIDE the grad graph (its
                # own small jit) and handed in as device arrays — same
                # key-stream (the objective's 0x4E59 fold of this step's
                # sub-key), so the staged path is bit-comparable to the
                # monolithic one; see optimize_step's precond_sketch note.
                sketch = _probe_sketch(state, Z, sub, precond_rank,
                                       precond_power,
                                       example_block=cg_example_block)
            Z, opt_state, loss = optimize_step(
                Z, x_batch, state, alpha, opt_state, sub,
                objective=objective, optimizer=optimizer,
                full_set_size=full_set_size, st_samples=st_samples,
                slq_samples=slq_samples, slq_num_matvecs=slq_num_matvecs,
                example_block=example_block, cg_tol=cg_tol,
                cg_maxiter=cg_maxiter, precond_rank=precond_rank,
                precond_power=precond_power, precond_sketch=sketch,
                cg_example_block=cg_example_block)
        check = step % 10 == 0 or step == num_steps - 1
        if check or callback is not None:
            loss_f = float(loss)
            if not (jnp.isfinite(loss_f)
                    and bool(jnp.all(jnp.isfinite(Z)))):
                print(f"[inducing {step:4d}] DIVERGED (loss={loss_f}); "
                      "stopping and keeping the last finite Z — try a "
                      "smaller lr or alpha")
                return last_finite_Z
            last_finite_Z = Z
            if verbose and check:
                print(f"[inducing {step:4d}] loss={loss_f:.4f}")
            if callback is not None:
                callback(step, Z, loss_f)
        if checkpoint_dir and (step + 1) % checkpoint_every == 0 \
                and step + 1 < num_steps:
            from laplace_inducing_points_tpu.utils.checkpoint import save_array
            save_array(Z, checkpoint_dir, checkpoint_name, step + 1)
    return Z
