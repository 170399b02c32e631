"""Batched conjugate gradients: many RHS, ONE ``while_loop``.

Why this exists (round 5). The matfree paths need ``P`` independent CG
solves against the same PSD operator (Hutch++ probes, Matheron draws,
healthcheck probes). The obvious formulation — ``jax.vmap`` of
``jax.scipy.sparse.linalg.cg`` — batch-lifts a ``while_loop`` whose body
holds the HIGHEST-precision blocked W-factor, and the remote chipless
compile helper OOM-SIGKILLs on that combination even at 4 probes × a
block-128 operator, while the SAME operator compiles fine inside a plain
``fori_loop`` and under a probe-chunked ``vmap`` sweep with no loop
(measured; docs/DESIGN.md §5c). Stacking the RHS into the loop *state*
instead removes the vmap-of-while shape entirely: one ``while_loop``, all
per-row scalars vectorized, the operator applied as a matmat — which also
lets the blocked factor's ``gram_matmat`` chunk the probe axis internally
and keeps every row's iteration count at ITS tolerance exit rather than
the batch's worst (rows that converge are frozen by masking).

Mathematically each row runs the textbook Hestenes–Stiefel recurrence;
``cg_batched`` wraps the iteration in ``lax.custom_linear_solve``
(symmetric), so Z-gradients flow by implicit differentiation exactly as
through ``jax.scipy.sparse.linalg.cg`` — the transpose solve reuses the
same PSD operator.

Reference anchor: the reference's only CG lives inside matfree's
``cg_fixed_step`` consumed by its trace-of-inverse estimators
(``/root/reference/src/stochtrace.py:138-149``) — single-RHS, fixed step
count, no convergence signal. This module is the batched, maskable,
implicit-diff replacement the TPU compile model demands.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _cg_core(matmat: Callable[[jnp.ndarray], jnp.ndarray],
             B: jnp.ndarray, *, tol: float, maxiter,
             precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
             ) -> jnp.ndarray:
    """Run the masked batched CG iteration. ``B``: ``(P, d)`` stacked RHS;
    ``matmat``: rowwise PSD operator ``(P, d) -> (P, d)``; ``precond``:
    rowwise approximate inverse (applied to the full residual matrix).
    ``maxiter`` may be a traced scalar (one compiled graph serves an
    iteration-budget sweep)."""
    P, d = B.shape
    atol2 = (tol ** 2) * jnp.sum(B * B, axis=1)              # (P,)
    prec = precond if precond is not None else (lambda r: r)

    X0 = jnp.zeros_like(B)
    R0 = B
    Z0 = prec(R0)
    rz0 = jnp.sum(R0 * Z0, axis=1)

    def cond(state):
        _X, R, _Pd, _rz, k = state
        return (k < maxiter) & jnp.any(jnp.sum(R * R, axis=1) > atol2)

    def body(state):
        X, R, Pd, rz, k = state
        active = jnp.sum(R * R, axis=1) > atol2              # (P,)
        Q = matmat(Pd)                                       # (P, d)
        pq = jnp.sum(Pd * Q, axis=1)
        # frozen/degenerate rows step by 0 — their X, R stay fixed
        alpha = jnp.where(active & (pq > 0.0), rz / jnp.where(pq > 0.0, pq, 1.0), 0.0)
        X = X + alpha[:, None] * Pd
        R = R - alpha[:, None] * Q
        Zn = prec(R)
        rz_n = jnp.sum(R * Zn, axis=1)
        beta = jnp.where(rz > 0.0, rz_n / jnp.where(rz > 0.0, rz, 1.0), 0.0)
        Pd = Zn + beta[:, None] * Pd
        return X, R, Pd, rz_n, k + 1

    X, *_ = jax.lax.while_loop(cond, body, (X0, R0, Z0, rz0,
                                            jnp.zeros((), jnp.int32)))
    return X


def cg_batched(matmat: Callable[[jnp.ndarray], jnp.ndarray],
               B: jnp.ndarray, *, tol: float = 1e-5, maxiter=None,
               precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
               ) -> jnp.ndarray:
    """Solve ``A x_i = b_i`` for every row of ``B`` with one while_loop.

    ``matmat`` must be LINEAR in its ``(P, d)`` argument and act rowwise
    by the same symmetric PSD ``A`` (then it is symmetric w.r.t. the
    Frobenius inner product, so ``symmetric=True`` implicit
    differentiation is exact). ``precond`` steers convergence only — it is
    applied inside the iteration, never differentiated (wrap sketch-built
    preconditioners in ``stop_gradient`` as ``ops.nystrom`` already does).
    ``maxiter=None`` defaults to ``10·d``; a traced ``maxiter`` is allowed.
    """
    if maxiter is None:
        maxiter = 10 * B.shape[-1]

    def solve(mm, b):
        return _cg_core(mm, b, tol=tol, maxiter=maxiter, precond=precond)

    return jax.lax.custom_linear_solve(matmat, B, solve=solve,
                                       symmetric=True)


def rowwise(precond_vec: Callable[[jnp.ndarray], jnp.ndarray]
            ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Lift a ``(d,) -> (d,)`` preconditioner to ``(P, d)`` rows. The
    Nyström preconditioner is small dense algebra (no convs), so a vmap
    here is compile-safe."""
    return jax.vmap(precond_vec)
