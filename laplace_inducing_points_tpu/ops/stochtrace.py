"""AD-differentiable stochastic trace estimators.

Parity: ``/root/reference/src/stochtrace.py`` (Girard-Hutchinson, Hutch++,
NA-Hutch++, trace-of-inverse via CG). TPU-first differences:

* operators expose a **batched** ``matmat: (P, D) -> (P, D)`` (probe axis is
  vmapped/sharded), so one estimator call is a single fused XLA computation;
* probes are drawn once and passed explicitly (common-random-numbers across
  the trace and log-det terms of the KL objective, as the reference does at
  ``/root/reference/src/train_inducing.py:137-142``);
* everything differentiates w.r.t. the operator's parameters — gradients of
  the inducing-point objective flow through QR and the probe sweeps, with
  ``jax.remat`` on the operator applications to bound memory (reference:
  ``/root/reference/src/stochtrace.py:127-132``).

All estimators take ``matmat`` acting on row-stacked probes ``(P, D)``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

MatMat = Callable[[jnp.ndarray], jnp.ndarray]


def rademacher_probes(key: jax.Array, num: int, dim: int,
                      dtype=jnp.float32) -> jnp.ndarray:
    """(num, dim) iid ±1 probes."""
    return jax.random.rademacher(key, (num, dim), dtype=dtype)


def normal_probes(key: jax.Array, num: int, dim: int,
                  dtype=jnp.float32) -> jnp.ndarray:
    return jax.random.normal(key, (num, dim), dtype=dtype)


def hutchinson(matmat: MatMat, probes: jnp.ndarray) -> jnp.ndarray:
    """Girard–Hutchinson: ``mean_p  pᵀ A p``.

    Parity: ``stochastic_trace_estimator_mvp``
    (``/root/reference/src/stochtrace.py:22-34``).
    """
    ap = matmat(probes)
    return jnp.mean(jnp.sum(probes * ap, axis=-1))


def hutchpp(matmat: MatMat, probes: jnp.ndarray, *,
            s1: Optional[int] = None, s2: Optional[int] = None,
            remat: bool = True) -> jnp.ndarray:
    """Hutch++ trace estimator (Meyer et al., arXiv:2010.09649).

    ``tr(A) ≈ tr(Qᵀ A Q) + (1/s2) tr(G⊥ᵀ A G⊥)`` with ``Q`` an orthonormal
    basis of ``A S`` and ``G⊥`` probes deflated against ``Q``.

    Parity: ``hutchpp_v2`` (``/root/reference/src/stochtrace.py:118-135``):
    same split semantics (first ``s1`` probes feed the QR range-finder, the
    remaining ``s2`` estimate the residual), same remat placement. Exact when
    ``s1 >= rank(A)``.
    """
    total = probes.shape[0]
    if s1 is None:
        s1 = total // 2
    if s2 is None:
        s2 = total - s1
    if s1 > probes.shape[1]:
        # QR differentiation requires tall factors; a wider range-finder is
        # pointless anyway (s1 >= D already captures A exactly)
        s1 = probes.shape[1]
    S, G = probes[:s1], probes[s1:s1 + s2]

    ap = matmat if not remat else jax.remat(matmat)

    Y = ap(S).T                                    # (D, s1)
    Q, _ = jnp.linalg.qr(Y, mode="reduced")        # (D, s1)

    AQ = ap(Q.T)                                   # (s1, D) rows = A q_i
    low_rank = jnp.sum(AQ.T * Q)                   # tr(Qᵀ A Q)

    G_perp = G - jnp.matmul(jnp.matmul(G, Q), Q.T,
                            precision=jax.lax.Precision.HIGHEST)
    AG = ap(G_perp)
    resid = jnp.sum(G_perp * AG) / s2
    return low_rank + resid


def na_hutchpp(matmat: MatMat, probes: jnp.ndarray) -> jnp.ndarray:
    """Non-adaptive Hutch++ (single-pass variant).

    Parity: ``na_hutchpp_mvp`` (``/root/reference/src/stochtrace.py:166-180``)
    with the paper's (c1,c2,c3)=(1/4,1/2,1/4) probe split.
    """
    total = probes.shape[0]
    n1 = total // 4
    n2 = total // 2
    S = probes[:n1]
    R = probes[n1:n1 + n2]
    G = probes[n1 + n2:]
    n3 = G.shape[0]

    W = matmat(S).T                                # (D, n1) = A Sᵀ
    Z = matmat(R).T                                # (D, n2) = A Rᵀ
    pinv_SZ = jnp.linalg.pinv(S @ Z)               # (n2, n1)... (n1 x n2)^+
    t1 = jnp.trace(pinv_SZ @ (W.T @ Z))
    AG = matmat(G)                                 # (n3, D)
    t2 = jnp.trace(G @ AG.T)
    t3 = jnp.trace(G @ Z @ pinv_SZ @ W.T @ G.T)
    return t1 + (t2 - t3) / n3


def trace_of_inverse(matmat: MatMat, probes: jnp.ndarray, *,
                     cg_tol: float = 1e-6, cg_maxiter: Optional[int] = None,
                     estimator: str = "hutchpp") -> jnp.ndarray:
    """``tr(A⁻¹)`` by composing an estimator with batched CG solves.

    Parity: ``hutchpp_inv_mvp``/``na_hutchpp_inv_mvp``
    (``/root/reference/src/stochtrace.py:138-149,183-195``).

    Precision contract (round 5): ``matmat`` is the OPERATOR of the inner
    CG, so on TPU it must be full-f32 accurate — a bf16-pass matvec floors
    the CG residual at ~ε·λ_max/λ_min no matter the tolerance
    (docs/DESIGN.md §5c). Build W-factor operators for this function with
    ``matmul_precision="highest"`` (blocked via ``make_w_factor_blocked``
    when the monolithic graph exceeds the remote compile budget); the
    estimator's own probe sweep OUTSIDE the solve may stay at default.
    """
    def inv_matmat(V):
        # batched CG (ops/cg.py): one while_loop with the probes as loop
        # state — vmap-of-cg over a conv-backed operator OOMs the remote
        # compile helper (round 5), and ``matmat`` is batched already
        from laplace_inducing_points_tpu.ops.cg import cg_batched
        return cg_batched(matmat, V, tol=cg_tol, maxiter=cg_maxiter)

    if estimator == "hutchpp":
        return hutchpp(inv_matmat, probes)
    if estimator == "hutchinson":
        return hutchinson(inv_matmat, probes)
    if estimator == "na_hutchpp":
        return na_hutchpp(inv_matmat, probes)
    raise ValueError(f"unknown estimator: {estimator}")
