"""Stochastic Lanczos quadrature log-determinant estimators.

Parity: the SLQ log-det terms of the inducing-point KL objective
(``/root/reference/src/train_inducing.py:148-171``), built on the in-house
Krylov layer instead of ``matfree``. Probes are vmapped (the reference runs
``jax.lax.map`` serially over probes); each probe's quadrature is a small
dense eigendecomposition on chip.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from laplace_inducing_points_tpu.ops import lanczos as lz


def slq_logdet_sym(matvec: Callable[[jnp.ndarray], jnp.ndarray],
                   probes: jnp.ndarray, num_matvecs: int,
                   clip_min: Optional[float] = None,
                   remat: bool = True) -> jnp.ndarray:
    """``logdet(A)`` for PSD ``A`` via symmetric-Lanczos SLQ.

    Per probe ``v``: ``vᵀ log(A) v ≈ ‖v‖² · e₁ᵀ log(T_k) e₁``; the estimate
    averages probes. ``clip_min=1.0`` reproduces the reference's clipped
    tridiagonal formulation (``/root/reference/src/matfree_monkeypatch.py``).
    """
    def single(v):
        tri = lz.lanczos_sym(matvec, v, num_matvecs)
        T = lz.tridiag_dense(tri.alphas, tri.betas)
        # graded jitter: see slq_logdet_product — eigh VJP NaNs on exactly
        # repeated eigenvalues at Krylov breakdown
        k = T.shape[0]
        grade = 1e-5 * jnp.arange(1, k + 1, dtype=T.dtype)
        T = T + jnp.diag(grade * (jnp.abs(jnp.diag(T)) + 1e-12))
        logT = lz.funm_sym_dense(jnp.log, T, clip_min=clip_min)
        return jnp.sum(v * v) * logT[0, 0]

    if remat:
        single = jax.remat(single)
    return jnp.mean(jax.vmap(single)(probes))


def slq_logdet_product(matvec: Callable[[jnp.ndarray], jnp.ndarray],
                       probes: jnp.ndarray, num_matvecs: int,
                       t_matvec: Optional[Callable] = None,
                       remat: bool = True,
                       remat_body: bool = False) -> jnp.ndarray:
    """``logdet(GᵀG)`` via Golub–Kahan bidiagonalization SLQ.

    Per probe: ``vᵀ log(GᵀG) v ≈ ‖v‖² · e₁ᵀ log(B̃ᵀB̃) e₁`` with the small
    ``log`` evaluated through the SVD of the bidiagonal ``B`` (singular
    values squared) — numerically sturdier than forming ``BᵀB``.

    Parity: ``funm.integrand_funm_product_logdet`` over ``decomp.bidiag``
    (``/root/reference/src/train_inducing.py:155-160``).
    """
    def single(v):
        bi = lz.golub_kahan_bidiag(matvec, v, num_matvecs, t_matvec=t_matvec,
                                   remat_body=remat_body)
        B = lz.bidiag_dense(bi.alphas, bi.betas)
        # Graded diagonal jitter breaks exact singular-value degeneracy.
        # When num_matvecs exceeds the Krylov rank (common: rank(Gzz) ≤
        # M(K−1) for CE factors), breakdown clusters σ at √α exactly and
        # the SVD VJP's 1/(σᵢ²−σⱼ²) terms produce NaN gradients — this
        # poisoned inducing training within a few steps before the guard.
        k = B.shape[0]
        grade = 1e-5 * jnp.arange(1, k + 1, dtype=B.dtype)
        B = B + jnp.diag(grade * (jnp.diag(B) + 1e-12))
        _, svals, vt = jnp.linalg.svd(B)
        # e₁ᵀ V log(Σ²) Vᵀ e₁  — weights are the first row of V = vtᵀ.
        w1 = vt[:, 0]
        quad = jnp.sum(w1 * w1 * 2.0 * jnp.log(svals + 1e-30))
        return jnp.sum(v * v) * quad

    if remat:
        single = jax.remat(single)
    return jnp.mean(jax.vmap(single)(probes))
