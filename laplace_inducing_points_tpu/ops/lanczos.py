"""Krylov decompositions and Lanczos matrix functions — in-house, jit-native.

Replaces the reference's external ``matfree`` dependency
(``/root/reference/src/train_inducing.py:12-13``, ``src/sample.py:6-7``) and
its monkeypatched eigenvalue clip (``/root/reference/src/matfree_monkeypatch.py``)
with ``lax.scan``-based implementations:

* fixed iteration counts (static shapes — XLA unrolls/fuses; no dynamic
  Python loops),
* full reorthogonalization against the stored Krylov basis (one batched
  matvec per step on the MXU rather than a rolling two-term recurrence —
  sturdier in f32, which TPU-first code must survive without x64 islands),
* differentiable end-to-end (the inducing-point objective backprops through
  these recurrences).

The eigenvalue clip the reference applies globally at 1.0 is exposed as an
explicit ``clip_min`` argument.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

MatVec = Callable[[jnp.ndarray], jnp.ndarray]

_EPS = 1e-30


def _safe_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Norm with a finite gradient at 0.

    Krylov recurrences hit exact breakdown (residual -> 0) when the space is
    exhausted; ``d‖z‖/dz = z/‖z‖`` is 0/0 there and poisons the whole
    backward pass with NaNs. The tiny floor only matters at breakdown, where
    the quadrature weight of the direction is zero anyway.
    """
    return jnp.sqrt(jnp.sum(x * x) + _EPS)


class Tridiag(NamedTuple):
    alphas: jnp.ndarray   # (k,)  diagonal
    betas: jnp.ndarray    # (k-1,) off-diagonal
    basis: jnp.ndarray    # (k, D) Lanczos vectors (rows)


def lanczos_sym(matvec: MatVec, v0: jnp.ndarray, num_matvecs: int,
                reorthogonalize: bool = True) -> Tridiag:
    """Symmetric Lanczos tridiagonalization with optional full reorth.

    Returns ``T = tridiag(alphas, betas)`` and the orthonormal basis ``V``
    such that ``Vᵀ A V ≈ T`` on the Krylov space of ``(A, v0)``.
    """
    d = v0.shape[0]
    k = num_matvecs
    q0 = v0 / _safe_norm(v0)

    def body(carry, idx):
        V, q, q_prev, beta_prev = carry
        w = matvec(q)
        alpha = jnp.dot(w, q)
        w = w - alpha * q - beta_prev * q_prev
        if reorthogonalize:
            # project out all previously stored vectors (rows beyond the
            # current iteration are zero, so the extra terms are no-ops)
            w = w - V.T @ (V @ w)
            w = w - V.T @ (V @ w)   # twice is enough (Parlett)
        beta = _safe_norm(w)
        q_next = w / (beta + _EPS)
        V = V.at[idx].set(q)
        return (V, q_next, q, beta), (alpha, beta)

    V0 = jnp.zeros((k, d), v0.dtype)
    (V, *_), (alphas, betas) = jax.lax.scan(
        body, (V0, q0, jnp.zeros_like(q0), jnp.asarray(0.0, v0.dtype)),
        jnp.arange(k))
    return Tridiag(alphas=alphas, betas=betas[:-1], basis=V)


def tridiag_dense(alphas: jnp.ndarray, betas: jnp.ndarray) -> jnp.ndarray:
    k = alphas.shape[0]
    T = jnp.diag(alphas)
    if k > 1:
        T = T + jnp.diag(betas, 1) + jnp.diag(betas, -1)
    return T


def funm_sym_dense(matfun: Callable[[jnp.ndarray], jnp.ndarray],
                   A: jnp.ndarray,
                   clip_min: Optional[float] = None) -> jnp.ndarray:
    """``f(A)`` for small dense symmetric ``A`` via eigh.

    ``clip_min`` reproduces the reference's stability hack of clipping
    eigenvalues before applying ``f``
    (``/root/reference/src/matfree_monkeypatch.py:17-22`` clips at 1.0 so
    ``log -> 0`` and ``1/sqrt -> 1`` on the clipped subspace).
    """
    evals, evecs = jnp.linalg.eigh(A)
    if clip_min is not None:
        evals = jnp.clip(evals, min=clip_min)
    return (evecs * matfun(evals)) @ evecs.T


def funm_lanczos_sym(matfun: Callable[[jnp.ndarray], jnp.ndarray],
                     matvec: MatVec, v: jnp.ndarray, num_matvecs: int,
                     clip_min: Optional[float] = None) -> jnp.ndarray:
    """``f(A) v`` via Lanczos: ``‖v‖ · V_kᵀ f(T_k) e₁``.

    Parity: ``matfree.funm.funm_lanczos_sym`` as used by the sampler
    (``/root/reference/src/sample.py:106-128``).
    """
    tri = lanczos_sym(matvec, v, num_matvecs)
    T = tridiag_dense(tri.alphas, tri.betas)
    fT = funm_sym_dense(matfun, T, clip_min=clip_min)
    coeffs = fT[:, 0] * jnp.linalg.norm(v)          # f(T) e1 scaled
    return tri.basis.T @ coeffs


class Bidiag(NamedTuple):
    alphas: jnp.ndarray    # (k,)   B diagonal
    betas: jnp.ndarray     # (k-1,) B sub/super-diagonal
    right: jnp.ndarray     # (k, D) right Golub-Kahan vectors


def golub_kahan_bidiag(matvec: Callable[[jnp.ndarray], jnp.ndarray],
                       v0: jnp.ndarray, num_matvecs: int,
                       t_matvec: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
                       reorthogonalize: bool = True,
                       remat_body: bool = False) -> Bidiag:
    """Golub–Kahan bidiagonalization of a rectangular operator ``G``.

    Produces upper-bidiagonal ``B`` with ``GᵀG ≈ V B̃ᵀB̃ Vᵀ`` on the Krylov
    space of ``(GᵀG, v0)``. The adjoint is derived with
    ``jax.linear_transpose`` when not supplied — ``G`` must be linear.

    ``remat_body``: checkpoint each scan iteration, so the backward pass
    recomputes the matvec/t_matvec internals instead of storing them.
    Under reverse-mode AD the scan otherwise keeps EVERY iteration's
    operator tangents live — for a batched-model ``W`` factor that is
    ``num_matvecs × M`` examples' activations (measured 5.25 GiB at
    M=4096 LeNet5 / 64 matvecs, the allocation that pushed the round-4
    preconditioned objective grad 0.5 GiB over the v5e's 15.75 GiB HBM).
    Values and gradients are bit-identical; backward recomputes one extra
    matvec pair per iteration. The per-step carry saves (the ``(k, d)``
    reorthogonalization basis) remain — inherent to differentiating
    full-reorth Krylov by unrolled scan.

    Parity: ``matfree.decomp.bidiag`` as used for the SLQ log-det
    (``/root/reference/src/train_inducing.py:155-171``).
    """
    d = v0.shape[0]
    k = num_matvecs

    if t_matvec is None:
        t_fn = jax.linear_transpose(matvec, v0)
        t_matvec = lambda u: t_fn(u)[0]

    def reorth(V, w):
        w = w - V.T @ (V @ w)
        return w - V.T @ (V @ w)

    v_init = v0 / _safe_norm(v0)
    u_probe = matvec(v_init)

    def body(carry, idx):
        V, v, u_prev, beta_prev = carry
        # u_i alpha_i = G v_i - beta_{i-1} u_{i-1}
        w = matvec(v) - beta_prev * u_prev
        alpha = _safe_norm(w)
        u = w / (alpha + _EPS)
        # v_{i+1} beta_i = Gᵀ u_i - alpha_i v_i
        z = t_matvec(u) - alpha * v
        if reorthogonalize:
            z = reorth(V.at[idx].set(v), z)
        beta = _safe_norm(z)
        v_next = z / (beta + _EPS)
        V = V.at[idx].set(v)
        return (V, v_next, u, beta), (alpha, beta)

    if remat_body:
        body = jax.checkpoint(body, prevent_cse=False)
    V0 = jnp.zeros((k, d), v0.dtype)
    (V, *_), (alphas, betas) = jax.lax.scan(
        body, (V0, v_init, jnp.zeros_like(u_probe), jnp.asarray(0.0, v0.dtype)),
        jnp.arange(k))
    return Bidiag(alphas=alphas, betas=betas[:-1], right=V)


def bidiag_dense(alphas: jnp.ndarray, betas: jnp.ndarray) -> jnp.ndarray:
    """Materialize the small ``k×k`` upper-bidiagonal ``B``."""
    B = jnp.diag(alphas)
    if alphas.shape[0] > 1:
        B = B + jnp.diag(betas, 1)
    return B
