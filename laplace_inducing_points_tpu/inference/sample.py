"""Posterior weight sampling via a matrix-free inverse matrix square root.

Draws ``δθ ~ N(0, S⁻¹)`` with ``S = αI + β W Wᵀ`` (the inducing-point
curvature) by applying ``S^{-1/2}`` to standard normal noise.

Parity: ``/root/reference/src/sample.py`` — which implements the
Fasi–Higham–Liu low-rank-update identity with a CG null-space projector, a
Lanczos inner inverse-sqrt over ``2M`` matvecs, and a global eigenvalue clip
at 1.0 for stability. TPU-first redesign collapses all of that into **one**
small eigendecomposition:

With ``G = WᵀW = V Λ Vᵀ`` (``d×d``, d = M·K):

    S^{-1/2} ε = α^{-1/2} ε + W V diag(g(λ)) Vᵀ (Wᵀ ε),
    g(λ) = ((α + βλ)^{-1/2} − α^{-1/2}) / λ   for λ > tol,  else 0.

This is algebraically identical to the reference's two-term formula (null
space + range space) but:

* exact — no Lanczos truncation, no CG tolerance, no eigenvalue clipping;
* correct for **rank-deficient** ``G`` (softmax-CE factors always are:
  ``L_i`` kills the all-ones direction, so ``rank(G) ≤ M(K-1)``; the
  reference solves against the singular Gram and relies on f64 round-off),
* one MXU-matmul pass over the sample batch: ``Wᵀ`` on all probes at once,
  a ``d×d`` eigh, ``W`` on all probes at once. Samples are vmapped, not
  ``lax.map``-serialized (reference ``/root/reference/src/sample.py:155``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from laplace_inducing_points_tpu.core import operators as ops
from laplace_inducing_points_tpu.ops import lanczos as lz
from laplace_inducing_points_tpu.ops.pallas.syrk import syrk


def _g_weights(lam: jnp.ndarray, alpha, beta,
               rank_tol: float = 1e-7,
               range_clip_min: Optional[float] = None) -> jnp.ndarray:
    """Spectral weights g(λ) with pseudo-inverse thresholding.

    ``range_clip_min``: clip the range-space eigenvalues ``α + βλ`` from
    below before the inverse sqrt — ``1.0`` reproduces the reference's
    monkeypatched sampler (``/root/reference/src/matfree_monkeypatch.py:20``
    clips the Lanczos eigenvalues at 1.0), which caps the posterior variance
    of weak-curvature range directions at 1 instead of 1/(α+βλ). The
    reference's PUBLISHED metrics embed this clip; ``None`` gives the exact
    inverse square root.
    """
    lam_max = jnp.max(lam)
    mask = lam > rank_tol * jnp.maximum(lam_max, 1.0)
    lam_safe = jnp.where(mask, lam, 1.0)
    inner = alpha + beta * lam_safe
    if range_clip_min is not None:
        inner = jnp.maximum(inner, range_clip_min)
    g = (1.0 / jnp.sqrt(inner) - 1.0 / jnp.sqrt(alpha)) / lam_safe
    return jnp.where(mask, g, 0.0)


def inv_matsqrt_gram(gram: jnp.ndarray, alpha, beta,
                     rank_tol: float = 1e-7,
                     range_clip_min: Optional[float] = None):
    """Precompute the spectral factor; returns (V·diag(g)·Vᵀ, d×d)."""
    lam, V = jnp.linalg.eigh(ops.ensure_symmetry(gram, jitter=0.0))
    g = _g_weights(lam, alpha, beta, rank_tol, range_clip_min)
    return (V * g) @ V.T


def apply_inv_matsqrt_rows(eps: jnp.ndarray, R: jnp.ndarray,
                           core: jnp.ndarray, alpha) -> jnp.ndarray:
    """``S^{-1/2} Eps`` through materialized rows + spectral core.

    ``eps (P, D)``, ``R = Wᵀ rows (d, D)``, ``core = V diag(g) Vᵀ (d, d)``.
    Three HIGHEST-precision matmuls: the range-term correction cancels the
    prior draw along high-curvature directions, so contraction error
    re-enters the pushed-forward samples amplified by ~√λ_max (bf16 here
    broke flagship metrics — see ``pdot``'s docstring).
    """
    U = ops.pdot(eps, R.T)                         # (P, d) = (Wᵀ ε)ᵀ
    return eps / jnp.sqrt(alpha) + ops.pdot(ops.pdot(U, core.T), R)


def make_inv_matsqrt(state: Any, Z: jnp.ndarray, alpha,
                     full_set_size: Optional[int] = None,
                     rank_tol: float = 1e-7,
                     gram_block: Optional[int] = None,
                     materialize_w: bool = True,
                     example_block: Optional[int] = None,
                     range_clip_min: Optional[float] = None
                     ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build ``Eps (P, D) ↦ S^{-1/2} Eps`` for ``S = αI + β W Wᵀ``.

    ``materialize_w=True`` uses the dense ``Wᵀ`` rows (one vmapped jacrev +
    two MXU matmuls per call); ``False`` stays matrix-free (batched jvp/vjp
    probes) for parameter counts where ``d×D`` does not fit.
    """
    M = Z.shape[0]
    N = full_set_size or M
    beta = N / M
    inv_sqrt_alpha = 1.0 / jnp.sqrt(alpha)

    if materialize_w:
        R = ops.dense_wt(state, Z, example_block=example_block)  # (d, D)
        gram = syrk(R)
        core = inv_matsqrt_gram(gram, alpha, beta, rank_tol,
                                range_clip_min)                # (d, d)

        def apply(eps: jnp.ndarray) -> jnp.ndarray:
            return apply_inv_matsqrt_rows(eps, R, core, alpha)

        return apply

    w = ops.make_w_factor(state, Z, full_set_size=None)
    gram = w.gram(block=gram_block)
    core = inv_matsqrt_gram(gram, alpha, beta, rank_tol, range_clip_min)
    M_, K_ = w.inner_shape

    def apply(eps: jnp.ndarray) -> jnp.ndarray:
        U = w.t_matmat(eps).reshape(eps.shape[0], -1)          # (P, d)
        mixed = ops.pdot(U, core.T).reshape(-1, M_, K_)
        return inv_sqrt_alpha * eps + w.matmat(mixed)

    return apply


@jax.jit
def _matheron_apply_dense(R, L, sqrt_alpha, sqrt_beta, eps, eta):
    """One Matheron draw batch from explicit factors (see caller)."""
    U = sqrt_beta * ops.pdot(eps, R.T) + sqrt_alpha * eta      # (P, d)
    X = jax.scipy.linalg.cho_solve((L, True), U.T).T           # (P, d)
    return (eps - sqrt_beta * ops.pdot(X, R)) / sqrt_alpha


def _batch_rel_residual(CX: jnp.ndarray, U: jnp.ndarray) -> jnp.ndarray:
    """Worst relative CG/Cholesky solve residual over a probe batch:
    ``max_p ||C x_p − u_p|| / ||u_p||``."""
    num = jnp.linalg.norm(CX - U, axis=-1)
    den = jnp.maximum(jnp.linalg.norm(U, axis=-1), 1e-30)
    return jnp.max(num / den)


@jax.jit
def _matheron_apply_dense_info(R, L, sqrt_alpha, sqrt_beta, eps, eta):
    U = sqrt_beta * ops.pdot(eps, R.T) + sqrt_alpha * eta      # (P, d)
    X = jax.scipy.linalg.cho_solve((L, True), U.T).T           # (P, d)
    CX = ops.pdot(X, ops.pdot(L, L.T).T)                       # (P, d)
    draws = (eps - sqrt_beta * ops.pdot(X, R)) / sqrt_alpha
    return draws, _batch_rel_residual(CX, U)


def make_matheron_sampler(state: Any, Z: jnp.ndarray, alpha,
                          full_set_size: Optional[int] = None,
                          example_block: Optional[int] = None,
                          materialize_w: bool = True,
                          cg_tol: float = 1e-4,
                          cg_maxiter: Optional[int] = None,
                          precond_rank: Optional[int] = 64,
                          precond_power: int = 0,
                          precond_key: Optional[jax.Array] = None,
                          cg_example_block: Optional[int] = None):
    """Exact posterior draws WITHOUT any matrix square root (round 3).

    Matheron's rule for the low-rank-plus-identity precision
    ``S = αI + β W Wᵀ``: with ``C = βG + αI`` (``G = WᵀW``),

        θ = α^{-1/2} (ε₁ − √β·W C⁻¹ (√β·Wᵀ ε₁ + √α η)),
        ε₁ ~ N(0, I_D),  η ~ N(0, I_d)  independent,

    has covariance exactly ``α^{-1}(I − √β W C⁻¹ √β Wᵀ) = S⁻¹`` (Woodbury)
    — verify: with ``A = C⁻¹``, ``Cov·α = I − W̃(2A − A C A)W̃ᵀ =
    I − W̃ C⁻¹ W̃ᵀ``. The spectral path (:func:`make_inv_matsqrt`) needs a
    ``d×d`` **eigh** — the dominant cost of its factor build and a weak op
    on TPU; Matheron needs only a Cholesky of the always-PD ``C`` (PD for
    every α>0 even when ``G`` is rank-deficient, with no pseudo-inverse
    masking), so the build is ~d³/3 MXU work and each draw is two
    HIGHEST-precision matmuls + one triangular solve pair. No reference
    analog (``/root/reference/src/sample.py`` only has the
    Fasi–Higham–Liu inverse-sqrt); the reference's clip-at-1 semantics is
    a spectral-path-only feature.

    ``materialize_w=False`` pairs with the ``stochastic_matfree`` KL
    objective to give a COMPLETELY ``d_z``-unbounded pipeline: the
    Cholesky becomes a CG solve against the matrix-free operator
    ``u ↦ β·Wᵀ(W u) + α·u`` (each iteration = one jvp+vjp pair of the
    batched model), so neither the ``d×D`` row factor nor the ``d×d``
    Gram ever exists. Note the matrix-free contraction runs at model
    precision (jvp/vjp), not ``pdot``-HIGHEST — on TPU prefer the
    materialized path whenever ``d×D`` fits (see the precision policy in
    ``core.operators.pdot``); the matrix-free path is the scaling escape
    hatch, exact on CPU f32.

    **Matrix-free accuracy contract** (round-4 defaults; measurements in
    ``results/matfree_scale_tpu.jsonl``). κ(C) ≈ λ_max/α at GGN spectra, so
    *unpreconditioned* CG stalls on maxiter: measured 1.25e-2 relative draw
    error at d_z=10,240 with ``cg_tol=1e-3``/``maxiter=100`` — the exits
    were maxiter exits, not convergence. The defaults therefore ship with
    the rank-64 Nyström deflation ON (≈2.6× faster AND ~2× more accurate
    at the same budget: 6.9e-3) and ``cg_tol=1e-4``. Residual draw error
    ~1e-2 relative is fine for MC prediction — it sits below the MC
    sampling noise (~1/√S per moment) — but this path is NOT a substitute
    for the materialized samplers where exact contractions matter. Check
    convergence with ``apply(eps, eta, with_info=True)``: it also returns
    the worst CG relative residual of the batch; a value ≫ ``cg_tol``
    means maxiter exits (raise ``precond_rank``/``cg_maxiter``).

    Returns ``apply(eps (P, D), eta (P, d)) -> (P, D)`` plus ``d`` so the
    caller can shape ``eta``; ``apply(..., with_info=True)`` returns
    ``(draws, cg_rel_residual)`` (the materialized path reports its
    Cholesky-solve residual the same way, normally ~f32 eps).
    """
    from laplace_inducing_points_tpu.training.inducing import _pivot_jitter

    M = Z.shape[0]
    N = full_set_size or M
    beta = N / M
    # Python floats, not jnp scalars: they ride as weak-typed literals into
    # the module-level jit, so they carry NO device commitment — a jnp
    # scalar here is committed to the default device and collides with
    # mesh-committed R/L/eps under jit's device-consistency check.
    sqrt_alpha = float(jnp.sqrt(jnp.float32(alpha)))
    sqrt_beta = float(jnp.sqrt(jnp.float32(beta)))

    if materialize_w:
        R = ops.dense_wt(state, Z, example_block=example_block)  # (d, D)
        d = R.shape[0]
        C = beta * syrk(R) + alpha * jnp.eye(d, dtype=R.dtype)
        L = jnp.linalg.cholesky(
            ops.ensure_symmetry(C, jitter=0.0)
            + _pivot_jitter(C) * jnp.eye(d, dtype=C.dtype))

        def apply(eps: jnp.ndarray, eta: jnp.ndarray,
                  with_info: bool = False):
            # R/L ride as arguments of the module-level jit, NOT closure
            # constants: closing over a (d, D) factor inlines it into the
            # lowered HLO (GBs of literals at real shapes — blows the
            # remote-compile relay's request limit). Callers need not (and
            # should not) re-jit `apply`.
            if with_info:
                return _matheron_apply_dense_info(R, L, sqrt_alpha,
                                                  sqrt_beta, eps, eta)
            return _matheron_apply_dense(R, L, sqrt_alpha, sqrt_beta,
                                         eps, eta)

        return apply, d

    # HIGHEST-precision factor: the CG operator (bf16 matvecs floor the
    # residual at ~ε·λ_max/α regardless of preconditioning — round-5 root
    # cause, training/inducing.py) AND the ``eps − √β·corr`` cancellation
    # below, a posterior-sample contraction per core.operators.pdot's
    # postmortem.
    # ``cg_example_block``: blocked jvp/vjp so the HIGHEST graph stays
    # within the remote compile helper's memory at M ≥ 1024
    # (core.operators.BlockedWFactor).
    if cg_example_block:
        w = ops.make_w_factor_blocked(state, Z, cg_example_block,
                                      full_set_size=None,
                                      matmul_precision="highest")
    else:
        w = ops.make_w_factor(state, Z, full_set_size=None,
                              matmul_precision="highest")
    M_, K_ = w.inner_shape
    d = M_ * K_

    # The Nyström preconditioner depends only on make-time state (state, Z,
    # α, β, rank, key) — build it ONCE here, not per draw batch: its k-probe
    # sketch costs k full Gram matvecs, comparable to a chunk of the CG work.
    precond = None
    if precond_rank:
        from laplace_inducing_points_tpu.ops.nystrom import (
            nystrom_preconditioner, sketch_probe_block)

        blk = sketch_probe_block(M_, precond_rank)

        def gram_mm(V):                           # rows scaled: β·G action
            return beta * w.gram_matmat(V, block=blk)

        precond = nystrom_preconditioner(
            gram_mm, d, precond_rank, alpha,
            precond_key if precond_key is not None
            else jax.random.PRNGKey(0x4E59), power=precond_power)

    def apply(eps: jnp.ndarray, eta: jnp.ndarray, with_info: bool = False):
        from laplace_inducing_points_tpu.ops import cg as cg_mod
        from laplace_inducing_points_tpu.ops.nystrom import sketch_probe_block
        P = eps.shape[0]
        U = (sqrt_beta * w.t_matmat(eps).reshape(P, d)
             + sqrt_alpha * eta)                                  # (P, d)
        # batched CG (one while_loop, probes as loop state): vmap-of-cg
        # over the HIGHEST operator OOM-SIGKILLs the remote compile helper
        # (round 5; ops/cg.py module docstring)
        cgblk = sketch_probe_block(M_, P)

        def c_matmat(Xm):                                        # (P, d)
            return beta * w.gram_matmat(Xm, block=cgblk) + alpha * Xm

        X = cg_mod.cg_batched(
            c_matmat, U, tol=cg_tol, maxiter=cg_maxiter or 10 * d,
            precond=cg_mod.rowwise(precond) if precond else None)
        corr = w.matmat(X.reshape(-1, M_, K_))                    # (P, D)
        draws = (eps - sqrt_beta * corr) / sqrt_alpha
        if with_info:
            # one extra batched Gram matvec: did CG reach tol, or exit on
            # maxiter? (the residual reports what cg does not)
            return draws, _batch_rel_residual(c_matmat(X), U)
        return draws

    return apply, d


def make_inv_matsqrt_lanczos(state: Any, Z: jnp.ndarray, alpha,
                             full_set_size: Optional[int] = None,
                             num_matvecs: Optional[int] = None,
                             eig_clip_min: Optional[float] = None
                             ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Reference-parity variant: Lanczos inner inverse-sqrt + Gram solves.

    Mirrors ``inv_matsqrt_vp`` (``/root/reference/src/sample.py:55-145``):
    null-space term ``α^{-1/2}(I − W G⁻¹ Wᵀ)`` plus range term
    ``W G⁻¹ (αI + β G)^{-1/2} Wᵀ`` with the inner function via
    ``funm_lanczos_sym`` over ``2M`` matvecs. ``eig_clip_min=1.0``
    reproduces the reference's monkeypatched clip. Kept for parity tests and
    as the fallback when even the ``d×d`` eigh is too large.
    """
    M = Z.shape[0]
    N = full_set_size or M
    beta = N / M
    k = num_matvecs or 2 * M

    w = ops.make_w_factor(state, Z, full_set_size=None)
    R = ops.dense_wt(state, Z)
    gram = syrk(R)
    d = gram.shape[0]
    # pseudo-inverse solve for the (generally singular) CE Gram
    lam, V = jnp.linalg.eigh(ops.ensure_symmetry(gram, jitter=0.0))
    mask = lam > 1e-7 * jnp.maximum(jnp.max(lam), 1.0)
    inv_lam = jnp.where(mask, 1.0 / jnp.where(mask, lam, 1.0), 0.0)
    gram_pinv = (V * inv_lam) @ V.T

    inner_mv = lambda u: alpha * u + beta * (gram @ u)

    def single(eps: jnp.ndarray) -> jnp.ndarray:
        u = ops.pdot(R, eps)                                   # Wᵀ ε (d,)
        x = gram_pinv @ u
        nullproj = (eps - ops.pdot(x, R)) / jnp.sqrt(alpha)
        y = lz.funm_lanczos_sym(lambda t: 1.0 / jnp.sqrt(t), inner_mv, u, k,
                                clip_min=eig_clip_min)
        range_term = ops.pdot(gram_pinv @ y, R)
        return nullproj + range_term

    return lambda Eps: jax.vmap(single)(Eps)


def inv_matsqrt_dense(state: Any, Z: jnp.ndarray, alpha,
                      full_set_size: Optional[int] = None) -> jnp.ndarray:
    """Dense ``D×D`` twin for tests (parity: ``inv_matsqrt_dense``,
    ``/root/reference/src/sample.py:16-52``)."""
    M = Z.shape[0]
    N = full_set_size or M
    beta = N / M
    R = ops.dense_wt(state, Z)                                 # (d, D)
    S = alpha * jnp.eye(R.shape[1]) + beta * ops.pdot(R.T, R)
    evals, evecs = jnp.linalg.eigh(S)
    return (evecs / jnp.sqrt(jnp.clip(evals, 1e-12))) @ evecs.T


def sample(state: Any, Z: jnp.ndarray, alpha, key: jax.Array, *,
           num_samples: int = 1, full_set_size: Optional[int] = None,
           method: str = "gram_eigh", **kwargs) -> jnp.ndarray:
    """Draw ``(num_samples, D)`` zero-mean posterior weight perturbations.

    Parity: ``sample`` (``/root/reference/src/sample.py:148-156``).
    """
    from laplace_inducing_points_tpu.core.params import flatten_nn_params
    D = flatten_nn_params(state.params)[0].shape[0]
    if method == "matheron":
        k1, k2 = jax.random.split(key)
        apply2, d = make_matheron_sampler(state, Z, alpha, full_set_size,
                                          **kwargs)
        eps = jax.random.normal(k1, (num_samples, D))
        eta = jax.random.normal(k2, (num_samples, d))
        return apply2(eps, eta)
    eps = jax.random.normal(key, (num_samples, D))
    if method == "gram_eigh":
        apply = make_inv_matsqrt(state, Z, alpha, full_set_size, **kwargs)
    elif method == "lanczos":
        apply = make_inv_matsqrt_lanczos(state, Z, alpha, full_set_size,
                                         **kwargs)
    elif method == "dense":
        mat = inv_matsqrt_dense(state, Z, alpha, full_set_size)
        apply = lambda E: ops.pdot(E, mat.T)
    else:
        raise ValueError(f"unknown sampling method: {method}")
    return apply(eps)
