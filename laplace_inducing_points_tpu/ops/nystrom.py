"""Randomized Nyström preconditioner for matrix-free CG solves.

The ``d_z``-unbounded paths (``stochastic_matfree`` objective,
``make_matheron_sampler(materialize_w=False)``) solve
``C x = b`` with ``C = G + ρI`` by CG against the matrix-free Gram
operator ``G = WᵀW``. GGN Gram spectra are extremely front-loaded
(λ_max ≈ 2.6e5 with exact zero modes at the CIFAR flagship point,
RESULTS.md), so κ(C) ≈ λ_max/ρ and plain CG stalls: measured 1.25e-2
relative error after 100 iterations at d_z=10240 on the v5e chip.

The classic fix (Frangella, Tropp & Udell, "Randomized Nyström
Preconditioning", SIAM J. Matrix Anal. 2023 — method only, no code
consulted) deflates the top of the spectrum with a rank-``k`` Nyström
approximation built from ``k`` sketch matvecs:

    Y = G Ω,   Ω ∈ R^{d×k} orthonormal,
    G_nys = Y (ΩᵀY)⁻¹ Yᵀ = U diag(λ̂) Uᵀ   (λ̂ ≥ 0, rank ≤ k),
    P = (λ̂_k + ρ)⁻¹ · U (Λ̂ + ρI) Uᵀ + (I − U Uᵀ),
    P⁻¹v = v + U ((λ̂_k + ρ)/(Λ̂ + ρ) − 1) Uᵀ v.

``P^{-1/2} C P^{-1/2}`` has its top-k eigenvalues compressed to ≈1 and
the rest in [1, (λ̂_k + ρ)/ρ], so CG converges at the *deflated*
condition number. Everything is (d, k) / (k, k) algebra — ``k`` matvecs
to build, two (d, k) MXU matmuls per apply, nothing d×d (statically
asserted in ``tests/test_variational.py``).

TPU-first details:

* the eigenbasis comes from a ``k×k`` **eigh of BᵀB** (B the shifted
  Cholesky-whitened sketch), never a tall SVD — same result, one weak-op
  on a tiny matrix;
* the small algebra runs ``precision=HIGHEST`` (``core.operators.pdot``;
  see the precision policy there) — preconditioner error only slows CG,
  but a *broken* P (e.g. non-PSD from bf16 cancellation) breaks it;
* the builder is wrapped in ``stop_gradient``: P affects only the CG
  trajectory, never the fixed point CG converges to, so Z-gradients
  (which flow by implicit differentiation of the *solution*) are exact
  without differentiating through QR/eigh — whose VJPs NaN at repeated
  eigenvalues (the hazard ``ops/lanczos.py`` exists to avoid).

No reference analog: the reference has no matrix-free Woodbury at all
(``/root/reference/src/train_inducing.py:122-132`` materializes the dense
Gram).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from laplace_inducing_points_tpu.core.operators import pdot

# Peak live tangent activations of a blocked Gram probe sweep scale with
# block·M (example·probes). 32768 keeps a LeNet5 sweep near ~1.3 GB — the
# unblocked rank-64 sketch at M=4096 needs >16 GB and OOMs the 15.75 GB
# v5e chip (measured, round 4).
_SWEEP_BUDGET_EXAMPLE_PROBES = 32768


def sketch_probe_block(n_examples: int, n_probes: int,
                       budget: int = _SWEEP_BUDGET_EXAMPLE_PROBES):
    """Probe-chunk size for a Nyström sketch's Gram sweep (None = one-shot
    vmap). Bounds ``block·n_examples`` by ``budget`` so the sweep's live
    tangent activations stay within HBM at any inducing-set size."""
    if n_probes * n_examples <= budget:
        return None
    return max(1, budget // n_examples)


def nystrom_sketch(gram_matmat: Callable[[jnp.ndarray], jnp.ndarray],
                   d: int, rank: int, key: jax.Array, power: int = 0):
    """The ρ-INDEPENDENT part of the preconditioner: ``rank`` sketch
    matvecs → the Nyström eigenpairs ``(U (d, k), lam (k,), good (k,))``.

    Splitting the sketch from :func:`precond_from_sketch` lets callers
    amortize the expensive part (the ``k`` Gram matvecs) across ρ values —
    e.g. an α grid search or a predictor whose α stays traced — since only
    the O(k) ``coeff`` vector depends on ρ. All outputs are
    ``stop_gradient``-ed (rationale in the module docstring).

    ``power`` adds that many subspace-iteration passes (``Ω ← orth(G Ω)``)
    before the final sketch — ``(1+power)·rank`` matvecs total. At
    front-loaded GGN spectra the single-pass sketch's subspace can
    misalign with the top eigenvectors by an angle θ that leaves
    ``λ_max·sin²θ`` UNdeflated — at trained-MAP Grams (λ_max ~ 1e6,
    round 5) even θ ~ 3e-2 leaves the preconditioned operator ~1e3·ρ and
    CG stalls while the sketch's own eigenvalues claim κ ≈ 3. One power
    pass squares the eigenvalue ratios driving the alignment; it is the
    cheap fix whenever the healthcheck's MEASURED ``lam_seen`` is far
    above the sketch's ``λ̂_k`` (heavy true tails need ``rank`` instead).
    """
    k = min(rank, d)
    Om = jax.random.normal(key, (d, k), dtype=jnp.float32)
    Om, _ = jnp.linalg.qr(Om)                       # (d, k) orthonormal
    for _ in range(power):
        Om, _ = jnp.linalg.qr(gram_matmat(Om.T).T)  # subspace iteration
    Y = gram_matmat(Om.T).T                         # (d, k) = G Ω

    # stability shift (makes ΩᵀY PD despite f32 round-off / zero modes)
    nu = jnp.sqrt(jnp.float32(d)) * jnp.finfo(jnp.float32).eps \
        * jnp.linalg.norm(Y)
    Yv = Y + nu * Om
    B = pdot(Om.T, Yv)                              # (k, k), symmetric PD
    L = jnp.linalg.cholesky(0.5 * (B + B.T))
    F = jax.scipy.linalg.solve_triangular(L, Yv.T, lower=True).T  # (d, k)

    # eigenbasis of G_nys = F Fᵀ via the k×k eigh of FᵀF = V s² Vᵀ:
    # U = F V s⁻¹ (columns with s ≈ 0 are junk — their λ̂ clips to 0 and
    # the coeff formula then contributes ≈0, so zero them explicitly).
    s2, V = jnp.linalg.eigh(pdot(F.T, F))
    s2 = jnp.maximum(s2, 0.0)
    s = jnp.sqrt(s2)
    good = s > jnp.finfo(jnp.float32).eps * jnp.max(s) * d
    U = pdot(F, V) * jnp.where(good, 1.0 / jnp.maximum(s, 1e-30), 0.0)
    # Sort descending by s² BEFORE the QR re-orthonormalization below:
    # eigh orders ascending, so any zeroed junk columns would come FIRST,
    # and Householder QR would fill them with arbitrary orthonormal
    # directions that later (good) columns get Gram-Schmidt'ed against —
    # rotating them away from the Nyström eigenvectors while ``coeff``
    # stays positional. Descending order puts every good column before
    # every junk one, so the good block re-orthonormalizes against itself.
    order = jnp.argsort(-s2)
    U, s2, good = U[:, order], s2[order], good[order]
    # Re-orthonormalize: the eigh spans ~6 decades at GGN spectra, leaving
    # UᵀU − I ≈ 1e-4 — ABOVE the deflation floor, which makes
    # I + U diag(coeff) Uᵀ indefinite at that level and stalls CG
    # (observed, not hypothetical). QR of the near-orthonormal (sorted) U
    # is a ≈identity rotation on the good block, so column↔coeff alignment
    # survives; P⁻¹ is then SPD for ANY orthonormal U by construction.
    U = jnp.linalg.qr(U)[0]
    lam = jnp.maximum(s2 - nu, 0.0)                 # Nyström eigenvalues
    return jax.lax.stop_gradient((U, lam, good))


def precond_from_sketch(U: jnp.ndarray, lam: jnp.ndarray, good: jnp.ndarray,
                        rho, deflation_floor: float = 1e-5
                        ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """ρ-dependent tail: build ``apply(v) = P⁻¹ v`` from a stored sketch.

    O(k) work besides the two (d, k) matmuls per apply — safe to call
    inside a jit with a traced ``rho``.
    """
    lam_min = jnp.min(jnp.where(good, lam, jnp.inf))
    lam_min = jnp.where(jnp.isfinite(lam_min), lam_min, 0.0)
    mult = jnp.maximum((lam_min + rho) / (lam + rho), deflation_floor)
    coeff = jnp.where(good, mult - 1.0, 0.0)
    coeff = jax.lax.stop_gradient(coeff)

    def apply(v: jnp.ndarray) -> jnp.ndarray:
        t = pdot(v, U)                              # (..., k)
        return v + pdot(t * coeff, U.T)

    return apply


def precond_inv_sqrt_from_sketch(U: jnp.ndarray, lam: jnp.ndarray,
                                 good: jnp.ndarray, rho,
                                 deflation_floor: float = 1e-5
                                 ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """``apply(v) = P^{-1/2} v`` for the same ``P`` as
    :func:`precond_from_sketch` (``P⁻¹ = I + U diag(mult−1) Uᵀ`` with
    ``mult ∈ [floor, 1]`` ⇒ ``P^{-1/2} = I + U diag(√mult − 1) Uᵀ``).

    Exists for MEASURING the preconditioned spectrum: power iteration on
    the symmetric ``S = P^{-1/2} C P^{-1/2}`` gives the true top of the
    spectrum CG sees after deflation — the sketch's own ``λ̂_k`` badly
    underestimates ``λ_{k+1}`` when the spectrum decays slowly (measured:
    sketch claimed κ_defl=2.8 while CG stalled at residual 1e+1,
    RESULTS.md round 5), so healthchecks must not trust it.
    """
    lam_min = jnp.min(jnp.where(good, lam, jnp.inf))
    lam_min = jnp.where(jnp.isfinite(lam_min), lam_min, 0.0)
    mult = jnp.maximum((lam_min + rho) / (lam + rho), deflation_floor)
    coeff = jnp.where(good, jnp.sqrt(mult) - 1.0, 0.0)
    coeff = jax.lax.stop_gradient(coeff)

    def apply(v: jnp.ndarray) -> jnp.ndarray:
        t = pdot(v, U)
        return v + pdot(t * coeff, U.T)

    return apply


def nystrom_preconditioner(gram_matmat: Callable[[jnp.ndarray], jnp.ndarray],
                           d: int, rank: int, rho,
                           key: jax.Array,
                           deflation_floor: float = 1e-5,
                           power: int = 0
                           ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build ``apply(v) = P⁻¹ v`` for ``C = G + ρI`` from ``rank`` matvecs.

    ``gram_matmat``: batched Gram action ``(k, d) -> (k, d)`` (rows are
    probes). ``apply`` accepts ``(d,)`` or batched ``(..., d)``; it is a
    symmetric positive-definite linear map, as
    ``jax.scipy.sparse.linalg.cg``'s ``M`` argument requires.

    ``deflation_floor`` caps per-direction deflation at 1/floor: when the
    Gram has zero modes, ``λ̂_min → 0`` and the textbook multiplier
    ``(λ̂_min+ρ)/(λ̂_max+ρ)`` can fall below f32 round-off — P⁻¹ then has
    noise-level eigenvalues and preconditioned CG *loses* accuracy. The
    floor keeps P⁻¹'s spectrum in [floor, 1]; residual condition number is
    ``max(λ̂_max·floor, ρ)/ρ`` instead of 1, still a ~1e5× deflation at
    GGN-like spectra and exactly computable in f32.
    """
    U, lam, good = nystrom_sketch(gram_matmat, d, rank, key, power=power)
    return precond_from_sketch(U, lam, good, rho, deflation_floor)
