"""Randomized Nyström preconditioner (ops/nystrom.py): SPD-ness,
deflation quality, CG acceleration, and agreement of the preconditioned
matrix-free paths with their materialized twins.

The preconditioner must never change WHAT the CG converges to — only how
fast — so every integration test here asserts equality with the
unpreconditioned/materialized result, and the unit tests check the
operator-level contract (symmetric PD, condition-number deflation).
"""

import jax
import jax.numpy as jnp

from fixtures import classifier_state
from laplace_inducing_points_tpu.ops.nystrom import nystrom_preconditioner
from laplace_inducing_points_tpu.training import inducing as ind
from laplace_inducing_points_tpu.inference import sample as smp


def _frontloaded_psd(d=64, lam_max=1e3, rank=16, seed=0):
    """Random-rotation PSD matrix with a GGN-like front-loaded spectrum:
    `rank` eigenvalues log-spaced down from lam_max, the rest exactly 0.

    lam_max is capped so that κ(G+ρI) stays below 1/eps_f32 ≈ 8e6 at the
    ρ the tests use: materializing the rotation in f32 perturbs the zero
    modes by ~eps·λ_max, and beyond that κ the perturbation swamps ρ —
    C becomes numerically singular and NO solver attains the tolerance
    (observed: x_true components of O(λ_max) along the noise modes)."""
    lam = jnp.concatenate([
        lam_max * jnp.logspace(0.0, -2.0, rank),
        jnp.zeros(d - rank)])
    Q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(seed), (d, d)))
    return (Q * lam) @ Q.T, lam


def test_preconditioner_is_spd_and_deflates():
    d, rho = 64, 1e-2
    G, lam = _frontloaded_psd(d)
    apply_p = nystrom_preconditioner(lambda V: V @ G, d, rank=24, rho=rho,
                                     key=jax.random.PRNGKey(1))
    P_inv = apply_p(jnp.eye(d))                       # rows = (P⁻¹ eᵢ)ᵀ
    assert jnp.max(jnp.abs(P_inv - P_inv.T)) < 1e-5   # symmetric
    # deflation_floor keeps P⁻¹'s spectrum in [floor·(1−ε), 1+ε] — a
    # genuinely PD matrix even materialized in f32 (without the floor, the
    # zero modes pull λ̂_min to 0 and P⁻¹'s smallest eigenvalue to
    # ρ/λ̂_max ≈ 1e-7, i.e. round-off-indefinite).
    ev_p = jnp.linalg.eigvalsh(0.5 * (P_inv + P_inv.T))
    assert jnp.min(ev_p) > 0.5e-5, float(jnp.min(ev_p))

    C = G + rho * jnp.eye(d)
    # κ of the preconditioned system via congruence: P⁻¹ = LLᵀ ⇒
    # spec(P⁻¹C) = spec(LᵀCL) (symmetrizing the NONsymmetric product
    # P⁻¹C is not valid — it can be indefinite even when P⁻¹C has
    # positive spectrum).
    Lp = jnp.linalg.cholesky(0.5 * (P_inv + P_inv.T))
    ev = jnp.linalg.eigvalsh(Lp.T @ C @ Lp)
    kappa_pre = jnp.max(ev) / jnp.min(ev)
    kappa_plain = (lam[0] + rho) / rho                # ≈ 1e7
    # rank 24 covers the whole 16-dim range space; residual κ is
    # max(λ̂_max·floor, ρ)/ρ ≈ 100 here
    assert kappa_pre < 1e-3 * kappa_plain, (float(kappa_pre),
                                            float(kappa_plain))


def test_precond_cg_beats_plain_cg():
    """At a fixed 8-iteration budget on a κ≈1e5 system, preconditioned CG
    must be orders of magnitude more accurate than plain CG. tol stays
    positive: forcing iterations past convergence (tol=0) hits the
    classic post-convergence CG breakdown (round-off residuals make the
    P⁻¹-weighted inner products indefinite → NaN) — production call
    sites always stop on tolerance first."""
    d, rho = 64, 1e-2
    G, _ = _frontloaded_psd(d)
    C = G + rho * jnp.eye(d)
    b = jax.random.normal(jax.random.PRNGKey(2), (d,))
    x_true = jnp.linalg.solve(C, b)

    apply_p = nystrom_preconditioner(lambda V: V @ G, d, rank=24, rho=rho,
                                     key=jax.random.PRNGKey(1))
    matvec = lambda u: C @ u
    x_plain, _ = jax.scipy.sparse.linalg.cg(matvec, b, tol=1e-8, maxiter=8)
    x_pre, _ = jax.scipy.sparse.linalg.cg(matvec, b, tol=1e-8, maxiter=8,
                                          M=apply_p)
    err_plain = jnp.linalg.norm(x_plain - x_true) / jnp.linalg.norm(x_true)
    err_pre = jnp.linalg.norm(x_pre - x_true) / jnp.linalg.norm(x_true)
    assert err_pre < 1e-2 * err_plain, (float(err_pre), float(err_plain))
    assert err_pre < 5e-3

    # and with iterations to spare, the tol-stopped solve stays NaN-free
    x_long, _ = jax.scipy.sparse.linalg.cg(matvec, b, tol=1e-8, maxiter=200,
                                           M=apply_p)
    err_long = jnp.linalg.norm(x_long - x_true) / jnp.linalg.norm(x_true)
    assert jnp.isfinite(err_long) and err_long < 5e-3


def test_matfree_objective_precond_matches_materialized():
    """Same contract as test_matfree_stochastic_matches_materialized, with
    the Nyström-preconditioned CG: value AND dZ-gradient agree with the
    dense-Gram Woodbury twin at the same key."""
    _, state, (x, _) = classifier_state()
    Z, X = x[:5], x[:12]
    alpha, N = 0.6, 24
    kw = dict(full_set_size=N, st_samples=48, slq_samples=4,
              slq_num_matvecs=8)
    key = jax.random.PRNGKey(3)
    v_mat, g_mat = jax.value_and_grad(ind.kl_objective_stochastic)(
        Z, X, state, alpha, key, **kw)
    v_pre, g_pre = jax.value_and_grad(ind.OBJECTIVES["stochastic_matfree"])(
        Z, X, state, alpha, key, precond_rank=6, **kw)
    assert jnp.allclose(v_mat, v_pre, rtol=1e-4, atol=1e-3), (v_mat, v_pre)
    scale = jnp.max(jnp.abs(g_mat)) + 1e-8
    assert jnp.max(jnp.abs(g_mat - g_pre)) < 5e-3 * scale


def test_matheron_precond_matches_materialized():
    """Preconditioned matrix-free Matheron draws == Cholesky-materialized
    draws on identical (ε₁, η)."""
    _, state, (x, _) = classifier_state()
    Z = x[:5]
    alpha, N = 0.3, 17
    ap_mat, d = smp.make_matheron_sampler(state, Z, alpha, full_set_size=N)
    ap_pre, d2 = smp.make_matheron_sampler(
        state, Z, alpha, full_set_size=N, materialize_w=False,
        cg_tol=1e-10, precond_rank=6, precond_key=jax.random.PRNGKey(7))
    assert d == d2
    D = smp.ops.dense_wt(state, Z).shape[1]
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    eps = jax.random.normal(k1, (7, D))
    eta = jax.random.normal(k2, (7, d))
    a, b = ap_mat(eps, eta), ap_pre(eps, eta)
    scale = jnp.max(jnp.abs(a)) + 1e-8
    assert jnp.max(jnp.abs(a - b)) < 1e-4 * scale


def test_precond_path_never_materializes_gram():
    """The (d_z, rank) sketch must not smuggle in a banned intermediate:
    same static jaxpr walk as the unpreconditioned memory assertion."""
    _, state, (x, _) = classifier_state()
    Z, X = x[:5], x[:12]
    d_z = Z.shape[0] * 2
    from laplace_inducing_points_tpu.core.params import flatten_nn_params
    D = flatten_nn_params(state.params)[0].shape[0]
    assert D > d_z

    fn = lambda z: ind.OBJECTIVES["stochastic_matfree"](
        z, X, state, 0.6, jax.random.PRNGKey(0), full_set_size=24,
        st_samples=16, slq_samples=2, slq_num_matvecs=6, precond_rank=4)
    jaxpr = jax.make_jaxpr(jax.value_and_grad(fn))(Z)
    banned = {(d_z, D), (D, d_z), (d_z, d_z)}
    stack = [jaxpr.jaxpr]
    seen = 0
    while stack:
        jp = stack.pop()
        for eqn in jp.eqns:
            seen += 1
            for v in eqn.outvars:
                shape = tuple(getattr(v.aval, "shape", ()))
                assert shape not in banned, (eqn.primitive, shape)
            for val in eqn.params.values():
                vals = val if isinstance(val, (list, tuple)) else [val]
                for item in vals:
                    if hasattr(item, "jaxpr"):
                        stack.append(item.jaxpr)
                    elif hasattr(item, "eqns"):
                        stack.append(item)
    assert seen > 50


def test_sketch_columns_stay_aligned_with_zero_modes():
    """Round-4 regression (ADVICE r3): with masked (junk) sketch columns,
    the QR re-orthonormalization must not rotate GOOD eigenvector columns
    away from their positional coefficients. Exact low-rank G + oversized
    sketch => Nyström recovers the range exactly, so each good column must
    match the true eigenvector (distinct eigengaps), and good columns must
    come first."""
    import numpy as np
    from laplace_inducing_points_tpu.ops.nystrom import nystrom_sketch

    d, r = 12, 3
    lam_true = jnp.array([100.0, 10.0, 1.0] + [0.0] * (d - r))
    Q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(3), (d, d)))
    G = (Q * lam_true) @ Q.T
    gram_mm = lambda V: V @ G                      # (k, d) -> (k, d)

    U, lam, good = nystrom_sketch(gram_mm, d, 6, jax.random.PRNGKey(7))
    good = np.asarray(good)
    lam = np.asarray(lam)
    n_good = int(good.sum())
    assert n_good >= r
    # good columns form a PREFIX (descending-s2 ordering before QR)
    assert good[:n_good].all() and not good[n_good:].any()
    # lam descending over the good block
    assert (np.diff(lam[:n_good]) <= 1e-6).all()
    np.testing.assert_allclose(lam[:r], np.asarray(lam_true[:r]),
                               rtol=1e-3, atol=1e-3)
    # per-column eigenvector alignment (the old ascending-order code let
    # Householder junk directions rotate these away)
    for j in range(r):
        dot = float(jnp.abs(jnp.dot(U[:, j], Q[:, j])))
        assert dot > 0.99, (j, dot)


def test_blocked_probe_sweeps_match_unblocked():
    """Round-4 regression: the rank-64 sketch sweep OOMed the chip at
    M=4096 because all probes' tangent activations were live at once
    (16.2 GB / 15.75 GB HBM). The probe-blocked sweeps must bound memory
    WITHOUT changing any value: blocked t_matmat / matmat / gram_matmat
    agree with the one-shot vmap, including at non-divisor block sizes."""
    from laplace_inducing_points_tpu.core import operators as ops
    from laplace_inducing_points_tpu.ops.nystrom import (
        nystrom_sketch, sketch_probe_block)

    _, state, (x, _) = classifier_state()
    w = ops.make_w_factor(state, x[:5], full_set_size=11)
    Mk, Kk = w.inner_shape
    d = Mk * Kk
    D = w.num_params
    P = 7
    V = jax.random.normal(jax.random.PRNGKey(0), (P, D))
    U = jax.random.normal(jax.random.PRNGKey(1), (P, Mk, Kk))
    F = jax.random.normal(jax.random.PRNGKey(2), (P, d))
    for blk in (1, 2, 3, 7, 50):
        assert jnp.allclose(w.t_matmat(V, block=blk), w.t_matmat(V),
                            atol=1e-6), blk
        assert jnp.allclose(w.matmat(U, block=blk), w.matmat(U),
                            atol=1e-6), blk
        assert jnp.allclose(w.gram_matmat(F, block=blk), w.gram_matmat(F),
                            atol=1e-6), blk

    # blocking must not change the preconditioner's ACTION (the junk
    # zero-mode columns of U are arbitrary orthonormal directions — f32
    # scheduling noise rotates them freely, but their coeff is 0, so
    # P⁻¹v is the invariant to pin; good-column eigenvalues likewise)
    from laplace_inducing_points_tpu.ops.nystrom import precond_from_sketch
    gm = lambda b: (lambda Vq: w.gram_matmat(Vq, block=b))
    U0, lam0, good0 = nystrom_sketch(gm(None), d, 6, jax.random.PRNGKey(7))
    U1, lam1, good1 = nystrom_sketch(gm(2), d, 6, jax.random.PRNGKey(7))
    assert (good0 == good1).all()
    assert jnp.allclose(jnp.where(good0, lam0, 0.0),
                        jnp.where(good1, lam1, 0.0), rtol=1e-4, atol=1e-5)
    rho = 0.05
    v = jax.random.normal(jax.random.PRNGKey(9), (3, d))
    p0 = precond_from_sketch(U0, lam0, good0, rho)(v)
    p1 = precond_from_sketch(U1, lam1, good1, rho)(v)
    assert jnp.allclose(p0, p1, rtol=1e-3, atol=1e-4)

    # the block policy: one-shot below budget, budget/M above, never 0
    assert sketch_probe_block(1024, 16) is None          # 16k <= 32k
    assert sketch_probe_block(4096, 64) == 8             # 32768 // 4096
    assert sketch_probe_block(6144, 64) == 5
    assert sketch_probe_block(100_000, 64) == 1


def test_staged_sketch_matches_internal_build():
    """Round-5 compile-graph staging: passing a precomputed Nyström sketch
    (``_probe_sketch`` — the same fold_in key stream as the objective's
    internal build) through ``precond_sketch`` must reproduce the
    monolithic objective's value AND dZ-gradient. This is the contract
    that lets training keep the HIGHEST-precision sketch OUT of the
    value_and_grad graph (remote-compile-helper OOM otherwise) without
    changing what a step computes."""
    _, state, (x, _) = classifier_state()
    Z, X = x[:5], x[:12]
    alpha, N = 0.6, 24
    kw = dict(full_set_size=N, st_samples=32, slq_samples=2,
              slq_num_matvecs=8, precond_rank=6, precond_power=1)
    key = jax.random.PRNGKey(3)
    obj = ind.OBJECTIVES["stochastic_matfree"]
    v_mono, g_mono = jax.value_and_grad(obj)(Z, X, state, alpha, key, **kw)
    sketch = ind._probe_sketch(state, Z, key, 6, 1)
    v_stg, g_stg = jax.value_and_grad(obj)(Z, X, state, alpha, key,
                                           precond_sketch=sketch, **kw)
    assert jnp.allclose(v_mono, v_stg, rtol=1e-5, atol=1e-6), (v_mono, v_stg)
    scale = jnp.max(jnp.abs(g_mono)) + 1e-8
    assert jnp.max(jnp.abs(g_mono - g_stg)) < 1e-4 * scale


def test_power_iteration_tightens_deflation():
    """Round-5: `power` subspace-iteration passes must (a) leave the
    P^{-1/2}∘P^{-1/2} = P⁻¹ identity intact, and (b) tighten the MEASURED
    deflated spectrum (top eigenvalue of P^{-1/2}CP^{-1/2}) on a spectrum
    whose tail the plain sketch misestimates — the round-5 trained-MAP
    regime where the sketch's λ̂_k lied by orders of magnitude."""
    import numpy as np
    from laplace_inducing_points_tpu.ops.nystrom import (
        nystrom_sketch, precond_from_sketch, precond_inv_sqrt_from_sketch)

    d, rho = 96, 1.0
    rng = np.random.default_rng(5)
    # slowly decaying spectrum, effective rank >> sketch rank
    lam = np.sort(10 ** rng.uniform(-2, 4, d))[::-1].copy()
    Q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    G = jnp.asarray((Q * lam) @ Q.T, dtype=jnp.float32)
    G = 0.5 * (G + G.T)
    gram_mm = lambda V: V @ G

    def lam_seen(power):
        U, l, good = nystrom_sketch(gram_mm, d, 12, jax.random.PRNGKey(2),
                                    power=power)
        pis = precond_inv_sqrt_from_sketch(U, l, good, rho)
        pinv = precond_from_sketch(U, l, good, rho)
        I = jnp.eye(d, dtype=jnp.float32)
        # P^{-1/2} P^{-1/2} == P^{-1}
        assert jnp.allclose(jax.vmap(pis)(jax.vmap(pis)(I)),
                            jax.vmap(pinv)(I), rtol=1e-4, atol=1e-5)
        Pis = jax.vmap(pis)(I)
        S = Pis @ (G + rho * I) @ Pis.T
        return float(jnp.linalg.eigvalsh(0.5 * (S + S.T))[-1])

    l0, l1 = lam_seen(0), lam_seen(1)
    assert l1 <= l0 * 1.05, (l0, l1)     # power must not hurt
    # and on this spectrum it must genuinely help (measured ~2x in the
    # round-5 synthetic study; require >=20% to stay noise-robust)
    assert l1 <= 0.8 * l0, (l0, l1)
