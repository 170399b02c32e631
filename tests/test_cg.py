"""ops/cg.py — batched CG dense twins (solution, masking, gradients).

Round-5 module: one while_loop with all RHS as loop state, replacing
vmap-of-cg (which OOM-SIGKILLed the remote TPU compile helper over
HIGHEST-precision operators; docs/DESIGN.md §5c).
"""

import jax
import jax.numpy as jnp

from laplace_inducing_points_tpu.ops.cg import cg_batched, rowwise

jax.config.update("jax_enable_x64", False)


def _spd(key, d, cond=100.0):
    Q, _ = jnp.linalg.qr(jax.random.normal(key, (d, d)))
    lam = jnp.logspace(0, jnp.log10(cond), d)
    return (Q * lam) @ Q.T


def test_cg_batched_matches_direct_solve():
    d, P = 24, 5
    A = _spd(jax.random.PRNGKey(0), d)
    B = jax.random.normal(jax.random.PRNGKey(1), (P, d))
    X = cg_batched(lambda Xm: Xm @ A.T, B, tol=1e-7, maxiter=400)
    X_ref = jnp.linalg.solve(A, B.T).T
    assert jnp.allclose(X, X_ref, rtol=1e-3, atol=1e-4)


def test_cg_batched_mixed_scale_rows_all_converge():
    """Masking correctness: rows of wildly different norms must each hit
    THEIR relative tolerance (a shared stopping rule would let big rows
    mask small ones)."""
    d = 16
    # cond=1e2 keeps the f32 attainable residual (~eps*kappa ~ 6e-6) well
    # under the asserted bound — at 1e4 the floor itself is ~1e-4
    A = _spd(jax.random.PRNGKey(2), d, cond=1e2)
    B = jax.random.normal(jax.random.PRNGKey(3), (3, d))
    B = B * jnp.array([1e-3, 1.0, 1e3])[:, None]
    X = cg_batched(lambda Xm: Xm @ A.T, B, tol=1e-6, maxiter=2000)
    res = jnp.linalg.norm(X @ A.T - B, axis=1) / jnp.linalg.norm(B, axis=1)
    assert jnp.all(res < 5e-5), res


def test_cg_batched_preconditioned_converges_faster():
    d = 32
    A = _spd(jax.random.PRNGKey(4), d, cond=1e6)
    B = jax.random.normal(jax.random.PRNGKey(5), (4, d))
    inv_diag = 1.0 / jnp.diag(A)
    # few iterations: the Jacobi-preconditioned run must be closer
    X_plain = cg_batched(lambda Xm: Xm @ A.T, B, tol=1e-12, maxiter=8)
    X_prec = cg_batched(lambda Xm: Xm @ A.T, B, tol=1e-12, maxiter=8,
                        precond=rowwise(lambda r: r * inv_diag))
    ref = jnp.linalg.solve(A, B.T).T
    err_plain = jnp.linalg.norm(X_plain - ref)
    err_prec = jnp.linalg.norm(X_prec - ref)
    assert err_prec < err_plain


def test_cg_batched_implicit_gradient():
    """d/dtheta of sum(A(theta)^-1 B) via custom_linear_solve equals the
    dense-solve gradient."""
    d, P = 10, 3
    A0 = _spd(jax.random.PRNGKey(6), d)
    B = jax.random.normal(jax.random.PRNGKey(7), (P, d))

    def loss_cg(theta):
        A = A0 + theta * jnp.eye(d)
        X = cg_batched(lambda Xm: Xm @ A.T, B, tol=1e-9, maxiter=500)
        return jnp.sum(X ** 2)

    def loss_dense(theta):
        A = A0 + theta * jnp.eye(d)
        X = jnp.linalg.solve(A, B.T).T
        return jnp.sum(X ** 2)

    g_cg = jax.grad(loss_cg)(0.7)
    g_ref = jax.grad(loss_dense)(0.7)
    assert jnp.allclose(g_cg, g_ref, rtol=1e-3), (g_cg, g_ref)


def test_cg_batched_traced_maxiter():
    """maxiter may ride as a traced scalar (budget sweeps reuse one
    compiled graph)."""
    d = 12
    A = _spd(jax.random.PRNGKey(8), d)
    B = jax.random.normal(jax.random.PRNGKey(9), (2, d))
    f = jax.jit(lambda mi: cg_batched(lambda Xm: Xm @ A.T, B, tol=1e-7,
                                      maxiter=mi))
    X = f(jnp.int32(300))
    ref = jnp.linalg.solve(A, B.T).T
    assert jnp.allclose(X, ref, rtol=1e-3, atol=1e-4)
