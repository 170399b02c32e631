"""Krylov layer tests: Lanczos matrix functions and SLQ log-determinants."""

import jax
import jax.numpy as jnp
import pytest

from laplace_inducing_points_tpu.ops import lanczos as lz
from laplace_inducing_points_tpu.ops import slq
from laplace_inducing_points_tpu.ops import stochtrace as st

from fixtures import psd_suite


def _mv(A):
    return lambda v: A @ v


def test_lanczos_reconstructs_small_matrix():
    A = psd_suite()[0]                       # 8x8
    n = A.shape[0]
    v0 = jax.random.normal(jax.random.PRNGKey(0), (n,))
    tri = lz.lanczos_sym(_mv(A), v0, n)
    T = lz.tridiag_dense(tri.alphas, tri.betas)
    V = tri.basis
    # V orthonormal and Vᵀ T V == A on the full space
    assert jnp.allclose(V @ V.T, jnp.eye(n), atol=1e-4)
    assert jnp.allclose(V.T @ T @ V, A, atol=1e-3)


def test_funm_lanczos_inverse_sqrt_diagonal():
    """Closed-form check on a diagonal matrix (reference:
    tests/test_sample.py:334-355)."""
    d = jnp.array([0.5, 1.0, 2.0, 4.0, 9.0, 16.0, 25.0, 36.0])
    A = jnp.diag(d)
    v = jnp.ones(8)
    out = lz.funm_lanczos_sym(lambda x: 1.0 / jnp.sqrt(x), _mv(A), v, 8)
    assert jnp.allclose(out, v / jnp.sqrt(d), atol=1e-4)


def test_funm_lanczos_eigclip():
    """clip_min=1.0 reproduces the reference's monkeypatched behavior."""
    d = jnp.array([0.25, 0.5, 2.0, 4.0])
    A = jnp.diag(d)
    v = jnp.ones(4)
    out = lz.funm_lanczos_sym(lambda x: 1.0 / jnp.sqrt(x), _mv(A), v, 4,
                              clip_min=1.0)
    expect = v / jnp.sqrt(jnp.clip(d, min=1.0))
    assert jnp.allclose(out, expect, atol=1e-4)


@pytest.mark.parametrize("idx", [0, 1])
def test_slq_logdet_sym(idx):
    A = psd_suite()[idx]
    n = A.shape[0]
    probes = st.rademacher_probes(jax.random.PRNGKey(1), 32, n)
    est = slq.slq_logdet_sym(_mv(A), probes, num_matvecs=min(n, 32))
    exact = jnp.linalg.slogdet(A)[1]
    assert jnp.allclose(est, exact, rtol=1e-1, atol=0.5)


def test_slq_logdet_product_matches_sym():
    """logdet(GᵀG) via bidiag == logdet(A) with A = GᵀG."""
    key = jax.random.PRNGKey(2)
    G = jax.random.normal(key, (24, 16)) / 4.0
    A = G.T @ G + 0.5 * jnp.eye(16)
    # stack [sqrt(0.5)·v ; G v] so GᵀG-form includes the diagonal shift,
    # mirroring the KL objective's stacked operator
    sqrt_half = jnp.sqrt(0.5)
    Gfun = lambda v: jnp.concatenate([sqrt_half * v, G @ v])
    probes = st.rademacher_probes(jax.random.PRNGKey(3), 48, 16)
    est = slq.slq_logdet_product(Gfun, probes, num_matvecs=16)
    # at full Krylov rank the quadrature is exact per probe — compare against
    # the same-probe Hutchinson estimate of tr(log A), not tr(log A) itself
    lam, V = jnp.linalg.eigh(A)
    logA = (V * jnp.log(lam)) @ V.T
    same_probe = jnp.mean(jax.vmap(lambda v: v @ logA @ v)(probes))
    assert jnp.allclose(est, same_probe, rtol=1e-3, atol=1e-2)
    # and the probe-averaged estimate lands near the true logdet
    exact = jnp.linalg.slogdet(A)[1]
    assert jnp.allclose(est, exact, rtol=2e-1, atol=1.2)


def test_slq_product_differentiable():
    key = jax.random.PRNGKey(4)
    G = jax.random.normal(key, (12, 8)) / 3.0
    probes = st.rademacher_probes(jax.random.PRNGKey(5), 16, 8)

    def loss(s):
        Gfun = lambda v: jnp.concatenate([v, s * (G @ v)])
        return slq.slq_logdet_product(Gfun, probes, num_matvecs=8)

    g = jax.grad(loss)(1.0)
    # same-probe exact gradient: d/ds mean_p vᵀlog(I + s²GᵀG)v at s=1
    def exact_loss(s):
        A = jnp.eye(8) + s ** 2 * (G.T @ G)
        lam, V = jnp.linalg.eigh(A)
        logA = (V * jnp.log(lam)) @ V.T
        return jnp.mean(jax.vmap(lambda v: v @ logA @ v)(probes))
    g_exact = jax.grad(exact_loss)(1.0)
    assert jnp.allclose(g, g_exact, rtol=1e-2, atol=1e-2)


def test_slq_remat_body_bitwise_value_and_grad():
    """remat_body is a pure memory knob: value AND gradient must match the
    unrematted scan bitwise (it re-executes identical primitives)."""
    key = jax.random.PRNGKey(11)
    G = jax.random.normal(key, (10, 6)) / 3.0
    probes = st.rademacher_probes(jax.random.PRNGKey(12), 4, 6)

    def loss(s, remat_body):
        Gfun = lambda v: jnp.concatenate([v, s * (G @ v)])
        return slq.slq_logdet_product(Gfun, probes, num_matvecs=6,
                                      remat_body=remat_body)

    v0, g0 = jax.value_and_grad(loss)(1.3, False)
    v1, g1 = jax.value_and_grad(loss)(1.3, True)
    assert v0 == v1
    assert g0 == g1


def test_golub_kahan_orthonormal_right_vectors():
    G = jax.random.normal(jax.random.PRNGKey(6), (20, 12))
    v0 = jax.random.normal(jax.random.PRNGKey(7), (12,))
    bi = lz.golub_kahan_bidiag(lambda v: G @ v, v0, 12)
    V = bi.right
    assert jnp.allclose(V @ V.T, jnp.eye(12), atol=1e-3)
    # singular values of B match those of G
    B = lz.bidiag_dense(bi.alphas, bi.betas)
    s_b = jnp.sort(jnp.linalg.svd(B, compute_uv=False))
    s_g = jnp.sort(jnp.linalg.svd(G, compute_uv=False))
    assert jnp.allclose(s_b, s_g, atol=1e-3)


def test_slq_product_gradient_finite_past_breakdown():
    """Regression: num_matvecs beyond the Krylov rank used to NaN gradients
    (degenerate singular values at breakdown -> SVD VJP 1/(s_i^2 - s_j^2))."""
    G = jax.random.normal(jax.random.PRNGKey(8), (10, 8)) / 3.0
    low_rank = G.at[:, 4:].set(0.0)          # rank 4 operator
    probes = st.rademacher_probes(jax.random.PRNGKey(9), 4, 8)

    def loss(s):
        Gfun = lambda v: jnp.concatenate([0.3 * v, s * (low_rank @ v)])
        return slq.slq_logdet_product(Gfun, probes, num_matvecs=8)

    g = jax.grad(loss)(1.0)
    assert jnp.isfinite(g)
