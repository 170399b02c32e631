"""Inducing-point KL objective tests: gram and stochastic vs the dense twin.

Mirrors ``/root/reference/tests/test_variational.py`` (dense KL terms vs
scalable estimators) with value AND gradient checks.
"""

import jax
import jax.numpy as jnp
import optax
import pytest

from laplace_inducing_points_tpu.training import inducing as ind

from fixtures import classifier_state, mlp_regressor_state, XS_1D


@pytest.mark.parametrize("case", ["classifier", "regressor"])
def test_gram_objective_matches_dense(case):
    if case == "classifier":
        _, state, (x, _) = classifier_state()
        Z, X = x[:5], x[:12]
    else:
        _, state = mlp_regressor_state()
        Z, X = XS_1D[:3], XS_1D
    alpha = 0.6
    N = 24
    dense = ind.kl_objective_dense(Z, X, state, alpha, full_set_size=N)
    gram = ind.kl_objective_gram(Z, X, state, alpha, full_set_size=N)
    assert jnp.allclose(dense, gram, rtol=2e-3, atol=1e-2)


def test_gram_gradient_matches_dense():
    _, state, (x, _) = classifier_state()
    Z, X = x[:4], x[:10]
    alpha = 0.6
    N = 24
    g_dense = jax.grad(ind.kl_objective_dense)(Z, X, state, alpha,
                                               full_set_size=N)
    g_gram = jax.grad(ind.kl_objective_gram)(Z, X, state, alpha,
                                             full_set_size=N)
    scale = jnp.max(jnp.abs(g_dense)) + 1e-8
    assert jnp.max(jnp.abs(g_dense - g_gram)) < 2e-2 * scale


def test_stochastic_objective_approximates_dense():
    _, state, (x, _) = classifier_state()
    Z, X = x[:5], x[:12]
    alpha = 0.6
    N = 24
    dense = ind.kl_objective_dense(Z, X, state, alpha, full_set_size=N)
    # generous probes + full Krylov depth => low estimator variance
    stoch = ind.kl_objective_stochastic(
        Z, X, state, alpha, jax.random.PRNGKey(0), full_set_size=N,
        st_samples=96, slq_samples=24, slq_num_matvecs=10)
    assert jnp.allclose(dense, stoch, rtol=1e-1, atol=2.0)


def test_stochastic_objective_differentiable_wrt_z():
    _, state, (x, _) = classifier_state()
    Z, X = x[:4], x[:8]
    g = jax.grad(ind.kl_objective_stochastic)(
        Z, X, state, 0.6, jax.random.PRNGKey(1), full_set_size=16,
        st_samples=24, slq_samples=2, slq_num_matvecs=6)
    assert g.shape == Z.shape
    assert jnp.all(jnp.isfinite(g))


def test_optimize_step_decreases_dense_objective():
    """A few gram-objective steps should reduce the exact dense KL."""
    _, state, (x, y) = classifier_state()
    Z = x[:4] + 0.5          # deliberately offset initialization
    X = x[:16]
    alpha = 0.6
    N = 32
    opt = optax.adam(5e-2)
    opt_state = opt.init(Z)
    before = ind.kl_objective_dense(Z, X, state, alpha, full_set_size=N)
    key = jax.random.PRNGKey(2)
    for step in range(25):
        key, sub = jax.random.split(key)
        Z, opt_state, _ = ind.optimize_step(
            Z, X, state, alpha, opt_state, sub, objective="gram",
            optimizer=opt, full_set_size=N)
    after = ind.kl_objective_dense(Z, X, state, alpha, full_set_size=N)
    assert float(after) < float(before)
