"""LLA predictive tests: dense posterior/predictive and the scalable
sample-based path (resurrects the reference's stale ``tests/test_lla.py``
against the new API)."""

import jax
import jax.numpy as jnp

from laplace_inducing_points_tpu.core import operators as ops
from laplace_inducing_points_tpu.core.params import flatten_nn_params
from laplace_inducing_points_tpu.inference import lla

from fixtures import XS_1D, classifier_state, mlp_regressor_state


def test_posterior_mean_is_map_and_cov_pd():
    _, state, (x, _) = classifier_state()
    post = lla.posterior_lla_dense(state, x[:8], alpha=0.4)
    flat, _ = flatten_nn_params(state.params)
    assert jnp.allclose(post.mean, flat)
    evals = jnp.linalg.eigvalsh(0.5 * (post.cov + post.cov.T))
    assert jnp.all(evals > 0)


def test_predictive_mean_equals_map_outputs():
    _, state, (x, _) = classifier_state()
    Xnew = x[8:12]
    dist = lla.predict_lla_dense(state, Xnew, x[:8], alpha=0.4)
    f_map = ops.model_outputs(state, state.params, Xnew)
    assert jnp.allclose(dist.mean, f_map, atol=1e-5)
    # per-datum covariance PSD
    for i in range(Xnew.shape[0]):
        evals = jnp.linalg.eigvalsh(0.5 * (dist.cov[i] + dist.cov[i].T))
        assert jnp.all(evals > -1e-6)


def test_scalable_moments_match_dense_predictive():
    """Sample mean -> f_MAP and sample covariance -> J S⁻¹ Jᵀ."""
    _, state, (x, _) = classifier_state()
    Z = x[:8]
    Xnew = x[8:11]
    alpha = 0.8
    dist = lla.predict_lla_dense(state, Xnew, Z, alpha)
    logits = lla.predict_lla_scalable(state, Xnew, Z, alpha,
                                      key=jax.random.PRNGKey(0),
                                      num_samples=6000)
    emp_mean = logits.mean(axis=0)
    assert jnp.allclose(emp_mean, dist.mean, atol=0.12)
    centered = logits - emp_mean[None]
    emp_cov = jnp.einsum("snk,snl->nkl", centered, centered) / logits.shape[0]
    scale = jnp.max(jnp.abs(dist.cov)) + 1e-6
    assert jnp.max(jnp.abs(emp_cov - dist.cov)) < 0.15 * scale


def test_la_mc_baseline_shapes():
    _, state = mlp_regressor_state()
    out = lla.predict_la_samples_dense(state, XS_1D, XS_1D, alpha=0.5,
                                       key=jax.random.PRNGKey(1),
                                       num_mc_samples=16)
    assert out.shape == (16, 4, 1)


def test_materialize_covariance_modes():
    n, k = 3, 2
    A = jax.random.normal(jax.random.PRNGKey(2), (n * k, n * k))
    cov = A @ A.T
    vp = lambda e: (cov @ e).reshape(n, k)
    full = lla.materialize_covariance(vp, n, k, mode="full")
    diag = lla.materialize_covariance(vp, n, k, mode="diag")
    assert jnp.allclose(full, cov, atol=1e-5)
    assert jnp.allclose(diag.reshape(-1), jnp.diagonal(cov), atol=1e-5)


def test_gaussian_container_sampling():
    mean = jnp.array([[1.0, -1.0]])
    cov = jnp.array([[[0.5, 0.1], [0.1, 0.3]]])
    g = lla.Gaussian(mean=mean, cov=cov)
    s = g.sample(jax.random.PRNGKey(3), 20000)
    assert jnp.allclose(s.mean(axis=0), mean, atol=0.03)
    emp = jnp.cov(s[:, 0, :].T)
    assert jnp.allclose(emp, cov[0], atol=0.03)
