"""Estimator tests against exact traces on a PSD matrix suite.

Mirrors ``/root/reference/tests/test_stochtrace.py``: all estimators vs
``jnp.trace``; Hutch++ exactness when the range-finder covers the full rank;
trace-of-inverse vs dense inverse.
"""

import jax
import jax.numpy as jnp
import pytest

from laplace_inducing_points_tpu.ops import stochtrace as st

from fixtures import psd_suite


def _matmat(A):
    return lambda V: jnp.matmul(V, A.T, precision=jax.lax.Precision.HIGHEST)


@pytest.mark.parametrize("idx", [0, 1, 2])
def test_hutchinson_close(idx):
    A = psd_suite()[idx]
    probes = st.rademacher_probes(jax.random.PRNGKey(0), 768, A.shape[0])
    est = st.hutchinson(_matmat(A), probes)
    assert jnp.allclose(est, jnp.trace(A), rtol=5e-2)


@pytest.mark.parametrize("idx", [0, 1, 2])
def test_hutchpp_close(idx):
    A = psd_suite()[idx]
    probes = st.rademacher_probes(jax.random.PRNGKey(1), 128, A.shape[0])
    est = st.hutchpp(_matmat(A), probes)
    assert jnp.allclose(est, jnp.trace(A), rtol=3e-2)


def test_hutchpp_exact_when_probes_cover_rank():
    """s1 >= dim  =>  the QR range-finder captures A exactly."""
    A = psd_suite()[0]                     # 8x8
    n = A.shape[0]
    probes = st.rademacher_probes(jax.random.PRNGKey(2), 2 * n + 4, n)
    est = st.hutchpp(_matmat(A), probes, s1=n + 2, s2=n + 2)
    assert jnp.allclose(est, jnp.trace(A), rtol=1e-4)


def test_hutchpp_split_semantics():
    A = psd_suite()[1]
    probes = st.rademacher_probes(jax.random.PRNGKey(3), 96, A.shape[0])
    # explicit (s1, s2) split mirroring the reference's (st_samples-16, 16)
    est = st.hutchpp(_matmat(A), probes, s1=80, s2=16)
    assert jnp.allclose(est, jnp.trace(A), rtol=5e-2)


@pytest.mark.parametrize("idx", [0, 1])
def test_na_hutchpp_close(idx):
    A = psd_suite()[idx]
    probes = st.rademacher_probes(jax.random.PRNGKey(4), 256, A.shape[0])
    est = st.na_hutchpp(_matmat(A), probes)
    assert jnp.allclose(est, jnp.trace(A), rtol=8e-2)


@pytest.mark.parametrize("estimator", ["hutchpp", "hutchinson"])
def test_trace_of_inverse(estimator):
    A = psd_suite()[1]                     # 64x64, well-conditioned
    probes = st.rademacher_probes(jax.random.PRNGKey(5), 160, A.shape[0])
    est = st.trace_of_inverse(_matmat(A), probes, estimator=estimator,
                              cg_tol=1e-8)
    exact = jnp.trace(jnp.linalg.inv(A))
    assert jnp.allclose(est, exact, rtol=8e-2)


def test_hutchpp_differentiable():
    """Gradients flow through QR + probe sweeps (KL objective requirement)."""
    A = psd_suite()[1]
    # keep s1 <= dim: QR differentiation requires tall factors
    probes = st.rademacher_probes(jax.random.PRNGKey(6), 40, A.shape[0])

    def loss(scale):
        return st.hutchpp(lambda V: scale * _matmat(A)(V), probes)

    g = jax.grad(loss)(1.0)
    # tr(s·A) is linear in s  =>  d/ds == the trace estimate itself
    assert jnp.allclose(g, st.hutchpp(_matmat(A), probes), rtol=1e-4)
