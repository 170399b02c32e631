"""Long-contraction matmul kernel tests (ops.pallas.matmul).

Interpret-mode numerical contract on the CPU test backend (values, ragged
padding, custom VJPs); compiled-TPU timing is bench.py's job on hardware.
"""

import functools

import jax
import jax.numpy as jnp
import pytest

from laplace_inducing_points_tpu.ops.pallas import matmul as mm


def _interp_nt(A, B, bm=8, bn=8, bk=32):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        return mm._matmul_nt_pallas.__wrapped__(A, B, bm, bn, bk)
    finally:
        pl.pallas_call = orig


def _interp_nn(A, B, bm=8, bd=32, bz=8):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        return mm._matmul_nn_pallas.__wrapped__(A, B, bm, bd, bz)
    finally:
        pl.pallas_call = orig


@pytest.mark.parametrize("m,n,D", [(16, 8, 64), (13, 21, 70), (8, 8, 32)])
def test_matmul_nt_kernel(m, n, D):
    A = jax.random.normal(jax.random.PRNGKey(0), (m, D))
    B = jax.random.normal(jax.random.PRNGKey(1), (n, D))
    ref = jnp.matmul(A, B.T, precision=jax.lax.Precision.HIGHEST)
    got = _interp_nt(A, B)
    assert got.shape == ref.shape
    assert jnp.allclose(got, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("m,z,D", [(16, 8, 64), (11, 19, 75)])
def test_matmul_nn_kernel(m, z, D):
    A = jax.random.normal(jax.random.PRNGKey(2), (m, z))
    B = jax.random.normal(jax.random.PRNGKey(3), (z, D))
    ref = jnp.matmul(A, B, precision=jax.lax.Precision.HIGHEST)
    got = _interp_nn(A, B)
    assert got.shape == ref.shape
    assert jnp.allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_fallback_paths():
    A = jax.random.normal(jax.random.PRNGKey(4), (5, 40))
    B = jax.random.normal(jax.random.PRNGKey(5), (7, 40))
    assert jnp.allclose(mm.matmul_nt(A, B), A @ B.T, rtol=1e-5, atol=1e-5)
    C = jax.random.normal(jax.random.PRNGKey(6), (5, 7))
    assert jnp.allclose(mm.matmul_nn(C, B), C @ B, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("which", ["nt", "nn"])
def test_custom_vjp_matches_autodiff(which):
    """Custom VJPs agree with autodiff of the plain matmul (both args)."""
    key = jax.random.PRNGKey(7)
    if which == "nt":
        A = jax.random.normal(key, (6, 20))
        B = jax.random.normal(jax.random.PRNGKey(8), (4, 20))
        W = jax.random.normal(jax.random.PRNGKey(9), (6, 4))
        fn_k = lambda a, b: jnp.sum(W * mm._matmul_nt_diff(a, b, 8, 8, 8))
        fn_r = lambda a, b: jnp.sum(W * (a @ b.T))
    else:
        A = jax.random.normal(key, (6, 4))
        B = jax.random.normal(jax.random.PRNGKey(8), (4, 20))
        W = jax.random.normal(jax.random.PRNGKey(9), (6, 20))
        fn_k = lambda a, b: jnp.sum(W * mm._matmul_nn_diff(a, b, 8, 8, 8))
        fn_r = lambda a, b: jnp.sum(W * (a @ b))

    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        gk = jax.grad(fn_k, argnums=(0, 1))(A, B)
    finally:
        pl.pallas_call = orig
    gr = jax.grad(fn_r, argnums=(0, 1))(A, B)
    for a, b in zip(gk, gr):
        assert jnp.allclose(a, b, rtol=1e-5, atol=1e-4)


def test_ggn_sweep_fallback_equals_materialized_sweep():
    """ggn_sweep == scale * (V Rᵀ) R on the fallback path."""
    V = jax.random.normal(jax.random.PRNGKey(10), (9, 33))
    R = jax.random.normal(jax.random.PRNGKey(11), (6, 33))
    ref = 2.5 * (V @ R.T) @ R
    got = mm.ggn_sweep(V, R, 2.5)
    assert jnp.allclose(got, ref, rtol=1e-5, atol=1e-4)
