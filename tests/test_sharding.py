"""Multi-device tests on the virtual 8-core CPU mesh.

What the reference never had (SURVEY.md §2.12): sharded-vs-single-device
equivalence for the curvature operators, data-parallel MAP steps, and
sharded batch placement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from laplace_inducing_points_tpu.core import operators as ops
from laplace_inducing_points_tpu.parallel import sharded_ops as sh
from laplace_inducing_points_tpu.parallel.mesh import (batch_sharding,
                                                       make_mesh,
                                                       shard_batch)
from laplace_inducing_points_tpu.training.map import map_step

from fixtures import classifier_state


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(jax.devices()[:8])


def test_sharded_ggn_matches_single_device(mesh):
    _, state, (x, _) = classifier_state()
    Z = x[:16]                       # divisible by 8
    ggn = ops.make_ggn_operator(state, Z, full_set_size=40)
    V = jax.random.normal(jax.random.PRNGKey(0), (4, ggn.num_params))
    expect = ggn.matmat(V)
    got = sh.sharded_ggn_matmat(state, Z, V, mesh, full_set_size=40)
    assert jnp.allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_sharded_curvature_adds_alpha(mesh):
    _, state, (x, _) = classifier_state()
    Z = x[:8]
    ggn = ops.make_ggn_operator(state, Z)
    V = jax.random.normal(jax.random.PRNGKey(1), (2, ggn.num_params))
    got = sh.sharded_curvature_matmat(state, Z, V, mesh, alpha=0.3)
    assert jnp.allclose(got, ggn.matmat(V) + 0.3 * V, rtol=1e-4, atol=1e-4)


def test_sharded_gram_matches_dense(mesh):
    _, state, (x, _) = classifier_state()
    Z = x[:8]
    R = ops.dense_wt(state, Z)
    expect = ops.pdot(R, R.T)
    got = sh.sharded_gram(state, Z, mesh)
    assert jnp.allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_sharded_dense_wt_matches(mesh):
    _, state, (x, _) = classifier_state()
    Z = x[:8]
    expect = ops.dense_wt(state, Z)
    got = sh.sharded_dense_wt(state, Z, mesh)
    assert jnp.allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_data_parallel_map_step_matches_single_device(mesh):
    """Same batch, sharded vs replicated: identical loss and params."""
    _, state, (x, y) = classifier_state(train_steps=0)
    batch = (x[:16], y[:16].reshape(-1, 1).astype(jnp.float32))

    s1, loss1 = map_step(state, batch, 0.1)

    sharded = shard_batch(batch, mesh)
    s2, loss2 = map_step(state, sharded, 0.1)

    assert jnp.allclose(loss1, loss2, rtol=1e-5)
    p1 = jax.flatten_util.ravel_pytree(s1.params)[0]
    p2 = jax.flatten_util.ravel_pytree(s2.params)[0]
    assert jnp.allclose(p1, p2, rtol=1e-4, atol=1e-5)


def test_probe_sharding_placement(mesh):
    probes = jax.random.normal(jax.random.PRNGKey(2), (16, 32))
    sharded = sh.shard_probes(probes, mesh)
    assert len(sharded.sharding.device_set) == 8
    assert jnp.allclose(sharded, probes)


def test_mesh_sharded_predictor_matches_single_device(mesh):
    """Sample-axis-sharded amortized predictor == single-device values.

    The mesh changes layout only: R/V/state replicated, eps sharded over
    the sample axis, no collectives in the per-batch step."""
    from laplace_inducing_points_tpu.inference.lla import ScalableLLAPredictor

    _, state, (x, _) = classifier_state()
    Z = x[:6]
    key = jax.random.PRNGKey(11)

    plain = ScalableLLAPredictor(state, Z, full_set_size=32)
    meshed = ScalableLLAPredictor(state, Z, full_set_size=32, mesh=mesh)

    S = 32                                      # divisible by 8 devices
    a = np.asarray(plain.logit_samples(x[:10], 0.4, key, S))
    b = np.asarray(meshed.logit_samples(x[:10], 0.4, key, S))
    assert b.shape == (S, 10, 2)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    assert len(meshed.R.sharding.device_set) == 8   # factor replicated

    # sample_block path under the mesh (block divisible by mesh size)
    meshed_blk = ScalableLLAPredictor(state, Z, full_set_size=32,
                                      mesh=mesh, sample_block=16)
    c = np.asarray(meshed_blk.logit_samples(x[:10], 0.4, key, S))
    assert c.shape == (S, 10, 2)
    assert np.all(np.isfinite(c))


def test_mesh_sharded_matfree_predictor_matches_single_device(mesh):
    """d_z-unbounded predictive (``method="matfree"``) under a mesh == the
    single-device values (VERDICT r4 task 5).

    Same RNG contract as the weight path's mesh test: the mesh shards only
    the (eps, eta) MC-draw axes via with_sharding_constraint — the draws,
    the CG solves, and the push-forward compute identical values in a
    different layout, so equality is exact up to f32 reduction order."""
    from laplace_inducing_points_tpu.inference.lla import ScalableLLAPredictor

    _, state, (x, _) = classifier_state()
    Z = x[:6]
    key = jax.random.PRNGKey(13)
    kw = dict(full_set_size=32, method="matfree", cg_tol=1e-8,
              cg_maxiter=400, precond_rank=4)

    plain = ScalableLLAPredictor(state, Z, **kw)
    meshed = ScalableLLAPredictor(state, Z, mesh=mesh, **kw)

    S = 16                                      # divisible by 8 devices
    a = np.asarray(plain.logit_samples(x[:10], 0.4, key, S))
    b = np.asarray(meshed.logit_samples(x[:10], 0.4, key, S))
    assert b.shape == (S, 10, 2)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    # the Nyström sketch factors live replicated on the mesh
    assert len(meshed.nys[0].sharding.device_set) == 8


def test_mesh_cov_predictor_matches_single_device(mesh):
    """``method="cov"`` accepts a mesh (state/factors replicated — its
    per-sample cost is a 2K×2K matvec, nothing worth sharding, which is why
    cli.evaluate runs it replicated) and must produce the single-device
    values under one."""
    from laplace_inducing_points_tpu.inference.lla import ScalableLLAPredictor

    _, state, (x, _) = classifier_state()
    Z = x[:6]
    key = jax.random.PRNGKey(14)

    plain = ScalableLLAPredictor(state, Z, full_set_size=32, method="cov")
    meshed = ScalableLLAPredictor(state, Z, full_set_size=32, method="cov",
                                  mesh=mesh)

    S = 64
    a = np.asarray(plain.logit_samples(x[:10], 0.4, key, S))
    b = np.asarray(meshed.logit_samples(x[:10], 0.4, key, S))
    assert b.shape == (S, 10, 2)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    assert len(meshed.R.sharding.device_set) == 8   # factor replicated
