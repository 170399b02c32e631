"""BatchNorm-model curvature tests.

SURVEY.md §7 hard-parts: "apply_fn must run with frozen batch_stats inside
jvp/vjp — easy to get silently wrong." These tests pin that behavior on a
tiny ResNet-style model with real BatchNorm collections.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import flax.linen as nn

from laplace_inducing_points_tpu.core import operators as ops
from laplace_inducing_points_tpu.models.scale import BasicBlock
from laplace_inducing_points_tpu.models.state import create_train_state
from laplace_inducing_points_tpu.training.inducing import (kl_objective_dense,
                                                           kl_objective_gram)
from laplace_inducing_points_tpu.training.map import map_step


class TinyBNNet(nn.Module):
    """Conv + BN + residual block + head — smallest real-BN classifier."""
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(4, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = BasicBlock(4)(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


@pytest.fixture(scope="module")
def bn_state():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((12, 6, 6, 2)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 3, 12))
    state = create_train_state(TinyBNNet(), jax.random.PRNGKey(0), x[:1],
                               optax.adam(1e-2), "classifier")
    # a few training steps so batch_stats are non-trivial
    for _ in range(5):
        state, _ = map_step(state, (x, y), 0.01)
    assert jax.tree_util.tree_leaves(state.batch_stats)
    return state, x


def test_bn_stats_updated_by_training(bn_state):
    state, x = bn_state
    means = [np.asarray(l) for l in jax.tree_util.tree_leaves(
        state.batch_stats)]
    assert any(np.abs(m).max() > 0 for m in means)


def test_ggn_matches_per_example_with_frozen_bn(bn_state):
    """Batched GGN == independent per-example construction in eval mode."""
    state, x = bn_state
    Z = x[:4]
    ggn = ops.make_ggn_operator(state, Z)
    flat, unravel = ops.flatten_nn_params(state.params)

    def f_single(p, zi):
        variables = {"params": unravel(p), "batch_stats": state.batch_stats}
        return state.apply_fn(variables, zi[None], train=False)[0]

    total = jnp.zeros((flat.size, flat.size))
    for i in range(Z.shape[0]):
        J = jax.jacobian(lambda p: f_single(p, Z[i]))(flat)
        pr = jax.nn.softmax(f_single(flat, Z[i]))
        H = jnp.diag(pr) - jnp.outer(pr, pr)
        total = total + ops.pdot(ops.pdot(J.T, H), J)
    assert jnp.allclose(ggn.dense(), total, rtol=1e-3, atol=1e-4)


def test_bn_stats_excluded_from_flat_params(bn_state):
    state, x = bn_state
    flat, _ = ops.flatten_nn_params(state.params)
    n_params = sum(l.size for l in jax.tree_util.tree_leaves(state.params))
    n_stats = sum(l.size for l in jax.tree_util.tree_leaves(state.batch_stats))
    assert flat.size == n_params          # params exclude stats already
    assert n_stats > 0


def test_gram_objective_runs_and_matches_dense_bn(bn_state):
    state, x = bn_state
    Z, X = x[:3], x[:8]
    dense = kl_objective_dense(Z, X, state, 0.5, full_set_size=24)
    gram = kl_objective_gram(Z, X, state, 0.5, full_set_size=24)
    assert jnp.allclose(dense, gram, rtol=5e-3, atol=5e-2)
    g = jax.grad(kl_objective_gram)(Z, X, state, 0.5, full_set_size=24)
    assert jnp.all(jnp.isfinite(g))


def test_scalable_predictive_with_bn(bn_state):
    from laplace_inducing_points_tpu.inference.lla import predict_lla_scalable

    state, x = bn_state
    logits = predict_lla_scalable(state, x[4:8], x[:4], 0.5,
                                  key=jax.random.PRNGKey(1), num_samples=8)
    assert logits.shape == (8, 4, 3)
    assert jnp.all(jnp.isfinite(logits))
