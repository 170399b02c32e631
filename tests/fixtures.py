"""Hermetic test fixtures.

The reference's fixtures load pre-trained checkpoints from a gitignored
directory (``/root/reference/tests/fixtures.py:73-97`` — not hermetic). Here
every fixture trains (or just initializes) its tiny model in-process with
fixed seeds, so tests run from a clean clone.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from laplace_inducing_points_tpu.models.state import create_train_state
from laplace_inducing_points_tpu.models.toy import SimpleClassifier, SimpleRegressor

# ---------------------------------------------------------------------------
# tiny 1-D regression set (4 points) — same spirit as the reference's
# hand-rolled set, values chosen independently.
# ---------------------------------------------------------------------------
XS_1D = jnp.array([[-2.0], [-0.5], [0.7], [1.8]])
YS_1D = jnp.array([[0.9], [-0.3], [0.4], [-1.2]])


def linear_regressor_state(seed: int = 0):
    """0-hidden-layer regressor => f linear in params => GGN == exact Hessian."""
    model = SimpleRegressor(num_hidden=4, num_layers=0)
    rng = jax.random.PRNGKey(seed)
    return model, create_train_state(model, rng, XS_1D, optax.adam(1e-2),
                                     model_kind="regressor")


def mlp_regressor_state(seed: int = 1, train_steps: int = 60):
    model = SimpleRegressor(num_hidden=8, num_layers=1)
    rng = jax.random.PRNGKey(seed)
    state = create_train_state(model, rng, XS_1D, optax.adam(5e-2),
                               model_kind="regressor")

    @jax.jit
    def step(state):
        def loss_fn(params):
            mu, logvar = state.apply_fn({"params": params}, XS_1D)
            var = jnp.exp(logvar)
            return 0.5 * jnp.mean(jnp.log(2 * jnp.pi * var)
                                  + (mu - YS_1D) ** 2 / var)
        grads = jax.grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads)

    for _ in range(train_steps):
        state = step(state)
    return model, state


# ---------------------------------------------------------------------------
# two-blob binary classification
# ---------------------------------------------------------------------------
def blob_data(n: int = 32, seed: int = 3):
    rng = np.random.default_rng(seed)
    x0 = rng.normal(loc=(-1.0, -1.0), scale=0.4, size=(n // 2, 2))
    x1 = rng.normal(loc=(1.0, 1.0), scale=0.4, size=(n // 2, 2))
    x = jnp.asarray(np.concatenate([x0, x1]), dtype=jnp.float32)
    y = jnp.concatenate([jnp.zeros(n // 2), jnp.ones(n // 2)]).astype(jnp.int32)
    return x, y


def classifier_state(seed: int = 2, train_steps: int = 80,
                     num_hidden: int = 6, num_layers: int = 1,
                     num_classes: int = 2):
    x, y = blob_data()
    model = SimpleClassifier(num_hidden=num_hidden, num_layers=num_layers,
                             num_classes=num_classes)
    rng = jax.random.PRNGKey(seed)
    state = create_train_state(model, rng, x, optax.adam(5e-2),
                               model_kind="classifier")

    @jax.jit
    def step(state):
        def loss_fn(params):
            logits = state.apply_fn({"params": params}, x)
            oh = jax.nn.one_hot(y, num_classes)
            return jnp.mean(optax.softmax_cross_entropy(logits, oh))
        grads = jax.grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads)

    for _ in range(train_steps):
        state = step(state)
    return model, state, (x, y)


# ---------------------------------------------------------------------------
# PSD matrix suite for estimator stress tests
# (reference: ``tests/fixtures.py:193-214`` — sizes/values chosen anew)
# ---------------------------------------------------------------------------
def psd_suite(seed: int = 7):
    rng = np.random.default_rng(seed)
    mats = []
    for n in (8, 64, 512):
        a = rng.normal(size=(n, n))
        m = a @ a.T / n + 0.1 * np.eye(n)
        mats.append(jnp.asarray(m, dtype=jnp.float32))
    return mats
