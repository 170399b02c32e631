"""orbax train-state + npz array checkpoint round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from laplace_inducing_points_tpu.models.state import create_train_state
from laplace_inducing_points_tpu.models.toy import SimpleClassifier
from laplace_inducing_points_tpu.utils import checkpoint as ckpt

from fixtures import blob_data


def test_train_state_roundtrip(tmp_path):
    x, y = blob_data(16, seed=5)
    model = SimpleClassifier(num_hidden=4, num_layers=1, num_classes=2)
    state = create_train_state(model, jax.random.PRNGKey(0), x[:1],
                               optax.adam(1e-2), "classifier")
    # advance a step so opt_state is non-trivial
    grads = jax.tree.map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads=grads)

    ckpt.save_train_state(state, str(tmp_path / "ck"), step=3)

    fresh = create_train_state(model, jax.random.PRNGKey(1), x[:1],
                               optax.adam(1e-2), "classifier")
    restored = ckpt.load_train_state(fresh, str(tmp_path / "ck"))
    p0 = jax.flatten_util.ravel_pytree(state.params)[0]
    p1 = jax.flatten_util.ravel_pytree(restored.params)[0]
    assert jnp.allclose(p0, p1)
    assert int(restored.step) == int(state.step)
    o0 = jax.flatten_util.ravel_pytree(state.opt_state)[0]
    o1 = jax.flatten_util.ravel_pytree(restored.opt_state)[0]
    assert jnp.allclose(o0, o1)


def test_array_roundtrip(tmp_path):
    Z = jnp.asarray(np.random.default_rng(0).random((7, 3)), jnp.float32)
    ckpt.save_array(Z, str(tmp_path), "ind_test", 42)
    back = ckpt.load_array(str(tmp_path), "ind_test", 42)
    assert jnp.allclose(Z, back)


def test_load_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ckpt.load_array(str(tmp_path), "nope", 1)


def test_restore_with_different_optimizer(tmp_path):
    """Eval-time restore must tolerate a mismatched opt_state tree."""
    x, y = blob_data(16, seed=6)
    model = SimpleClassifier(num_hidden=4, num_layers=1, num_classes=2)
    sched = optax.adam(optax.cosine_decay_schedule(1e-2, 100))
    state = create_train_state(model, jax.random.PRNGKey(0), x[:1], sched,
                               "classifier")
    ckpt.save_train_state(state, str(tmp_path / "ck"), step=1)

    plain = create_train_state(model, jax.random.PRNGKey(1), x[:1],
                               optax.adam(1e-3), "classifier")
    restored = ckpt.load_train_state(plain, str(tmp_path / "ck"))
    p0 = jax.flatten_util.ravel_pytree(state.params)[0]
    p1 = jax.flatten_util.ravel_pytree(restored.params)[0]
    assert jnp.allclose(p0, p1)
