"""MAP training: jitted, BatchNorm-aware, data-parallel over a mesh.

Parity: ``/root/reference/src/train_map.py`` (Gaussian-prior L2 with separate
weight/bias precisions, softmax-CE or Gaussian-NLL with learned ``logvar``,
eval steps). TPU-first: the step function is jitted once with sharding
constraints — batches arrive sharded over the mesh's data axis and XLA
inserts the gradient all-reduce; there is no pmap-style per-device Python.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import optax

from laplace_inducing_points_tpu.data.loader import device_iter
from laplace_inducing_points_tpu.models.state import TrainState


def l2_prior(params, weight_precision: float, bias_precision: float = 0.0):
    """0.5·Σ prec·‖θ‖² with biases under their own precision.

    Parity: ``_l2_tree`` (``/root/reference/src/train_map.py:19-35``).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0.0
    for path, leaf in flat:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        prec = bias_precision if name == "bias" else weight_precision
        total = total + 0.5 * prec * jnp.sum(leaf ** 2)
    return total


def _loss(state: TrainState, params, batch_stats, batch, prior_precision):
    """Negative log joint for one batch; returns (loss, new_batch_stats)."""
    x, y = batch
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
        out, new_vars = state.apply_fn(variables, x, train=True,
                                       mutable=["batch_stats"])
        new_bs = new_vars["batch_stats"]
    else:
        out = state.apply_fn(variables, x, train=True)
        new_bs = batch_stats

    if state.model_kind == "classifier":
        logits = out
        labels = y.reshape(-1).astype(jnp.int32)
        one_hot = jax.nn.one_hot(labels, logits.shape[-1])
        nll = jnp.mean(optax.softmax_cross_entropy(logits, one_hot))
        nlp = l2_prior(params, prior_precision, prior_precision)
    else:
        mu, logvar = out
        var = jnp.exp(logvar)
        se = jnp.square(mu - y.reshape(mu.shape))
        nll = 0.5 * jnp.mean(jnp.log(2 * jnp.pi * var) + se / var)
        nlp = l2_prior(params, prior_precision)
    return nll + nlp, new_bs


@jax.jit
def map_step(state: TrainState, batch, prior_precision):
    """One MAP optimization step (parity: ``_map_step``,
    ``/root/reference/src/train_map.py:51-86``).

    ``prior_precision`` is a *traced* scalar (it only enters arithmetically
    via :func:`l2_prior`), so alpha updates in evidence mode re-use the same
    compiled step instead of forcing a recompile per alpha value.
    """
    (loss, new_bs), grads = jax.value_and_grad(_loss, argnums=1, has_aux=True)(
        state, state.params, state.batch_stats, batch, prior_precision)
    new_state = state.apply_gradients(grads=grads).replace(batch_stats=new_bs)
    return new_state, loss


@jax.jit
def eval_classification(state: TrainState, batch):
    x, y = batch
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    logits = state.apply_fn(variables, x, train=False)
    labels = y.reshape(-1).astype(jnp.int32)
    one_hot = jax.nn.one_hot(labels, logits.shape[-1])
    nll = jnp.mean(optax.softmax_cross_entropy(logits, one_hot))
    acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
    return nll, acc


@jax.jit
def eval_regression(state: TrainState, batch):
    x, y = batch
    mu, logvar = state.apply_fn({"params": state.params}, x, train=False)
    var = jnp.exp(logvar)
    se = jnp.square(mu - y.reshape(mu.shape))
    nll = 0.5 * jnp.mean(jnp.log(2 * jnp.pi * var) + se / var)
    return nll, jnp.zeros(())


def train_map(state: TrainState, train_loader: Iterable,
              test_loader: Iterable, *, num_epochs: int, alpha: float,
              sharding: Optional[jax.sharding.Sharding] = None,
              eval_every: int = 1, verbose: bool = True,
              checkpoint_dir: Optional[str] = None,
              checkpoint_every: int = 50) -> TrainState:
    """Epoch loop (parity: ``train_map``,
    ``/root/reference/src/train_map.py:111-144``).

    ``sharding``: optional NamedSharding for batches — enables data
    parallelism across the mesh with zero changes to the step function.
    """
    eval_step = (eval_regression if state.model_kind == "regressor"
                 else eval_classification)
    for epoch in range(num_epochs):
        for batch in device_iter(train_loader, sharding=sharding):
            state, train_loss = map_step(state, batch, float(alpha))

        if verbose and (epoch % eval_every == 0 or epoch == num_epochs - 1):
            tot_nll, tot_acc, nb = 0.0, 0.0, 0
            for batch in device_iter(test_loader, sharding=sharding):
                nll, acc = eval_step(state, batch)
                tot_nll += float(nll)
                tot_acc += float(acc)
                nb += 1
            nb = max(nb, 1)
            msg = f"[MAP e{epoch:4d}] NLL={tot_nll / nb:.4f}"
            if state.model_kind == "classifier":
                msg += f" ACC={tot_acc / nb:.4f}"
            print(msg)

        # periodic crash-resume checkpoints (the reference only supports
        # phase-level restarts, SURVEY.md §5.3/5.4)
        if checkpoint_dir and (epoch + 1) % checkpoint_every == 0 \
                and epoch + 1 < num_epochs:
            from laplace_inducing_points_tpu.utils.checkpoint import (
                save_train_state)
            save_train_state(state, checkpoint_dir, step=epoch + 1)
    return state


def cosine_lr(init_value: float, num_epochs: int, steps_per_epoch: int,
              final_fraction: float = 0.08):
    """Cosine decay schedule (parity:
    ``/root/reference/scale_experiments/train.py:76-81``)."""
    return optax.cosine_decay_schedule(
        init_value=init_value,
        decay_steps=num_epochs * steps_per_epoch,
        alpha=final_fraction,
    )
